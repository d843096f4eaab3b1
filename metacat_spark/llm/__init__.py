"""Large-scale training-data pipeline operators (beyond-reference surface).

Everything here is built on Spark built-ins (higher-order functions,
hash-partitioned joins) — no Python UDFs in hot paths. Hash functions
are portable integer arithmetic so the DuckDB correctness oracle can
reproduce them bit-for-bit.
"""

from . import (dedup, multimodal, packing, pipeline,  # noqa: F401
               search, similarity, text, train)
