"""metacat_spark — a PySpark-native metadata-catalog analytics engine.

Re-implements the query and data-processing capabilities of the
ivmfnal/metacat reference (MQL over JSONB in PostgreSQL) as Spark SQL /
DataFrame plans over columnar tables, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy exports — importing the package must not require an active
    # SparkSession
    if name == "Engine":
        from .engine import Engine
        return Engine
    if name == "Catalog":
        from .catalog import Catalog
        return Catalog
    if name in ("from_tpch", "from_materialized"):
        from . import catalog
        return getattr(catalog, name)
    if name == "MetaCatSparkClient":
        from .client import MetaCatSparkClient
        return MetaCatSparkClient
    if name == "get_spark":
        from .session import get_spark
        return get_spark
    raise AttributeError(name)
