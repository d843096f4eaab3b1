#!/usr/bin/env python3
"""Shredded-vs-variant predicate-cost benchmark: time the same MQL
predicate queries against the shredded warehouse (typed m_* columns,
parquet PushedFilters) and the variant warehouse (one native Spark-4
VariantType column, variant_get extraction) at the same SF, plus the
on-disk footprint of each files table. Results are recorded in
docs/SCALING.md §Variant trade-off. Run: python tools/bench_variant.py
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metacat_spark.catalog import from_materialized
from metacat_spark.engine import Engine
from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CASES = [
    ("point+eq", "files where core.run > 250 and core.data_type = mc"),
    ("range+set", "files where core.run in 100:200 "
                  "and core.data_type in (mc, data)"),
    ("regex", 'files where prod.comment ~* "felix" '
              'and prod.comment !~ "test"'),
    ("present", "files where beam.status present "
                "and detector.modules not present"),
    ("array-any", "files where core.runs[any] > 490"),
    ("membership+pred", "files from test:all "
                        "where core.good = true and core.x > 0.1"),
]


def table_bytes(spark, table: str) -> int:
    loc = (spark.conf.get("spark.sql.warehouse.dir")
           .removeprefix("file:"))
    return sum(os.path.getsize(f) for f in
               glob.glob(f"{loc}/{table}/**", recursive=True)
               if os.path.isfile(f))


def run(engine: Engine, mql: str) -> tuple[float, int]:
    t0 = time.monotonic()
    n = engine.query(mql).count()
    return time.monotonic() - t0, n


def main():
    spark = get_spark("bench_variant")
    suffix = SF_DIR.rstrip("/").split("/")[-1].replace(".", "_")
    sh = Engine(from_materialized(spark, SF_DIR))
    va = Engine(from_materialized(spark, SF_DIR, variant=True))
    sh_bytes = table_bytes(spark, f"mcw_files_{suffix}")
    va_bytes = table_bytes(spark, f"mcw_files_var_{suffix}")
    print(f"sf_dir={SF_DIR}")
    print(f"files table bytes: shredded={sh_bytes:,} "
          f"variant={va_bytes:,} ({va_bytes / sh_bytes:.2f}x)")
    print(f"{'case':<18}{'shredded cold':>14}{'variant cold':>14}"
          f"{'shredded warm':>14}{'variant warm':>14}{'ratio warm':>11}")
    for name, mql in CASES:
        s_cold, n1 = run(sh, mql)
        v_cold, n2 = run(va, mql)
        assert n1 == n2, (name, n1, n2)
        s_warm = min(run(sh, mql)[0] for _ in range(3))
        v_warm = min(run(va, mql)[0] for _ in range(3))
        print(f"{name:<18}{s_cold:>13.3f}s{v_cold:>13.3f}s"
              f"{s_warm:>13.3f}s{v_warm:>13.3f}s"
              f"{v_warm / s_warm:>10.2f}x")


if __name__ == "__main__":
    main()
