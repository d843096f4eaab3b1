#!/usr/bin/env python3
"""Variant-mode parity sweep (VERDICT r6 #7): run every engine-backed
`queries()` entry at $SPARK_GRAFT_SF_DIR (default sf0.1) twice — once
on the default shredded-column engine, once on the REAL variant
warehouse mode (from_materialized(variant=True): one native
VariantType column, no shredded columns, variant_get predicate
compilation) — and compare value multisets (count + order-independent
bit_xor of xxhash64 over the name-sorted columns, the driver's
comparison). Entries whose source never consults the engine (docs /
embeddings / events operators) cannot differ by construction and are
skipped as 'n/a'.

Prints one line per entry and a JSON summary; paste the summary into
docs/SCALING.md."""

import inspect
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def value_hash(df):
    cols = [F.col(c) for c in sorted(df.columns)]
    row = (df.select(F.xxhash64(F.struct(*cols)).alias("__h"))
           .agg(F.count("__h").alias("n"),
                F.bit_xor("__h").alias("x")).collect()[0])
    return int(row["n"]), (None if row["x"] is None else int(row["x"]))


def main():
    import __spark_entry__ as E
    from metacat_spark.catalog import from_materialized
    from metacat_spark.engine import Engine
    from metacat_spark.session import get_spark

    spark = get_spark("variant_sweep")
    base_eng = Engine(from_materialized(spark, SF_DIR, variant=False))
    var_eng = Engine(from_materialized(spark, SF_DIR, variant=True))
    qs = E.queries()

    results, t0 = {}, time.time()
    for name, fn in qs.items():
        try:
            src = inspect.getsource(fn)
        except OSError:
            src = "engine"          # be conservative: run it
        if "engine" not in src.lower():
            results[name] = "n/a"
            continue
        t = time.time()
        try:
            E._CACHE[SF_DIR] = base_eng
            nb, hb = value_hash(fn(spark, SF_DIR))
            E._CACHE[SF_DIR] = var_eng
            nv, hv = value_hash(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — sweep must finish
            results[name] = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"{name}: {results[name]}", flush=True)
            continue
        ok = (nb, hb) == (nv, hv)
        results[name] = ("ok" if ok
                         else f"DIFF shredded=({nb},{hb}) "
                              f"variant=({nv},{hv})")
        print(f"{name}: {results[name]} "
              f"[{nb} rows, {time.time()-t:.1f}s]", flush=True)

    ran = [n for n, r in results.items() if r != "n/a"]
    diffs = {n: r for n, r in results.items()
             if r not in ("ok", "n/a")}
    print(json.dumps({
        "sf_dir": SF_DIR,
        "entries_total": len(qs),
        "entries_engine_backed": len(ran),
        "entries_ok": sum(1 for n in ran if results[n] == "ok"),
        "diffs": diffs,
        "wall_sec": round(time.time() - t0, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
