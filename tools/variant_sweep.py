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

Entries in PINNED carry a documented REPRESENTATION difference
(same values, different rendering — VERDICT r7 #6); their transform
canonicalizes BOTH sides before hashing, so the sweep still asserts
VALUE equality for them (a variant-mode value bug would fail the
pinned compare too). Everything else must be hash-identical raw.

Prints one line per entry and a JSON summary; paste the summary into
docs/SCALING.md. tests/test_variant_sweep.py wires run_sweep() into
pytest behind SPARK_GRAFT_VARIANT_SWEEP=1 so the sweep can't rot."""

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


def _pin_maxrun_as_string(df):
    # min/max over a SCHEMA-FREE key returns the numerically-correct
    # value as its string rendering ('499') — variant mode cannot
    # recover the shredded column's declared long type (that is the
    # definition of schema-free). Pin: compare the string rendering
    # on both sides; a wrong VALUE (the pre-r7 lexicographic '99')
    # still fails.
    return df.withColumn("max_run", F.col("max_run").cast("string"))


def _pin_json_canonical(df):
    # object-valued metadata renders in the variant encoding's
    # canonical (sorted-key) form vs the shredded map's source key
    # order — same JSON value. Pin: canonicalize BOTH sides through
    # parse_json→to_json (the variant canonical form); non-JSON
    # strings pass through. Different VALUES still differ.
    return df.withColumn(
        "value", F.coalesce(F.to_json(F.try_parse_json("value")),
                            F.col("value")))


# The three documented representation diffs (docs/SCALING.md §variant
# sweep; VERDICT r7 #6). Each transform applies to BOTH modes.
PINNED = {
    "meta_numeric_stats": _pin_maxrun_as_string,
    "agg_cube_namespace_datatype": _pin_maxrun_as_string,
    "summary_key_values": _pin_json_canonical,
}


def run_sweep(spark, sf_dir: str) -> dict:
    """Run the parity sweep; returns the summary dict (see main)."""
    import __spark_entry__ as E
    from metacat_spark.catalog import from_materialized
    from metacat_spark.engine import Engine

    base_eng = Engine(from_materialized(spark, sf_dir, variant=False))
    var_eng = Engine(from_materialized(spark, sf_dir, variant=True))
    qs = E.queries()

    results, t0 = {}, time.time()
    # restore whatever engine was cached before: leaking var_eng into
    # the shared entry cache would silently run every LATER caller in
    # the same process against the variant warehouse (review r8)
    prev = E._CACHE.get(sf_dir)
    try:
        for name, fn in qs.items():
            try:
                src = inspect.getsource(fn)
            except OSError:
                src = "engine"          # be conservative: run it
            if "engine" not in src.lower():
                results[name] = "n/a"
                continue
            pin = PINNED.get(name)
            t = time.time()
            try:
                E._CACHE[sf_dir] = base_eng
                out = fn(spark, sf_dir)
                nb, hb = value_hash(pin(out) if pin else out)
                E._CACHE[sf_dir] = var_eng
                out = fn(spark, sf_dir)
                nv, hv = value_hash(pin(out) if pin else out)
            except Exception as e:  # noqa: BLE001 — sweep must finish
                results[name] = f"ERR {type(e).__name__}: {e}"[:200]
                print(f"{name}: {results[name]}", flush=True)
                continue
            ok = (nb, hb) == (nv, hv)
            results[name] = (("pinned-ok" if pin else "ok") if ok
                             else f"DIFF shredded=({nb},{hb}) "
                                  f"variant=({nv},{hv})")
            print(f"{name}: {results[name]} "
                  f"[{nb} rows, {time.time()-t:.1f}s]", flush=True)
    finally:
        if prev is None:
            E._CACHE.pop(sf_dir, None)
        else:
            E._CACHE[sf_dir] = prev

    ran = [n for n, r in results.items() if r != "n/a"]
    diffs = {n: r for n, r in results.items()
             if r not in ("ok", "pinned-ok", "n/a")}
    return {
        "sf_dir": sf_dir,
        "entries_total": len(qs),
        "entries_engine_backed": len(ran),
        "entries_ok": sum(1 for n in ran if results[n] == "ok"),
        "entries_pinned_ok": sum(1 for n in ran
                                 if results[n] == "pinned-ok"),
        "diffs": diffs,
        "wall_sec": round(time.time() - t0, 1),
    }


def main():
    from metacat_spark.session import get_spark
    spark = get_spark("variant_sweep")
    print(json.dumps(run_sweep(spark, SF_DIR)))
    spark.stop()


if __name__ == "__main__":
    main()
