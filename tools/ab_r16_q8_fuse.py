#!/usr/bin/env python3
"""r16 q8 probes (VERDICT r15 #4):

A  — current minhash_lsh_pairs shape (distinct keyed (id,h64), then
     a second exchange by id for the signature agg).
B  — shared-exchange variant: repartition("id") BEFORE the distinct,
     so the distinct AND the signature groupBy(id) ride ONE exchange
     (guide §2.4 "two operations keyed the same way share one
     exchange"); the trade is losing map-side partial dedup before
     that exchange (duplicate within-doc shingles ride the wire).
C  — current shape WITHOUT the two lazy localCheckpoints (the r15
     keep-decision's scale half, re-probed at a bigger SF as VERDICT
     demands).
D  — current shape with AQE off (same re-probe).

Run at sf0.1 AND a synthetic ~sf0.4 (4 text-disjoint copies of the
sf0.1 docs — translate/upper/reverse per copy so no cross-copy
shingle overlap inflates the candidate join). Interleaved reps,
per-rep steal recorded. Results must be row-identical across
variants (asserted once per SF).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from metacat_spark.session import get_spark  # noqa: E402
from metacat_spark.llm import dedup as DD  # noqa: E402


def _consume(df):
    cols = [F.col(c) for c in df.columns]
    return (df.select(F.xxhash64(F.struct(*cols)).alias("__h"))
            .agg(F.count("__h").alias("n"), F.bit_xor("__h"))
            .collect()[0]["n"])


def _ticks():
    p = open("/proc/stat").readline().split()[1:]
    v = [int(x) for x in p]
    return v[7], sum(v), v[3] + v[4]


def minhash_b(df, n=2, k=32, bands=8, threshold=0.5):
    """Variant B: one exchange (keyed id) for distinct + signature."""
    ex = DD.shingle_rows(df, n, "text", "doc_id", distinct=False)
    hashed = ex.select("id", F.xxhash64("shingle").alias("h64"))
    shr = (hashed.repartition("id")
           .dropDuplicates(["id", "h64"])
           .localCheckpoint(eager=False))
    ex0 = shr.withColumn("h", F.pmod(F.col("h64"),
                                     F.lit(DD.POLY_MOD)))
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % DD.POLY_MOD)
            .alias(f"mh_{i}")
            for i, (a, b) in enumerate(DD._lcg_params(k))]
    sig = (ex0.groupBy("id").agg(F.count("*").alias("n_sh"), *aggs)
           .localCheckpoint(eager=False))
    return DD._lsh_candidate_verify(shr, sig, k, bands, threshold)


def minhash_c(df, n=2, k=32, bands=8, threshold=0.5):
    """Variant C: current shape, no localCheckpoints."""
    shr = DD.hashed_shingle_rows(df, n, "text", "doc_id")
    ex0 = shr.withColumn("h", F.pmod(F.col("h64"),
                                     F.lit(DD.POLY_MOD)))
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % DD.POLY_MOD)
            .alias(f"mh_{i}")
            for i, (a, b) in enumerate(DD._lcg_params(k))]
    sig = ex0.groupBy("id").agg(F.count("*").alias("n_sh"), *aggs)
    return DD._lsh_candidate_verify(shr, sig, k, bands, threshold)


def synth_docs(docs, copies=4):
    parts = [docs]
    tweaks = [
        lambda c: F.translate(c, "abcdefghij", "qrstuvwxyz"),
        lambda c: F.upper(c),
        lambda c: F.reverse(c),
    ]
    for i, tw in enumerate(tweaks[:copies - 1]):
        parts.append(docs.select(
            (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
            tw(F.col("text")).alias("text"),
            *[c for c in docs.columns if c not in
              ("doc_id", "text")]))
    import functools
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab_r16_q8")
    spark.sparkContext.setLogLevel("ERROR")
    docs01 = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet")
    docs04 = synth_docs(docs01).localCheckpoint()
    print(f"sf0.1 docs: {docs01.count()}, synthetic sf0.4 docs: "
          f"{docs04.count()}")

    variants = {
        "A_current": lambda d: DD.minhash_lsh_pairs(
            d, n=2, k=32, bands=8, threshold=0.5),
        "B_one_exchange": minhash_b,
        "C_no_checkpoint": minhash_c,
    }

    for label, d in (("sf0.1", docs01), ("sf0.4synth", docs04)):
        # result parity once per SF
        base = sorted(map(tuple, variants["A_current"](d).collect()))
        for name in ("B_one_exchange", "C_no_checkpoint"):
            got = sorted(map(tuple, variants[name](d).collect()))
            assert got == base, f"{label} {name}: rows differ"
        print(f"{label}: all variants row-identical "
              f"({len(base)} pairs)")
        # warm both, then interleave
        for name, fn in variants.items():
            _consume(fn(d))
        times = {name: [] for name in variants}
        steals = []
        for r in range(reps):
            for name, fn in variants.items():
                spark.sparkContext.setJobDescription(
                    f"q8 {label} {name} #{r}")
                s0, t0, i0 = _ticks()
                t = time.time()
                _consume(fn(d))
                dt = round(time.time() - t, 3)
                s1, t1, i1 = _ticks()
                busy = max(1, (t1 - t0) - (i1 - i0))
                times[name].append(dt)
                steals.append(round(100.0 * (s1 - s0) / busy, 1))
        for name, vals in times.items():
            med = sorted(vals)[len(vals) // 2]
            print(f"{label} {name}: median {med} runs {vals}")
        print(f"{label} per-rep steal%: {steals}")
        # AQE-off probe (variant D), current shape only
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        _consume(variants["A_current"](d))
        vals = []
        for r in range(reps):
            t = time.time()
            _consume(variants["A_current"](d))
            vals.append(round(time.time() - t, 3))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(f"{label} D_aqe_off: median "
              f"{sorted(vals)[len(vals) // 2]} runs {vals}")

    # exchange counts for the committed evidence
    for name, fn in variants.items():
        plan = fn(docs01)._jdf.queryExecution().executedPlan() \
            .toString()
        print(f"plan {name}: Exchange mentions "
              f"{plan.count('Exchange')}")
    spark.stop()


if __name__ == "__main__":
    main()
