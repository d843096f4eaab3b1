"""Interleaved A/B: q8 minhash-LSH band identity as concat_ws STRING
(the pre-r8 representation, inlined below as lsh_bandstring) vs
xxhash64 LONG (adopted into minhash_lsh_pairs in r8). Run:

    python tools/ab_q8_bandkey.py [reps]

Measured at adoption time (sf0.1, local[32], 6 interleaved reps):
medians 2.27 s (string) vs 2.29 s (long) — flat locally (the banded
shuffle is tiny at this SF); adopted for the scale shape. The tool
keeps the OLD variant inlined so the measurement stays re-runnable
against the library's current implementation (review r8: after
adoption, comparing the library to a copy of itself would be
vacuous).

Protocol per the repo's measurement discipline: interleave the two
variants rep by rep, report medians (host noise is ±1.5 s on single
runs), and assert output parity (identical pair sets) every rep.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.llm.dedup import (POLY_MOD, _lcg_params,
                                     hashed_shingle_rows,
                                     minhash_lsh_pairs)
from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def lsh_bandstring(df, n=2, k=32, bands=8, threshold=0.5):
    """The PRE-r8 minhash_lsh_pairs: band identity as a '_'-joined
    STRING of the row hashes, joined on (band, sig) — the comparison
    arm for the adopted hashed-band-key library implementation."""
    rows = k // bands
    shr = hashed_shingle_rows(df, n, "text", "doc_id") \
        .localCheckpoint(eager=False)
    ex0 = shr.withColumn("h", F.pmod(F.col("h64"), F.lit(POLY_MOD)))
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % POLY_MOD)
            .alias(f"mh_{i}")
            for i, (a, b) in enumerate(_lcg_params(k))]
    sig = (ex0.groupBy("id").agg(F.count("*").alias("n_sh"), *aggs)
           .localCheckpoint(eager=False))
    band_cols = [F.struct(F.lit(bi).alias("band"),
                          F.concat_ws("_", *[F.col(f"mh_{bi * rows + r}")
                                             for r in range(rows)])
                          .alias("sig"))
                 for bi in range(bands)]
    exploded = (sig.select("id",
                           F.explode(F.array(*band_cols)).alias("bs"))
                .select("id", F.col("bs.band").alias("band"),
                        F.col("bs.sig").alias("sig")))
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    sizes = sig.select("id", "n_sh")
    inter = (cand
             .join(shr.select(F.col("id").alias("id_a"), "h64"),
                   "id_a")
             .join(shr.select(F.col("id").alias("id_b"), "h64"),
                   ["id_b", "h64"])
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.select(F.col("id").alias("id_a"),
                               F.col("n_sh").alias("n_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("n_sh").alias("n_b")), "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_inter")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_inter")), 6))
            .where(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "jaccard"))


def consume(df):
    cols = [F.col(c) for c in df.columns]
    r = (df.select(F.xxhash64(F.struct(*cols)).alias("h"))
         .agg(F.count("h").alias("n"), F.bit_xor("h").alias("x"))
         .collect()[0])
    return r["n"], r["x"]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("ab_q8_bandkey")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # warm both paths once
    consume(lsh_bandstring(docs))
    consume(minhash_lsh_pairs(docs, n=2, k=32, bands=8, threshold=0.5))
    old, new = [], []
    for i in range(reps):
        t = time.time()
        ref = consume(lsh_bandstring(docs))
        old.append(time.time() - t)
        t = time.time()
        got = consume(minhash_lsh_pairs(docs, n=2, k=32, bands=8,
                                        threshold=0.5))
        new.append(time.time() - t)
        assert got == ref, f"parity broke: {got} != {ref}"
        print(f"rep {i}: bandstring {old[-1]:.3f}s  bandkey(lib) "
              f"{new[-1]:.3f}s  (pairs={ref[0]})", flush=True)
    print(f"median bandstring {statistics.median(old):.3f}s  "
          f"bandkey(lib) {statistics.median(new):.3f}s")


if __name__ == "__main__":
    main()
