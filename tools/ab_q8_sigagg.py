"""Interleaved A/B: q8 minhash signature aggregation strategies
(VERDICT r8 #1 — restructure the k=32 per-permutation min columns,
measure-first). Four arms share the library's candidate+verify tail
(`dedup._lsh_candidate_verify`) so ONLY the signature stage differs:

  kperm    — library `minhash_lsh_pairs`: k min-aggregate columns,
             each `min((a_i*h + b_i) % POLY_MOD)` over every shingle
             row (k multiply-add-mods per row in the hash-agg update)
  oph1     — One Permutation Hashing (Li/Owen/Zhang, NIPS 2012): one
             bucket index per shingle (top hash bits mod k), ONE
             groupBy(id) with k conditional mins `min(when(bkt==i,h))`
             (k integer compares per row instead of k mul-add-mods),
             empty buckets densified from the doc's global min via the
             LCG params (doc-consistent: identical shingle sets give
             identical signatures; unrelated docs' fills never
             spuriously collide because the fill depends on the doc's
             own global min)
  oph2     — OPH two-level: groupBy(id, bkt).min — O(1) agg update
             per shingle row, map-side combine to <= k rows/doc —
             then a second tiny groupBy(id) assembles the k columns.
             The per-shingle k-factor disappears entirely; the price
             is a second (tiny) shuffle of <= k rows per doc.
  arraymin — the literal "one accumulator array of k mins" shape:
             per-row array of the k permuted hashes, posexplode, then
             groupBy(id, pos).min + assemble. Same k muls per shingle
             as kperm PLUS a k-times row explode — expected negative,
             recorded per the measure-first protocol.

Run:  python tools/ab_q8_sigagg.py [reps]

Protocol per the repo's measurement discipline: interleave all arms
rep by rep, report medians (host noise is ±1.5 s on single runs),
print each arm's found-pair count against the exact n-gram-Jaccard
pair count (the recall the certificate entry gates at >= 0.9), and
flag any output divergence between arms.

RESULT (r9, sf0.1, local[32], quiet host — load avg 0.26 at start,
5 interleaved reps): **negative — kperm stays.**

    medians: kperm 2.247s  oph1 2.826s  oph2 2.597s  arraymin 2.986s
    recall:  kperm 256/256  oph1 254/256  oph2 254/256  arraymin 256/256

The k=32 codegen multiply-add-mods in the hash-agg update are NOT the
bottleneck at this scale: every restructure that removes them pays
more in extra agg/shuffle machinery than it saves (oph2's O(1)/row
update still loses 0.35 s to its second groupBy; arraymin's k-times
posexplode row blowup is the worst arm, the predicted negative). OPH
also drops 2 of 256 true pairs (densified empty buckets weaken two
borderline bands) — above the 0.9 certificate gate but a real recall
cost for zero speed win. The library keeps the k-min-column
signature; at genuinely compute-bound scale oph2 is the arm to
re-measure first (its per-shingle work is O(1) and its extra shuffle
is <= k rows/doc, the only shape here that gets CHEAPER relative to
kperm as docs/shingles grow).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.llm.dedup import (POLY_MOD, _lcg_params,
                                     _lsh_candidate_verify,
                                     hashed_shingle_rows,
                                     minhash_lsh_pairs,
                                     ngram_jaccard_pairs)
from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N, K, BANDS, THRESH = 2, 32, 8, 0.5


def _ex0(shr):
    return (shr
            .withColumn("bkt", F.pmod(
                F.shiftrightunsigned("h64", 33), F.lit(K)))
            .withColumn("h", F.pmod(F.col("h64"), F.lit(POLY_MOD))))


def _densify(sig0):
    """Fill empty OPH buckets from the doc's global shingle min via
    the LCG params: per-slot distinct, deterministic, and a function
    of the doc's own shingle set only."""
    dens = [F.coalesce(
        F.col(f"raw_{i}"),
        (F.lit(a) * F.col("_g") + F.lit(b)) % POLY_MOD).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_lcg_params(K))]
    return sig0.select("id", "n_sh", *dens)


def lsh_oph1(docs):
    shr = hashed_shingle_rows(docs, N, "text", "doc_id") \
        .localCheckpoint(eager=False)
    ex0 = _ex0(shr)
    aggs = [F.min(F.when(F.col("bkt") == i, F.col("h")))
            .alias(f"raw_{i}") for i in range(K)]
    sig0 = ex0.groupBy("id").agg(F.count("*").alias("n_sh"),
                                 F.min("h").alias("_g"), *aggs)
    sig = _densify(sig0).localCheckpoint(eager=False)
    return _lsh_candidate_verify(shr, sig, K, BANDS, THRESH)


def lsh_oph2(docs):
    shr = hashed_shingle_rows(docs, N, "text", "doc_id") \
        .localCheckpoint(eager=False)
    ex0 = _ex0(shr)
    lvl1 = ex0.groupBy("id", "bkt").agg(F.min("h").alias("mn"),
                                        F.count("*").alias("c"))
    aggs = [F.min(F.when(F.col("bkt") == i, F.col("mn")))
            .alias(f"raw_{i}") for i in range(K)]
    sig0 = lvl1.groupBy("id").agg(F.sum("c").alias("n_sh"),
                                  F.min("mn").alias("_g"), *aggs)
    sig = _densify(sig0).localCheckpoint(eager=False)
    return _lsh_candidate_verify(shr, sig, K, BANDS, THRESH)


def lsh_arraymin(docs):
    shr = hashed_shingle_rows(docs, N, "text", "doc_id") \
        .localCheckpoint(eager=False)
    ex0 = shr.withColumn("h", F.pmod(F.col("h64"), F.lit(POLY_MOD)))
    arr = F.array(*[(F.lit(a) * F.col("h") + F.lit(b)) % POLY_MOD
                    for a, b in _lcg_params(K)])
    pe = ex0.select("id", F.posexplode(arr).alias("pos", "v"))
    lvl1 = pe.groupBy("id", "pos").agg(F.min("v").alias("mn"),
                                       F.count("*").alias("c"))
    aggs = [F.min(F.when(F.col("pos") == i, F.col("mn")))
            .alias(f"mh_{i}") for i in range(K)]
    sig = (lvl1.groupBy("id")
           .agg(F.max(F.when(F.col("pos") == 0, F.col("c")))
                .alias("n_sh"), *aggs)
           .select("id", "n_sh", *[f"mh_{i}" for i in range(K)])
           .localCheckpoint(eager=False))
    return _lsh_candidate_verify(shr, sig, K, BANDS, THRESH)


ARMS = {
    "kperm": lambda d: minhash_lsh_pairs(d, n=N, k=K, bands=BANDS,
                                         threshold=THRESH),
    "oph1": lsh_oph1,
    "oph2": lsh_oph2,
    "arraymin": lsh_arraymin,
}


def consume(df):
    cols = [F.col(c) for c in df.columns]
    r = (df.select(F.xxhash64(F.struct(*cols)).alias("h"))
         .agg(F.count("h").alias("n"), F.bit_xor("h").alias("x"))
         .collect()[0])
    return r["n"], r["x"]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_q8_sigagg")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_exact = ngram_jaccard_pairs(
        docs, n=N, threshold=THRESH, max_df=None).count()
    print(f"exact pairs at threshold {THRESH}: {n_exact}", flush=True)
    outs, times = {}, {a: [] for a in ARMS}
    for a, fn in ARMS.items():            # warm every arm once
        outs[a] = consume(fn(docs))
        print(f"warm {a}: pairs={outs[a][0]} "
              f"recall={outs[a][0] / max(n_exact, 1):.3f}", flush=True)
    for i in range(reps):
        for a, fn in ARMS.items():
            t = time.time()
            got = consume(fn(docs))
            times[a].append(time.time() - t)
            if got != outs[a]:
                print(f"  !! {a} nondeterministic: {got} != {outs[a]}")
        print("rep %d: %s" % (i, "  ".join(
            f"{a} {times[a][-1]:.3f}s" for a in ARMS)), flush=True)
    print("medians: " + "  ".join(
        f"{a} {statistics.median(times[a]):.3f}s" for a in ARMS))
    ref = outs["kperm"]
    for a in ARMS:
        if outs[a] != ref:
            print(f"output divergence vs kperm: {a} {outs[a]} "
                  f"(recall {outs[a][0] / max(n_exact, 1):.3f})")


if __name__ == "__main__":
    main()
