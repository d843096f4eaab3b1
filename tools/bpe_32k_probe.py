#!/usr/bin/env python3
"""BPE at production scale, end-to-end (VERDICT r10 #7): train a
32k-merge vocabulary over the sf0.1 corpus and measure each phase —
the ONE distributed word-count aggregation, the driver-side
incremental merge loop, and the Arrow encode pass with the full rank
dict riding the closure — plus a corpus-wide round-trip integrity
check (detokenized output must equal the lowercased whitespace
words). Results land in docs/SCALING.md.

The sf0.1 fixture vocabulary may exhaust its pair mass before 32k
merges (merges stop when no pair repeats); the probe reports the
merges actually learned. To exercise a FULL 32k rank dict in encode
regardless, pass --synth to train on a deterministic synthetic
word-count table with enough pair mass, then encode the real corpus
with that dict.

Run: python tools/bpe_32k_probe.py [--synth] [--merges N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synth_counts(n_words: int = 60000):
    """Deterministic word-count table with abundant pair mass: words
    are base-26 expansions of their index (4-8 chars), Zipf-ish
    counts — enough repeated pairs to sustain >= 32k merges."""
    words = []
    for i in range(n_words):
        x, chars = i, []
        for _ in range(4 + i % 5):
            chars.append(chr(ord("a") + x % 26))
            x //= 26
        words.append(("".join(chars), 1 + n_words // (i + 1)))
    words.sort(key=lambda kv: (-kv[1], kv[0]))
    return words


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=32000)
    ap.add_argument("--synth", action="store_true")
    args = ap.parse_args()

    from metacat_spark.llm.train import (bpe_encode,
                                         bpe_merges_from_counts,
                                         word_counts)
    spark = get_spark("bpe32k_probe")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    t0 = time.time()
    if args.synth:
        counts = synth_counts()
        t_count = 0.0
        print(f"# synthetic count table: {len(counts)} words")
    else:
        counts = [(r["word"], r["n"])
                  for r in word_counts(docs, 50000).collect()]
        counts.sort(key=lambda kv: (-kv[1], kv[0]))
        t_count = time.time() - t0
        print(f"# word-count aggregation: {t_count:.2f}s "
              f"({len(counts)} distinct words)")

    t1 = time.time()
    merges = bpe_merges_from_counts(counts, args.merges)
    t_merge = time.time() - t1
    print(f"# merge loop: {len(merges)} merges learned "
          f"(requested {args.merges}) in {t_merge:.2f}s")

    mdf = spark.createDataFrame(
        merges, "step int, left string, right string, freq long")
    t2 = time.time()
    enc = bpe_encode(docs, mdf)
    # consume EVERYTHING (memory rule: unconsumed deterministic work
    # gets pruned): token-count sum + value hash over the tokens
    row = enc.agg(
        F.sum("n_bpe_tokens").alias("toks"),
        F.bit_xor(F.xxhash64(F.col("bpe_tokens").cast("string")))
        .alias("h")).collect()[0]
    t_enc = time.time() - t2
    n_docs = docs.count()
    print(f"# encode: {n_docs} docs, {row['toks']} bpe tokens in "
          f"{t_enc:.2f}s -> {row['toks'] / t_enc:,.0f} tokens/s "
          f"(hash {row['h']})")

    # corpus-wide round-trip integrity: joining the tokens and
    # turning </w> back into spaces must reproduce the lowercased
    # whitespace words exactly, for every document
    t3 = time.time()
    joined = enc.select(
        F.col("doc_id"),
        F.regexp_replace(F.concat_ws("", "bpe_tokens"), "</w>", " ")
        .alias("detok"))
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                     lambda x: x != "")
    ref = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.when(F.size(words) > 0,
               F.concat(F.concat_ws(" ", words), F.lit(" ")))
        .otherwise(F.lit("")).alias("ref"))
    bad = (joined.join(ref, "doc_id")
           .where(F.col("detok") != F.col("ref")).count())
    t_rt = time.time() - t3
    print(f"# round-trip mismatches: {bad} (checked in {t_rt:.2f}s)")
    print({"merges": len(merges), "count_s": round(t_count, 2),
           "merge_s": round(t_merge, 2), "encode_s": round(t_enc, 2),
           "tokens": int(row["toks"]),
           "tokens_per_s": int(row["toks"] / t_enc),
           "roundtrip_bad": bad})
    spark.stop()
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
