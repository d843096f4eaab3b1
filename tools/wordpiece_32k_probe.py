#!/usr/bin/env python3
"""WordPiece at production scale, end-to-end (mirror of
bpe_32k_probe): train a vocab over the sf0.1 corpus and measure each
phase — the ONE distributed word-count aggregation, the driver-side
incremental likelihood-gain merge loop, and the Arrow greedy-encode
pass with the full piece set riding the closure — plus a corpus-wide
integrity check: every non-[UNK] word must reassemble exactly, and
on a corpus-trained vocab (complete alphabet) NO word may be [UNK].

The sf0.1 fixture vocabulary exhausts its pair mass well before 32k
merges (merges need a pair count >= 2); the probe reports the merges
actually learned. To exercise a FULL 32k-merge loop regardless, pass
--synth to train on the deterministic synthetic word-count table
(shared with the BPE probe).

Run: python tools/wordpiece_32k_probe.py [--synth] [--vocab N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.session import get_spark
from tools.bpe_32k_probe import synth_counts

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--synth", action="store_true")
    args = ap.parse_args()

    from metacat_spark.llm.train import (_wp_units, word_counts,
                                         wordpiece_encode,
                                         wordpiece_from_counts)
    spark = get_spark("wordpiece32k_probe")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    t0 = time.time()
    counts = [(r["word"], r["n"]) for r in word_counts(docs).collect()]
    counts.sort(key=lambda kv: (-kv[1], kv[0]))
    t_counts = time.time() - t0
    print(f"word-count aggregation: {t_counts:.2f}s "
          f"({len(counts)} forms)")

    train_counts = synth_counts(60000) if args.synth else counts
    alphabet = set()
    for w, _ in train_counts:
        alphabet.update(_wp_units(w))
    n_merges = max(0, args.vocab - len(alphabet))
    t0 = time.time()
    merges = wordpiece_from_counts(train_counts, n_merges)
    t_merge = time.time() - t0
    print(f"merge loop: {len(merges)} merges learned "
          f"(asked {n_merges}) in {t_merge:.2f}s")

    # vocab for encode: REAL-corpus alphabet + learned pieces (on
    # --synth the pieces come from the synthetic table but the
    # alphabet must cover the corpus or every word is [UNK])
    corpus_alpha = set()
    for w, _ in counts:
        corpus_alpha.update(_wp_units(w))
    rows = [(0, u, None) for u in sorted(corpus_alpha | alphabet)]
    rows += [(s, piece, score) for s, _l, _r, piece, score in merges]
    vocab = spark.createDataFrame(
        rows, "step int, piece string, score double")
    print(f"vocab size riding the closure: {len(rows)}")

    t0 = time.time()
    enc = wordpiece_encode(docs, vocab)
    joined = (enc.join(docs.select("doc_id", "text"), "doc_id")
              .select(
        "n_pieces",
        F.expr("array_contains(pieces, '[UNK]')").alias("has_unk"),
        (F.concat_ws("", F.transform(
            "pieces", lambda p: F.regexp_replace(p, "^##", "")))
         == F.regexp_replace(F.lower("text"), r"\s+", ""))
        .alias("ok")))
    agg = joined.agg(
        F.count("*").alias("docs"),
        F.sum("n_pieces").alias("pieces"),
        F.sum(F.when(F.col("has_unk"), 1).otherwise(0)).alias("unk"),
        F.sum(F.when(~F.col("ok") & ~F.col("has_unk"), 1)
              .otherwise(0)).alias("bad")).collect()[0]
    t_enc = time.time() - t0
    print(f"encode: {agg['docs']} docs, {agg['pieces']} pieces in "
          f"{t_enc:.2f}s ({agg['pieces'] / t_enc:,.0f} pieces/s)")
    print(f"integrity: unk_docs={agg['unk']} "
          f"roundtrip_mismatches={agg['bad']}")
    spark.stop()


if __name__ == "__main__":
    main()
