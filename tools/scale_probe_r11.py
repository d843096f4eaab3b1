#!/usr/bin/env python3
"""16× scale probe for the round-11 operators (VERDICT r11 #5 — the
1×→4× gate bounds growth but 4× of sf0.001 is small): replicate the
sf0.1 tables IN-PLAN at 1×/4×/16× and time

- text_index build (the corpus scan + (id, term) aggregate),
- text_index serve from a STORED artifact built at that multiple
  (the pruned-scan query path),
- batched serve of 8 queries (search_text_index_many, r12),
- marketing attribution (linear model, disjoint replica users),
- WordPiece and unigram-LM encode with a FIXED vocab trained once at
  1× (encoding is the corpus-scaling stage; training is bounded by
  the count table, already probed in the 32k tools).

Linear-or-better wall growth is the pass signal. Run on a quiet
host: python tools/scale_probe_r11.py [multiples...]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY = ["spark", "window", "merge"]
BATCH = {f"q{i}": t for i, t in enumerate(
    [["spark", "window", "merge"], ["the", "data"], ["spark"],
     ["merge", "join"], ["window"], ["query", "plan"],
     ["stream", "batch"], ["the"]])}


def _replicate_docs(docs, n):
    if n == 1:
        return docs
    r = F.explode(F.sequence(F.lit(1), F.lit(n))).alias("__r")
    return (docs.select("*", r)
            .withColumn("doc_id",
                        F.col("doc_id") * 1000 + F.col("__r"))
            .drop("__r"))


def _replicate_events(spark, n):
    from metacat_spark.streaming.events import load_events
    ev = load_events(spark, SF_DIR)
    if n == 1:
        return ev
    r = F.explode(F.sequence(F.lit(1), F.lit(n))).alias("__r")
    return (ev.select("*", r)
            .withColumn("user_id",
                        F.col("user_id") * 100000 + F.col("__r"))
            .drop("__r"))


def probe(spark, mult, wp_vocab, uni_vocab):
    from metacat_spark.llm.search import (build_text_index,
                                          search_text_index,
                                          search_text_index_many)
    from metacat_spark.llm.train import (unigram_encode,
                                         wordpiece_encode)
    from metacat_spark.streaming.events import attribution

    docs = _replicate_docs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), mult)
    out = {}

    def t(name, fn):
        t0 = time.time()
        rows = fn()
        out[name] = {"sec": round(time.time() - t0, 3), "rows": rows}
        print(f"#   {mult}x {name}: {out[name]['sec']}s "
              f"({rows} rows)", file=sys.stderr)

    idx_path = f"/tmp/sp_r11_idx_{mult}"
    shutil.rmtree(idx_path, ignore_errors=True)

    def build():
        build_text_index(docs).write.parquet(idx_path)
        return spark.read.parquet(idx_path).count()

    t("text_index_build_write", build)
    stored = spark.read.parquet(idx_path)
    t("text_index_serve", lambda: search_text_index(
        stored, QUERY, k=10).count())
    t("text_index_serve_many8", lambda: search_text_index_many(
        stored, BATCH, k=10).count())
    # replicas need distinct users AND event ids — the credit window
    # partitions on conversion id, so colliding replica ids would
    # merge windows and distort the work shape (scale-gate caveat)
    t("attribution_linear", lambda: attribution(
        _replicate_events(spark, mult)
        .withColumn("event_id", F.xxhash64("event_id", "user_id")),
        model="linear", lookback_s=86400).count())
    t("wordpiece_encode", lambda: wordpiece_encode(
        docs, wp_vocab).selectExpr("sum(size(pieces))").collect()[0][0])
    t("unigram_encode", lambda: unigram_encode(
        docs, uni_vocab).selectExpr("sum(size(pieces))").collect()[0][0])
    shutil.rmtree(idx_path, ignore_errors=True)
    return out


def main():
    from metacat_spark.llm.train import train_unigram, train_wordpiece
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale_probe_r11")
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print("# training fixed vocabs at 1x ...", file=sys.stderr)
    wp_vocab = train_wordpiece(docs1, vocab_size=2000)
    uni_vocab = train_unigram(docs1, vocab_size=2000)
    wp_vocab = wp_vocab.cache()
    uni_vocab = uni_vocab.cache()
    wp_vocab.count(), uni_vocab.count()
    # warm pass so 1x doesn't carry JVM/codegen startup
    probe(spark, 1, wp_vocab, uni_vocab)
    results = {}
    for m in mults:
        spark.sparkContext._jvm.System.gc()
        results[str(m)] = probe(spark, m, wp_vocab, uni_vocab)
    print(json.dumps({"sf_dir": SF_DIR, "multiples": results}))
    spark.stop()


if __name__ == "__main__":
    main()
