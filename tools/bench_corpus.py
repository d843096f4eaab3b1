#!/usr/bin/env python3
"""Wall-clock micro-bench for the training-corpus operators at sf0.1
(local[32]) — the feedback loop for the beyond-reference surface,
separate from bench.py's 13-query driver suite. Prints one JSON line;
paste the table into docs/SCALING.md when numbers move.
Run: python tools/bench_corpus.py [op ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _consume(df):
    """Force EVERY output column (count() lets Catalyst prune all
    projection work — a projection-only op would time as a bare scan;
    review r6). Same struct-hash sink as bench.py."""
    cols = [F.col(c) for c in df.columns]
    row = (df.select(F.xxhash64(F.struct(*cols)).alias("__h"))
           # bit_xor: order-independent consumption sink with no
           # ANSI long-overflow hazard (sum of 2^63-range hashes
           # overflows)
           .agg(F.count("__h").alias("n"), F.bit_xor("__h"))
           .collect()[0])
    return row["n"]


def _search():
    from metacat_spark.llm import search as SR
    return SR


def _train():
    from metacat_spark.llm import train as TR
    return TR


_BPE_CACHE = {}


def _bpe_merges_once(docs):
    if "m" not in _BPE_CACHE:
        _BPE_CACHE["m"] = _train().train_bpe_merges(docs,
                                                    num_merges=100)
    return _BPE_CACHE["m"]


def _text_index_once(docs):
    if "ti" not in _BPE_CACHE:
        _BPE_CACHE["ti"] = _search().build_text_index(docs) \
            .localCheckpoint(eager=True)
    return _BPE_CACHE["ti"]


def main():
    spark = get_spark("bench_corpus")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs.count(), embs.count()   # warm the scans

    from metacat_spark.llm import dedup as DD
    from metacat_spark.llm import multimodal as MM
    from metacat_spark.llm import similarity as SIM
    from metacat_spark.llm import text as TX
    from metacat_spark.llm import pipeline as PL

    def vocab_weights():
        return (docs.select(F.explode(TX.tokens(F.col("text")))
                            .alias("term")).distinct()
                .select("term", (((F.length("term") % 7) - 3) / 3.0)
                        .alias("weight")))

    cases = {
        "substring_spans": lambda: _consume(DD.duplicate_spans(
            docs, n=8, min_count=2)),
        "substring_scrub": lambda: _consume(DD.scrub_duplicate_spans(
            docs, n=8, min_count=2)),
        "classifier_score": lambda: _consume(TX.classifier_score(
            docs, vocab_weights())),
        "gopher_gate": lambda: _consume(TX.gopher_gate(docs)),
        "c4_line_filter": lambda: _consume(TX.c4_line_filter(docs)),
        "split": lambda: _consume(PL.split_corpus(docs)),
        "ivfpq_topk": lambda: _consume(SIM.ivf_pq_topk(
            embs, k=5, train_iters=2)),
        "ivf_topk": lambda: _consume(SIM.ivf_topk(
            embs, k=5, train_iters=2)),
        "image_dhash": lambda: _consume(MM.image_dhash(
            MM.synthesize_assets(docs))),
        "curate_v2": lambda: _consume(PL.curate_v2(docs)),
        "curate_v3": lambda: _consume(PL.curate_v3(docs)),
        "moore_lewis": lambda: _consume(TX.moore_lewis_scores(
            docs.where("source <> 'src0'"),
            docs.where("source = 'src0'"))),
        "domain_cap": lambda: _consume(PL.cap_per_domain(docs, n=30)),
        "hashed_vectors": lambda: _consume(SIM.hashed_doc_vectors(
            docs)),
        "curation_ledger": lambda: _consume(PL.curate_v2_ledger(
            docs)),
        "events_funnel": lambda: _consume(__import__(
            "metacat_spark.streaming.events",
            fromlist=["funnel", "load_events"]).funnel(
            __import__("metacat_spark.streaming.events",
                       fromlist=["load_events"]).load_events(
                spark, SF_DIR),
            ["view", "click", "purchase"], horizon_s=86400)),
        "events_anomalies": lambda: _consume(__import__(
            "metacat_spark.streaming.events",
            fromlist=["window_anomalies", "load_events"]
        ).window_anomalies(
            __import__("metacat_spark.streaming.events",
                       fromlist=["load_events"]).load_events(
                spark, SF_DIR))),
        "bm25_scores": lambda: _consume(_search().bm25_scores(
            docs, ["spark", "window", "merge"])),
        "hybrid_rrf": lambda: _consume(_search().hybrid_rrf(
            docs, embs, ["spark", "window", "merge"],
            query_vec_id=0)),
        "dsir_weights": lambda: _consume(TX.dsir_logweights(
            docs.where("source <> 'src0'"),
            docs.where("source = 'src0'"), buckets=1024)),
        "train_logreg": lambda: _consume(_train().train_logreg_hashed(
            docs.withColumn(
                "y", (F.col("source") == "src0").cast("double")),
            "y", steps=4, lr=25.0)),
        "bpe_train": lambda: _consume(_train().train_bpe_merges(
            docs, num_merges=100)),
        # merge table trained ONCE outside the timed closure — the
        # encode number must not carry the training cost (bpe_train
        # measures that separately; review r9)
        "bpe_encode": lambda: _consume(_train().bpe_encode(
            docs, _bpe_merges_once(docs))),
        # r11 additions
        "perplexity_buckets": lambda: _consume(
            TX.perplexity_buckets(docs,
                                  docs.where("source = 'src0'"))),
        "strip_markup": lambda: _consume(TX.strip_markup(docs)),
        "attribution": lambda: _consume(__import__(
            "metacat_spark.streaming.events",
            fromlist=["x"]).attribution(__import__(
                "metacat_spark.streaming.events",
                fromlist=["x"]).load_events(
                    get_spark("bench_corpus"), SF_DIR))),
        "text_index_build": lambda: _consume(
            _search().build_text_index(docs)),
        # index built ONCE outside the timed closure — the serve
        # number must not carry the build cost (same discipline as
        # bpe_encode)
        "text_index_serve": lambda: _consume(
            _search().search_text_index(
                _text_index_once(docs),
                ["spark", "window", "merge"], k=10)),
    }
    only = set(sys.argv[1:])
    if not only or "bpe_encode" in only:
        _bpe_merges_once(docs)  # train OUTSIDE bpe_encode's timing
    out = {}
    for name, fn in cases.items():
        if only and name not in only:
            continue
        t = time.time()
        rows = fn()
        out[name] = {"sec": round(time.time() - t, 3), "rows": rows}
        print(f"# {name}: {out[name]['sec']}s ({rows} rows)",
              file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "ops": out}))
    spark.stop()


if __name__ == "__main__":
    main()
