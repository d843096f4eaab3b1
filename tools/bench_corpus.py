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
        "substring_spans": lambda: DD.duplicate_spans(
            docs, n=8, min_count=2).count(),
        "substring_scrub": lambda: DD.scrub_duplicate_spans(
            docs, n=8, min_count=2).count(),
        "classifier_score": lambda: TX.classifier_score(
            docs, vocab_weights()).count(),
        "gopher_gate": lambda: TX.gopher_gate(docs).count(),
        "c4_line_filter": lambda: TX.c4_line_filter(docs).count(),
        "split": lambda: PL.split_corpus(docs).count(),
        "ivfpq_topk": lambda: SIM.ivf_pq_topk(
            embs, k=5, train_iters=2).count(),
        "ivf_topk": lambda: SIM.ivf_topk(
            embs, k=5, train_iters=2).count(),
        "image_dhash": lambda: MM.image_dhash(
            MM.synthesize_assets(docs)).count(),
        "curate_v2": lambda: PL.curate_v2(docs).count(),
        "hashed_vectors": lambda: SIM.hashed_doc_vectors(
            docs).count(),
        "curation_ledger": lambda: PL.curate_v2_ledger(
            docs).count(),
        "events_funnel": lambda: __import__(
            "metacat_spark.streaming.events",
            fromlist=["funnel", "load_events"]).funnel(
            __import__("metacat_spark.streaming.events",
                       fromlist=["load_events"]).load_events(
                spark, SF_DIR),
            ["view", "click", "purchase"], horizon_s=86400).count(),
        "events_anomalies": lambda: __import__(
            "metacat_spark.streaming.events",
            fromlist=["window_anomalies", "load_events"]
        ).window_anomalies(
            __import__("metacat_spark.streaming.events",
                       fromlist=["load_events"]).load_events(
                spark, SF_DIR)).count(),
    }
    only = set(sys.argv[1:])
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
