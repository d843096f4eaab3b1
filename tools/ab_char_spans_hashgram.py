#!/usr/bin/env python3
"""A/B the duplicate_char_spans count-key representation at sf0.1
(VERDICT r10 #3): string gram keys (k chars through both exchanges)
vs hash_grams=True (xxhash64 longs). Reports interleaved wall-clock
medians AND the measured shuffle-write bytes per variant, read from
the Spark UI REST API (the only place local-mode exchange sizes are
observable without a listener jar).

Run on a quiet host: python tools/ab_char_spans_hashgram.py
"""

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3
K = 50


def _ui(spark):
    return spark.sparkContext.uiWebUrl


def _shuffle_write_bytes(spark):
    """Total shuffle-write bytes across all completed stages so far
    (monotonic within the app) — deltas around a run isolate that
    run's exchanges."""
    base = _ui(spark)
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=30) as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main():
    from metacat_spark.llm.dedup import duplicate_char_spans
    spark = get_spark("ab_char_spans", ui=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()                                    # warm the scan

    def run(hash_grams):
        df = duplicate_char_spans(docs, k=K, min_count=2,
                                  hash_grams=hash_grams)
        # consume every column (unconsumed deterministic work gets
        # pruned — the repo's recurring measurement bug class)
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("doc_id", "span_start", "span_end",
                                 "span_chars")).alias("h")
        ).collect()[0]
        return row["n"], row["h"]

    # parity first (cheap insurance before timing anything)
    n0, h0 = run(False)
    n1, h1 = run(True)
    assert (n0, h0) == (n1, h1), (
        f"span mismatch: plain ({n0},{h0}) vs hashed ({n1},{h1})")
    print(f"# parity: {n0} spans, identical hashes")

    times = {False: [], True: []}
    bytes_ = {False: [], True: []}
    for rep in range(REPS):
        for hg in (False, True) if rep % 2 == 0 else (True, False):
            b0 = _shuffle_write_bytes(spark)
            t0 = time.time()
            run(hg)
            dt = time.time() - t0
            db = _shuffle_write_bytes(spark) - b0
            times[hg].append(dt)
            bytes_[hg].append(db)
            print(f"# rep {rep} hash_grams={hg}: {dt:.2f}s, "
                  f"shuffle-write {db / 1e6:.1f} MB")
    out = {
        "k": K,
        "plain_median_s": round(statistics.median(times[False]), 2),
        "hashed_median_s": round(statistics.median(times[True]), 2),
        "plain_shuffle_mb": round(
            statistics.median(bytes_[False]) / 1e6, 1),
        "hashed_shuffle_mb": round(
            statistics.median(bytes_[True]) / 1e6, 1),
        "spans": n0,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
