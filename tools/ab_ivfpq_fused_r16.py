#!/usr/bin/env python3
"""r16 A/B: fused (single-Python-stage) vs two-stage ivf_pq_search
serve, interleaved pairs on the bench's exact served setup, with
per-pair steal annotation so a noisy-neighbor window is
self-identifying (r15 lesson: ordered probes bias toward whichever
shape runs last)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from metacat_spark.catalog import from_materialized  # noqa: E402
from metacat_spark.engine import Engine  # noqa: E402
from metacat_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _consume(df):
    cols = [F.col(c) for c in df.columns]
    return (df.select(F.xxhash64(F.struct(*cols)).alias("__h"))
            .agg(F.count("__h").alias("n"), F.bit_xor("__h"))
            .collect()[0]["n"])


def _ticks():
    parts = open("/proc/stat").readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + vals[4]
    return vals[7], sum(vals), idle


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("ab_ivfpq_fused_r16")
    engine = Engine(from_materialized(spark, SF_DIR))
    embs = engine.cat.raw["embeddings"]

    from metacat_spark.llm import similarity as SIM

    tmp = tempfile.mkdtemp(prefix="ab_ivfpq_")
    try:
        idx = SIM.build_ivfpq_index(embs, n_lists=16, m=8,
                                    n_codes=16, train_iters=1)
        idx.write.parquet(f"{tmp}/ivfpq_idx")
        SIM.encode_ivfpq(embs, spark.read.parquet(
            f"{tmp}/ivfpq_idx")).write.parquet(f"{tmp}/postings")
        ivf_idx = spark.read.parquet(f"{tmp}/ivfpq_idx")
        postings = spark.read.parquet(f"{tmp}/postings")

        warm = F.pandas_udf(lambda s: s, "long").asNondeterministic()
        par = spark.sparkContext.defaultParallelism
        (embs.select("vec_id").repartition(par)
         .select(warm(F.col("vec_id")).alias("v"))
         .agg(F.sum("v")).collect())

        def serve(fused):
            return _consume(SIM.ivf_pq_search(
                embs, postings, ivf_idx, k=3, n_probe=4,
                bounded_queries=fused))

        # warm both shapes once
        serve(False)
        serve(True)
        old, new, steals = [], [], []
        for i in range(pairs):
            for fused, sink in ((False, old), (True, new)):
                s0, t0, i0 = _ticks()
                spark.sparkContext.setJobDescription(
                    f"ivfpq_serve fused={fused} #{i}")
                t = time.time()
                serve(fused)
                sink.append(round(time.time() - t, 4))
                s1, t1, i1 = _ticks()
                busy = max(1, (t1 - t0) - (i1 - i0))
                steals.append(round(100.0 * (s1 - s0) / busy, 2))
        old_m = sorted(old)[len(old) // 2]
        new_m = sorted(new)[len(new) // 2]
        print(f"two-stage: median {old_m} runs {old}")
        print(f"fused:     median {new_m} runs {new}")
        print(f"per-serve steal%: {steals}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
