#!/usr/bin/env python3
"""Round-15 served-path profiler (VERDICT r14 #2): replicate the
bench's served setup exactly, then time each serve and the internal
components of the IVF-PQ serve so the ~1s constant is attributable.

Usage: python tools/profile_serve_r15.py [runs=5]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("serve_profile_r15")
    engine = Engine(from_materialized(spark, SF_DIR))
    docs = engine.cat.raw["documents"]
    embs = engine.cat.raw["embeddings"]

    from metacat_spark.llm import search as SR
    from metacat_spark.llm import similarity as SIM

    tmp = tempfile.mkdtemp(prefix="serve_prof_")
    try:
        SR.build_text_index(docs).write.parquet(f"{tmp}/text_idx")
        idx = SIM.build_ivfpq_index(embs, n_lists=16, m=8,
                                    n_codes=16, train_iters=1)
        idx.write.parquet(f"{tmp}/ivfpq_idx")
        SIM.encode_ivfpq(embs, spark.read.parquet(
            f"{tmp}/ivfpq_idx")).write.parquet(f"{tmp}/postings")
        SIM.build_ivf_centroids(embs, n_lists=16, train_iters=1) \
            .write.parquet(f"{tmp}/cents")
        text_idx = spark.read.parquet(f"{tmp}/text_idx")
        ivf_idx = spark.read.parquet(f"{tmp}/ivfpq_idx")
        postings = spark.read.parquet(f"{tmp}/postings")
        cents = spark.read.parquet(f"{tmp}/cents")

        # warm the Arrow workers like the bench does
        warm = F.pandas_udf(lambda s: s, "long").asNondeterministic()
        par = spark.sparkContext.defaultParallelism
        (embs.select("vec_id").repartition(par)
         .select(warm(F.col("vec_id")).alias("v"))
         .agg(F.sum("v")).collect())

        def timed(name, fn):
            vals = []
            for i in range(runs):
                spark.sparkContext.setJobDescription(f"{name} {i}")
                t = time.time()
                fn()
                vals.append(round(time.time() - t, 4))
            med = sorted(vals)[len(vals) // 2]
            print(f"{name}: median {med} runs {vals}")
            return med

        # the three serves, bench-identical
        timed("text_index_serve", lambda: _consume(
            SR.search_text_index(text_idx,
                                 ["spark", "window", "merge"], k=10)))
        timed("cluster_sample_serve", lambda: _consume(
            SIM.cluster_balanced_sample(embs, per_cluster=20,
                                        centroids=cents)))
        timed("ivfpq_serve_full", lambda: _consume(SIM.ivf_pq_search(
            embs, postings, ivf_idx, k=3, n_probe=4)))

        # component breakdown of the ivfpq serve
        timed("ivfpq_decode_index",
              lambda: SIM._decode_ivfpq_index(ivf_idx))
        timed("ivfpq_live_postings_noop",
              lambda: SIM.live_postings(postings)
              .write.format("noop").mode("overwrite").save())

        def qassign_only():
            Cn, CB, Rt = SIM._decode_ivfpq_index(ivf_idx)
            # replicate the query-assignment Arrow pass alone
            df = SIM.ivf_pq_search(
                embs, postings, ivf_idx, k=3, n_probe=4)
            return df

        # plan-build-only (no execution): how much is driver latency?
        timed("ivfpq_plan_build", qassign_only)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
