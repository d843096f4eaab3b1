#!/usr/bin/env python3
"""Stage-level attribution for the served paths (r15): run each serve
in its own job group with the UI enabled, then read per-stage wall
and executor times from the REST API so the ~1-2 s serve constants
are attributable to scan / Arrow / shuffle / merge instead of
guessed at. Not part of the suite."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

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


def rest(path):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}",
                                timeout=10) as r:
        return json.loads(r.read())


def main():
    import shutil
    import tempfile

    spark = get_spark("stage_prof_r15", ui=True)
    engine = Engine(from_materialized(spark, SF_DIR))
    docs = engine.cat.raw["documents"]
    embs = engine.cat.raw["embeddings"]

    from metacat_spark.llm import search as SR
    from metacat_spark.llm import similarity as SIM

    tmp = tempfile.mkdtemp(prefix="stage_prof_")
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

        warm = F.pandas_udf(lambda s: s, "long").asNondeterministic()
        par = spark.sparkContext.defaultParallelism
        (embs.select("vec_id").repartition(par)
         .select(warm(F.col("vec_id")).alias("v"))
         .agg(F.sum("v")).collect())

        serves = {
            "text": lambda: _consume(SR.search_text_index(
                text_idx, ["spark", "window", "merge"], k=10)),
            "ivfpq": lambda: _consume(SIM.ivf_pq_search(
                embs, postings, ivf_idx, k=3, n_probe=4)),
            "cluster": lambda: _consume(SIM.cluster_balanced_sample(
                embs, per_cluster=20, centroids=cents)),
        }
        # warm each serve twice, then measure the third run
        appid = rest("/applications")[0]["id"]
        for name, fn in serves.items():
            fn()
            fn()
            before = {s["stageId"] for s in
                      rest(f"/applications/{appid}/stages")}
            t0 = time.time()
            fn()
            wall = time.time() - t0
            stages = [s for s in rest(f"/applications/{appid}/stages")
                      if s["stageId"] not in before
                      and s["status"] == "COMPLETE"]
            stages.sort(key=lambda s: s["stageId"])
            print(f"\n=== {name}: wall {wall:.3f}s, "
                  f"{len(stages)} stages ===")
            tot_exec = 0
            for s in stages:
                dur = s.get("executorRunTime", 0)
                tot_exec += dur
                sub = s.get("submissionTime", "")[-12:-3]
                print(f"  stage {s['stageId']:>4} tasks="
                      f"{s['numCompleteTasks']:>3} "
                      f"execMs={dur:>6} sub={sub} "
                      f"{s['name'][:70]}")
            print(f"  total executorRunTime: {tot_exec} ms "
                  f"(wall {wall * 1000:.0f} ms)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
