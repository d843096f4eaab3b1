#!/usr/bin/env python3
"""r16 probe: the fused (single-Python-stage) ivf_pq_search must be
row-identical to the two-stage shape on every SF, for both the
self-search and external-query postures, rerank on and off."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from metacat_spark.session import get_spark
from metacat_spark.llm import similarity as SIM

spark = get_spark("probe_ivfpq_fused")
spark.sparkContext.setLogLevel("WARN")

for sf in ("0.001", "0.01", "0.1"):
    embs = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
    idx = SIM.build_ivfpq_index(embs, n_lists=16, m=8, n_codes=16,
                                train_iters=1)
    idx = idx.localCheckpoint()
    posts = SIM.encode_ivfpq(embs, idx).localCheckpoint()
    for rerank in (True, False):
        a = SIM.ivf_pq_search(embs, posts, idx, k=3, n_probe=4,
                              rerank=rerank, bounded_queries=False)
        b = SIM.ivf_pq_search(embs, posts, idx, k=3, n_probe=4,
                              rerank=rerank, bounded_queries=True)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb, (
            f"sf{sf} rerank={rerank}: MISMATCH "
            f"{len(ra)} vs {len(rb)} rows; first diff: "
            f"{next((x for x, y in zip(ra, rb) if x != y), None)}")
        print(f"sf{sf} rerank={rerank}: fused == two-stage "
              f"({len(ra)} rows)")
    # external one-row query (the hybrid serve posture)
    qv = [float(x) for x in embs.first()["embedding"]]
    qdf = spark.createDataFrame([(999999, qv)],
                                "vec_id bigint, embedding array<double>")
    a = SIM.ivf_pq_search(qdf, posts, idx, k=5, n_probe=8,
                          exclude_self=False, bounded_queries=False)
    b = SIM.ivf_pq_search(qdf, posts, idx, k=5, n_probe=8,
                          exclude_self=False, bounded_queries=True)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, f"sf{sf} one-row: MISMATCH"
    print(f"sf{sf} one-row external query: fused == two-stage "
          f"({len(ra)} rows)")

# auto-gate sanity: parquet-backed small frame should fuse (no
# ArrowEvalPython/MapInPandas assignment stage in the plan)
embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
idx = SIM.build_ivfpq_index(embs, n_lists=16, m=8, n_codes=16,
                            train_iters=1).localCheckpoint()
posts = SIM.encode_ivfpq(embs, idx).localCheckpoint()
plan = SIM.ivf_pq_search(embs, posts, idx, k=3, n_probe=4) \
    ._jdf.queryExecution().executedPlan().toString()
n_py = plan.count("MapInPandas")
print(f"auto-gated plan MapInPandas nodes: {n_py} (want 0 — "
      f"assignment fused into FlatMapGroupsInPandas)")
assert n_py == 0, plan
print("ALL GREEN")
spark.stop()
