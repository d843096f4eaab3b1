#!/usr/bin/env python3
"""Round-15 A/B probes (interleaved, noop sink, medians):

q3: the minus right side is duplicated by Catalyst's
    PushDownLeftSemiAntiJoin (anti pushed below the union copies the
    right subtree per branch). Variant B materializes the right id
    set once with a lazy localCheckpoint.

q8: _lsh_candidate_verify joins the n_sh sizes table back onto the
    verified pairs TWICE (two extra joins + broadcasts). Variant B
    carries n_sh through the band explode so the candidate pairs
    already hold (n_a, n_b) — n_sh is functionally dependent on id,
    so dropDuplicates(id_a, id_b) keeps exact values.

Usage: python tools/ab_r15_q3_q8.py [q3|q8] [runs=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from metacat_spark.catalog import from_materialized  # noqa: E402
from metacat_spark.engine import Engine  # noqa: E402
from metacat_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
Q3 = ("union(files from dune:urgent_0, files from dune:urgent_1) "
      "- files from mc:flag_r where core.good = true")


def q3_variant_b(engine):
    """Same id-set fast path, right side checkpointed once."""
    from metacat_spark.mql import parse
    top = parse(Q3)
    node = top.tree
    left_ids = engine._bfq_ids(node.left)
    right_ids = engine._bfq_ids(node.right).localCheckpoint(eager=False)
    ids = left_ids.join(right_ids, "id", "left_anti")
    out = engine.cat.files.where(~F.col("retired"))
    return out.join(ids, "id", "left_semi").select(
        "id", "namespace", "name", "size", "creator",
        "created_timestamp", "retired")


def q8_variant_b(docs, n=2, k=32, bands=8, threshold=0.5):
    from metacat_spark.llm.dedup import (_lcg_params,
                                         hashed_shingle_rows)
    from metacat_spark.llm.text import POLY_MOD
    shr = (hashed_shingle_rows(docs, n, "text", "doc_id")
           .localCheckpoint(eager=False))
    ex0 = shr.withColumn("h", F.pmod(F.col("h64"), F.lit(POLY_MOD)))
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % POLY_MOD)
            .alias(f"mh_{i}")
            for i, (a, b) in enumerate(_lcg_params(k))]
    sig = (ex0.groupBy("id").agg(F.count("*").alias("n_sh"), *aggs)
           .localCheckpoint(eager=False))
    rows = k // bands
    band_keys = [F.xxhash64(F.lit(bi),
                            *[F.col(f"mh_{bi * rows + r}")
                              for r in range(rows)])
                 for bi in range(bands)]
    exploded = sig.select(
        "id", "n_sh", F.explode(F.array(*band_keys)).alias("bk"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("a.n_sh").alias("n_a"),
                    F.col("b.n_sh").alias("n_b"))
            .dropDuplicates(["id_a", "id_b"]))
    inter = (cand
             .join(shr.select(F.col("id").alias("id_a"), "h64"),
                   "id_a")
             .join(shr.select(F.col("id").alias("id_b"), "h64"),
                   ["id_b", "h64"])
             .groupBy("id_a", "id_b", "n_a", "n_b")
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .withColumn("jaccard",
                        F.round(F.col("n_inter")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab_r15")
    engine = Engine(from_materialized(spark, SF_DIR))
    docs = engine.cat.raw["documents"]
    engine.query("files from dune:urgent_0 limit 1").collect()
    engine._file_ids_unique()
    warm = F.pandas_udf(lambda s: s, "long").asNondeterministic()
    par = spark.sparkContext.defaultParallelism
    (engine.cat.files.select("id").repartition(par)
     .select(warm(F.length("id")).alias("v"))
     .agg(F.sum("v")).collect())

    from metacat_spark.llm.dedup import minhash_lsh_pairs

    cases = {}
    if which in ("q3", "both"):
        cases["q3_A_current"] = lambda: noop(engine.query(Q3))
        cases["q3_B_ckpt_right"] = lambda: noop(q3_variant_b(engine))
    if which in ("q8", "both"):
        cases["q8_A_current"] = lambda: noop(minhash_lsh_pairs(
            docs, n=2, k=32, bands=8, threshold=0.5))
        cases["q8_B_carry_nsh"] = lambda: noop(q8_variant_b(docs))

    # correctness cross-check first (collect both, compare sets)
    if which in ("q3", "both"):
        a = {tuple(r) for r in engine.query(Q3).collect()}
        bb = {tuple(r) for r in q3_variant_b(engine).collect()}
        print(f"# q3 rows A={len(a)} B={len(bb)} equal={a == bb}",
              file=sys.stderr)
        assert a == bb
    if which in ("q8", "both"):
        a = {tuple(r) for r in minhash_lsh_pairs(
            docs, n=2, k=32, bands=8, threshold=0.5).collect()}
        bb = {tuple(r) for r in q8_variant_b(docs).collect()}
        print(f"# q8 rows A={len(a)} B={len(bb)} equal={a == bb}",
              file=sys.stderr)
        assert a == bb

    res = {name: [] for name in cases}
    for i in range(runs):
        for name, fn in cases.items():
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t = time.time()
            fn()
            dt = round(time.time() - t, 4)
            res[name].append(dt)
            print(f"# {name} run{i}: {dt}", file=sys.stderr)
    for name, vals in res.items():
        med = sorted(vals)[len(vals) // 2]
        print(f"{name}: median {med} runs {vals}")
    spark.stop()


if __name__ == "__main__":
    main()
