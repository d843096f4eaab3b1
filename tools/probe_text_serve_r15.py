#!/usr/bin/env python3
"""Round-15 probe: where does the text_index_serve wall go?

Times, on the bench-identical stored artifact:
  (a) the stats collect job alone (_decode_text_index_stats),
  (b) the df-pivot broadcast subquery alone,
  (c) the full serve (stats + main job),
  (d) the main job alone with stats pre-collected,
so the sequential-driver-job share of the serve constant is
attributable before restructuring (guide §1: measure first).

Usage: python tools/probe_text_serve_r15.py [runs=5]
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
    spark = get_spark("text_serve_probe_r15")
    engine = Engine(from_materialized(spark, SF_DIR))
    docs = engine.cat.raw["documents"]

    from metacat_spark.llm import search as SR

    tmp = tempfile.mkdtemp(prefix="text_serve_prof_")
    try:
        SR.build_text_index(docs).write.parquet(f"{tmp}/text_idx")
        text_idx = spark.read.parquet(f"{tmp}/text_idx")
        terms = ["spark", "window", "merge"]

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

        # warm one serve so codegen/scan caches are hot
        _consume(SR.search_text_index(text_idx, terms, k=10))

        timed("stats_collect_only",
              lambda: SR._decode_text_index_stats(text_idx))
        timed("df_rows_collect_only", lambda: (
            text_idx.where((F.col("kind") == "df")
                           & F.col("term").isin(terms))
            .groupBy("term").agg(F.sum("tf")).collect()))
        timed("full_serve", lambda: _consume(
            SR.search_text_index(text_idx, terms, k=10)))
        timed("many_serve_1q", lambda: _consume(
            SR.search_text_index_many(text_idx, [("q", terms)], k=10)))

        # pre-r15 shape, reconstructed: separate stats collect, then
        # a main job whose df values come from a broadcast pivot
        # subquery (crossJoin) — the two extra sequential driver jobs
        # the one-collect redesign removed. Timed here so before vs
        # after share one measurement window.
        from pyspark.sql import Window as W

        def old_shape():
            st = SR._decode_text_index_stats(text_idx)

            def esc(name):
                return "`" + name.replace("`", "``") + "`"

            post = (text_idx.where((F.col("kind") == "post")
                                   & F.col("term").isin(terms))
                    .select("term", F.col("id").alias("__qid"), "tf",
                            F.col("dl").alias("dl")))
            pivoted = (post.groupBy("__qid").pivot("term", terms)
                       .agg(F.first("tf").alias("tf"),
                            F.first("dl").alias("dl")))
            dfp = (text_idx.where((F.col("kind") == "df")
                                  & F.col("term").isin(terms))
                   .groupBy().pivot("term", terms).agg(F.sum("tf")))
            dfcols = [F.coalesce(F.col(esc(t)), F.lit(0.0))
                      .alias(f"__df{i}") for i, t in enumerate(terms)]
            staged = (pivoted.select(
                "__qid",
                F.coalesce(*[F.col(esc(f"{t}_dl")) for t in terms])
                .alias("__dl"),
                *[F.coalesce(F.col(esc(f"{t}_tf")), F.lit(0.0))
                  .alias(f"__tf{i}") for i, t in enumerate(terms)])
                .crossJoin(F.broadcast(dfp.select(*dfcols))))
            score = SR._score_expr(
                len(terms), F.lit(float(st["n"])),
                F.try_divide(F.lit(float(st["sum_dl"])),
                             F.lit(float(st["n_dl"]))),
                [F.col(f"__df{i}") for i in range(len(terms))],
                1.2, 0.75)
            scored = staged.select(
                F.col("__qid").alias("doc_id"),
                F.col("__dl").cast("long").alias("n_tokens"),
                F.round(score, 6).alias("score"))
            top = (scored.where(F.col("score") > 0)
                   .orderBy(F.col("score").desc(), F.col("doc_id"))
                   .limit(10))
            w = W.orderBy(F.col("score").desc(), F.col("doc_id"))
            return top.withColumn("rank", F.row_number().over(w))

        timed("full_serve_old_shape", lambda: _consume(old_shape()))

        # equivalence spot-check: old and new shapes byte-equal
        new_rows = sorted(
            SR.search_text_index(text_idx, terms, k=10).collect())
        old_rows = sorted(old_shape().collect())
        assert new_rows == old_rows, "old/new serve rows differ!"
        print(f"old==new rows: OK ({len(new_rows)} rows)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
