#!/usr/bin/env python3
"""Round-15 INTERLEAVED A/B of the text-index serve shapes.

tools/probe_text_serve_r15.py times the old shape LAST, after every
cache is warm — an ordering bias that can flatter it.  This probe
warms BOTH shapes, then alternates new/old pairs so each sample of
each shape sees the same host window, and prints per-shape medians.

Usage: python tools/probe_text_serve_ab_r15.py [pairs=8]
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
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("text_serve_ab_r15")
    engine = Engine(from_materialized(spark, SF_DIR))
    docs = engine.cat.raw["documents"]

    from metacat_spark.llm import search as SR
    from pyspark.sql import Window as W

    tmp = tempfile.mkdtemp(prefix="text_serve_ab_")
    try:
        SR.build_text_index(docs).write.parquet(f"{tmp}/text_idx")
        text_idx = spark.read.parquet(f"{tmp}/text_idx")
        terms = ["spark", "window", "merge"]

        def new_shape():
            return SR.search_text_index(text_idx, terms, k=10)

        def old_shape():
            # pre-r15 reconstruction: separate stats collect + df
            # broadcast-pivot subquery (crossJoin) feeding the main
            # job — identical to probe_text_serve_r15.old_shape
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

        # warm BOTH shapes twice before any timed sample
        for _ in range(2):
            _consume(new_shape())
            _consume(old_shape())

        news, olds = [], []
        for i in range(pairs):
            spark.sparkContext.setJobDescription(f"ab new {i}")
            t = time.time(); _consume(new_shape())
            news.append(round(time.time() - t, 4))
            spark.sparkContext.setJobDescription(f"ab old {i}")
            t = time.time(); _consume(old_shape())
            olds.append(round(time.time() - t, 4))
        news_s, olds_s = sorted(news), sorted(olds)
        print(f"new: median {news_s[len(news_s) // 2]} runs {news}")
        print(f"old: median {olds_s[len(olds_s) // 2]} runs {olds}")
        assert sorted(new_shape().collect()) == \
            sorted(old_shape().collect()), "old/new rows differ!"
        print("old==new rows: OK")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
