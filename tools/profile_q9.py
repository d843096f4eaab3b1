#!/usr/bin/env python3
"""One-off profiler for q9 analyze(): times each output column in
isolation (with the same xxhash64 consumption sink as bench.py) to
find the dominant cost before optimizing. Not part of the suite."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.session import get_spark
from metacat_spark.llm import text as TX

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return (df.select(F.xxhash64(F.struct(*cols)).alias("__h"))
            .agg(F.count("__h"), F.bit_xor("__h")).collect()[0][0])


def main():
    spark = get_spark("profile_q9")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    docs = docs.repartition(par).localCheckpoint()
    n = docs.count()
    print(f"{n} docs, {par} cores")

    c = F.col("text")
    toks = TX.tokens(c)
    variants = {
        "full_analyze": lambda: TX.analyze(docs),
        "n_tokens": lambda: docs.select("doc_id", F.size(toks).alias("v")),
        "bpe": lambda: docs.select(
            "doc_id", TX.bpe_token_count(c).alias("v")),
        "quality": lambda: docs.select(
            "doc_id", TX.quality_score(c).alias("v")),
        "lang_id": lambda: docs.select(
            "doc_id", TX.lang_id(c).alias("v")),
        "poly_hash": lambda: docs.select(
            "doc_id", TX.poly_hash(c).alias("v")),
        "n_chars": lambda: docs.select(
            "doc_id", F.length(c).alias("v")),
    }
    for rep in range(3):
        for name, fn in variants.items():
            t = time.time()
            consume(fn())
            print(f"rep{rep} {name}: {time.time()-t:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
