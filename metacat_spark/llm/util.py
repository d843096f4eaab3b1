"""Shared plan-shape helpers for the llm package."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Small document tables often arrive as ONE parquet file = one
    partition; per-row expressions would then run single-threaded.
    Spread ONLY when under-partitioned — unconditional repartition
    would full-shuffle the raw text of a well-partitioned 100 TB
    input down to defaultParallelism partitions (review r6). No-op
    on streaming DataFrames (no static partitioning to inspect)."""
    if df.isStreaming:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def hadoop_glob_escape(name: str) -> str:
    """Escape a literal file name for Hadoop glob contexts (path
    globs and pathGlobFilter). Hadoop's GlobPattern only supports
    BACKSLASH escaping — Python's glob.escape emits `[x]` character
    classes, which GlobPattern rejects as an unclosed class
    (review r9). Specials: * ? [ ] { } , and backslash itself."""
    import re

    return re.sub(r"([\\\[\]{}*?,])", r"\\\1", name)
