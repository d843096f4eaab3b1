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


def stream_parquet(spark, src_dir: str,
                   max_files_per_trigger: int | None = None):
    """The shared file-stream source for every *_stream twin: batch
    schema inference + readStream over a directory, with single-FILE
    sources handled by glob-escaping the basename (Hadoop GlobPattern
    backslash escaping — review r9) in BOTH the schema read and the
    pathGlobFilter. One implementation so reader-level fixes land
    once, not five times (review r9c)."""
    import os

    is_file = os.path.isfile(src_dir)
    schema_src = src_dir
    if is_file:
        schema_src = os.path.join(
            os.path.dirname(src_dir),
            hadoop_glob_escape(os.path.basename(src_dir)))
    batch_schema = spark.read.parquet(schema_src).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               max_files_per_trigger)
    if is_file:
        reader = reader.option(
            "pathGlobFilter",
            hadoop_glob_escape(os.path.basename(src_dir)))
        src_dir = os.path.dirname(src_dir)
    return reader.parquet(src_dir)
