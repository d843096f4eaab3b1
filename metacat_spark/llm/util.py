"""Shared plan-shape helpers for the llm package."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# source bytes per task for the per-row-Python families (text decode,
# tokenize, shingle): small on purpose — per-row pure-Python work is
# ms/row, so anything past a few dozen rows per task beats the ~0.26 s
# fixed task cost and the spread should saturate the cores quickly.
# 16 KB keeps a sub-MB corpus at the full defaultParallelism fan-out
# (the r15-audited posture) while a trivially small table (a 10-asset
# decode probe) stops paying 32 task round-trips (VERDICT r15 #5).
_TEXT_TASK_BYTES = int(os.environ.get("SPARK_GRAFT_TEXT_TASK_BYTES",
                                      str(16 << 10)))


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df`` in bytes, or None when
    unknown (LogicalRDD/unknown-stats plans report the Long.MaxValue
    sentinel; the private-API read can also fail on a PySpark bump —
    pinned by test so a silent loss of adaptivity fails loudly)."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — private API; treat as unknown
        return None
    return est if 0 <= est < (1 << 62) else None


def spread(df: DataFrame) -> DataFrame:
    """Small document tables often arrive as ONE parquet file = one
    partition; per-row expressions would then run single-threaded.
    Spread ONLY when under-partitioned — unconditional repartition
    would full-shuffle the raw text of a well-partitioned 100 TB
    input down to defaultParallelism partitions (review r6). No-op
    on streaming DataFrames (no static partitioning to inspect).

    r16 (VERDICT r15 #5): the target count is BYTES-DERIVED
    (~_TEXT_TASK_BYTES of source bytes per task, floor 2) instead of
    a flat defaultParallelism — per-row Python work dominates in
    these families, so the unit is small and any real corpus still
    gets the full fan-out; only trivially small tables stop paying
    defaultParallelism task round-trips. Unknown-size plans (local
    frames) keep the full spread — an unknown corpus must never
    funnel into too few tasks."""
    if df.isStreaming:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    n = par
    est = plan_size_bytes(df)
    if est is not None:
        n = min(par, max(min(2, par), -(-est // _TEXT_TASK_BYTES)))
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def hadoop_glob_escape(name: str) -> str:
    """Escape a literal file name for Hadoop glob contexts (path
    globs and pathGlobFilter). Hadoop's GlobPattern only supports
    BACKSLASH escaping — Python's glob.escape emits `[x]` character
    classes, which GlobPattern rejects as an unclosed class
    (review r9). Specials: * ? [ ] { } , and backslash itself."""
    import re

    return re.sub(r"([\\\[\]{}*?,])", r"\\\1", name)


def drain_to_parquet(spark, out, sink_dir: str, gauge_aggs,
                     gauge_schema: str, checkpoint_dir: str | None = None,
                     timeout_s: int | None = 120,
                     what: str = "stream"):
    """The production sink shared by the per-doc *_stream twins
    (VERDICT r11 #1 — the ``encode_ivfpq_stream`` pattern): each
    micro-batch of the transformed stream ``out`` is parquet-APPENDED
    to ``sink_dir`` and reduced to ONE bounded gauge row
    (``gauge_aggs`` — e.g. counts and score aggregates), so driver
    state is O(batches), never O(documents). Returns the gauge table
    ``batch_id`` + the agg columns; the per-doc rows live in
    ``sink_dir`` (read them back with ``spark.read.parquet``).

    ``checkpoint_dir`` (default ``sink_dir + "__checkpoint"``) makes
    restarts resume after the last committed batch. foreachBatch is
    at-least-once: a crash BETWEEN the parquet append and the
    checkpoint commit re-appends that batch on restart — dedupe on
    the id column downstream if exactly-once matters. ``timeout_s``
    bounds the drain (None = wait indefinitely, the production
    posture for a corpus-sized stream); on expiry the query stops
    and a restart resumes from the checkpoint."""
    gauge_rows: list = []

    def per_batch(bdf, bid):
        bdf.write.mode("append").parquet(sink_dir)
        r = bdf.agg(*gauge_aggs).collect()[0]
        gauge_rows.append((int(bid),) + tuple(r))

    q = (out.writeStream.foreachBatch(per_batch)
         .option("checkpointLocation",
                 checkpoint_dir or sink_dir + "__checkpoint")
         .trigger(availableNow=True).start())
    if timeout_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"{what} did not finish within {timeout_s}s — the sink "
            f"may be partially written; restart resumes from the "
            f"checkpoint")
    return spark.createDataFrame(gauge_rows,
                                 "batch_id long, " + gauge_schema)


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
