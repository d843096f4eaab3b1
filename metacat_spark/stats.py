"""Denormalized statistics — parity with the reference's
daemon-maintained file counts (daemon/daemon.py:43-60;
`nfiles` exact-vs-cached, dbobjects2.py:1345-1359).

The reference refreshes counts hourly because inline counting was too
slow for PostgreSQL; here a refresh is one distributed groupBy, and
the cached table is just a small DataFrame the caller can persist on
whatever cadence it likes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Catalog


class CatalogStats:
    def __init__(self, catalog: Catalog):
        self.cat = catalog
        self._dataset_counts: Optional[DataFrame] = None
        self._namespace_counts: Optional[DataFrame] = None

    # ------------------------------------------------------------ refresh
    def refresh(self) -> None:
        """One pass over membership + files; results cached in memory
        (the daemon-refresh equivalent)."""
        # release the previous refresh's cached blocks: a long-lived
        # server refreshing on a cadence would otherwise leak two
        # persisted DataFrames per cycle (review r6)
        for old in (getattr(self, "_dataset_counts", None),
                    getattr(self, "_namespace_counts", None)):
            if old is not None:
                old.unpersist()
        fd = self.cat.files_datasets
        active = self.cat.files.where(~F.col("retired")).select("id")
        counted = fd.join(active.withColumnRenamed("id", "file_id"),
                          "file_id", "left_semi")
        self._dataset_counts = (counted
                                .groupBy("dataset_namespace",
                                         "dataset_name")
                                .agg(F.count("*").alias("file_count"))
                                .persist())
        self._dataset_counts.count()
        self._namespace_counts = (self.cat.files
                                  .where(~F.col("retired"))
                                  .groupBy("namespace")
                                  .agg(F.count("*").alias("file_count"),
                                       F.sum("size").alias("total_size"))
                                  .persist())
        self._namespace_counts.count()

    # ------------------------------------------------------------- access
    def namespace_file_counts(self) -> DataFrame:
        """Per-namespace active file count + total size (the cached
        twin of the reference's namespace statistics)."""
        if self._namespace_counts is None:
            self.refresh()
        return self._namespace_counts

    def dataset_file_counts(self) -> DataFrame:
        if self._dataset_counts is None:
            self.refresh()
        return self._dataset_counts

    def nfiles(self, namespace: str, name: str,
               exact: bool = False) -> int:
        """exact=True recounts (reference: exact count(*)); False reads
        the cached stats (reference: stored file_count column)."""
        if exact or self._dataset_counts is None:
            fd = self.cat.files_datasets.where(
                (F.col("dataset_namespace") == namespace)
                & (F.col("dataset_name") == name))
            active = self.cat.files.where(~F.col("retired")) \
                .select(F.col("id").alias("file_id"))
            return fd.join(active, "file_id", "left_semi").count()
        rows = (self._dataset_counts
                .where((F.col("dataset_namespace") == namespace)
                       & (F.col("dataset_name") == name))
                .collect())
        return rows[0]["file_count"] if rows else 0
