"""Continuous catalog ingest — the streaming twin of bulk declare.

The reference's webserver receives declare requests continuously for
as long as it runs (data_handler.py:631-760 handles each POST as it
arrives). This module gives the Spark catalog the same shape:
``declare_stream`` watches a directory for JSON-lines declare batches
(one file = one producer batch, one JSON object per line, the exact
dict schema ``DML.declare_files`` takes) and applies each micro-batch
through the SAME DML path — validation rules, PK enforcement,
shredding, provenance edges, frozen/monotonic checks, and (with a
DurableStore) one durable commit per applied batch.

Delivery semantics: Structured Streaming's file source is
at-least-once into ``foreachBatch``; the catalog's PK on file id
turns redelivery into idempotence — a batch ALL of whose ids are
already declared is skipped whole, counted in the returned stats. A
batch where only SOME ids pre-exist is a producer error and FAILS
the query (skipping it would silently lose its new rows — verified
by re-checking the id set before treating AlreadyExists as a
redelivery). Malformed or validation-failing batches fail loudly too
(a silent drop would un-declare data someone believes is catalogued).

Producer contract: batch files must be MOVED into ``src_dir``
complete (write to a temp name elsewhere, rename in — the standard
file-source handoff). The source lists a path once; a file read
while still being appended would be permanently half-ingested, and
no error can detect a valid-prefix read.

Scale shape: declare batches are control-plane rows (the reference's
JSON POST bodies); each micro-batch is collected to the driver for
the same reason the reference parses the request body there —
validation is a per-row Python rule engine over dicts. The DATA plane
(the files' contents) never flows here, only metadata records.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..dml import DML, AlreadyExists


def _rows_of(batch_df) -> list[dict]:
    # one JSON document per line; read as text so ONE schema covers
    # every metadata shape (declare dicts are schema-free by design)
    rows = []
    for r in batch_df.select("value").collect():
        line = (r["value"] or "").strip()
        if not line:
            continue
        rows.append(json.loads(line))
    return rows


def declare_stream(spark: SparkSession, dml: DML, src_dir: str,
                   dataset: Optional[tuple] = None,
                   timeout_s: Optional[int] = None,
                   dead_letter_dir: Optional[str] = None) -> dict:
    """Consume every pending declare-batch file under ``src_dir``
    (availableNow trigger — the batch-bounded run used by tests and
    cron-style ingest; a resident service would use the default
    continuous trigger) and apply each micro-batch through
    ``dml.declare_files``. Returns {"declared": n, "skipped_dup": m,
    "batches": k} (plus dead-letter counters when enabled).

    A redelivered batch (at-least-once file source, or a producer
    retrying an upload) skips whole ONLY when every id in it already
    exists — verified explicitly, because declare_files raises the
    same AlreadyExists for a partial overlap, and skipping a mixed
    batch would silently lose its new rows (review r8). ``timeout_s``
    defaults to 5 s per pending batch file (min 120 s) so a large
    backlog making steady progress is never killed mid-drain.

    Failure policy: by DEFAULT a malformed or validation-failing
    batch fails the whole query — correct for catalog integrity (a
    silent drop would un-declare data someone believes is
    catalogued). A long-running service can instead pass
    ``dead_letter_dir``: the failing batch's source file is MOVED
    there (one file per micro-batch by construction), recorded in
    the returned stats (``dead_lettered`` batches,
    ``dead_letter_files`` names, ``dead_letter_errors`` first lines),
    and the drain continues. Nothing from a quarantined batch is
    applied — declare_files runs all validations before its first
    mutation, and the partial-overlap re-raise fires before any skip.
    To re-submit after fixing, move the file back under a NEW name
    (the file source remembers processed paths, so the original name
    would be ignored)."""
    stats = {"declared": 0, "skipped_dup": 0, "batches": 0}
    if dead_letter_dir is not None:
        stats.update({"dead_lettered": 0, "dead_letter_files": [],
                      "dead_letter_errors": []})

    def _apply(rows):
        if not rows:
            return
        try:
            stats["declared"] += dml.declare_files(rows,
                                                   dataset=dataset)
        except AlreadyExists:
            ids = [r["id"] for r in rows]
            if len(set(ids)) != len(ids):
                raise          # intra-batch dup: producer error
            found = dml.cat.files.where(
                F.col("id").isin(ids)).select("id").count()
            if found != len(ids):
                # partial overlap: NOT a redelivery — some rows are
                # new and skipping would lose them permanently
                raise
            stats["skipped_dup"] += len(rows)

    def _quarantine(srcs: list[str]) -> tuple[list[str], list[str]]:
        """Move the batch's source file(s) into dead_letter_dir via
        the Hadoop FS (uniform for file:// and remote URIs). Rename
        can legally FAIL — cross-filesystem/cross-device targets,
        permissions — so it falls back to copy+delete, and a file
        that still couldn't be moved is reported in the second list
        instead of being claimed quarantined (review r9: the
        streaming checkpoint marks it processed either way, so a
        silent move failure would drop it from BOTH ledgers)."""
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        moved, failed = [], []
        for src in srcs:
            name = src.rsplit("/", 1)[-1]
            try:
                sp = jvm.org.apache.hadoop.fs.Path(src)
                sfs = sp.getFileSystem(conf)
                dl = jvm.org.apache.hadoop.fs.Path(dead_letter_dir)
                dfs = dl.getFileSystem(conf)
                dfs.mkdirs(dl)
                dest = jvm.org.apache.hadoop.fs.Path(
                    dead_letter_dir, name)
                if dfs.exists(dest):
                    import uuid as _uuid
                    dest = jvm.org.apache.hadoop.fs.Path(
                        dead_letter_dir,
                        f"{name}.{_uuid.uuid4().hex[:8]}")
                if sfs.rename(sp, dest):
                    moved.append(name)
                    continue
                # cross-FS / cross-device: copy bytes, then delete
                util = jvm.org.apache.hadoop.fs.FileUtil
                if util.copy(sfs, sp, dfs, dest, True, conf):
                    moved.append(name)
                else:
                    failed.append(name)
            except Exception:  # noqa: BLE001 — report, keep draining
                failed.append(name)
        return moved, failed

    def apply_batch(batch_df, _batch_id):
        if dead_letter_dir is None:
            rows = _rows_of(batch_df)
            if rows:
                stats["batches"] += 1
                _apply(rows)
            return
        recs = batch_df.select(
            "value", F.input_file_name().alias("src")).collect()
        srcs = sorted({r["src"] for r in recs})
        lines = [ln for r in recs
                 if (ln := (r["value"] or "").strip())]
        if lines:
            # count the batch whether it applies or quarantines, so
            # batches == applied + skipped-whole + dead_lettered
            # (review r9: malformed batches were uncounted)
            stats["batches"] += 1
        rows = None
        try:
            rows = [json.loads(ln) for ln in lines]
            _apply(rows)
        except Exception as e:  # noqa: BLE001 — quarantine, continue
            if rows:
                ids = [r.get("id") for r in rows]
                n_in = dml.cat.files.where(
                    F.col("id").isin(ids)).select("id").count()
                if n_in == len(ids):
                    # every row IS in the catalog: the batch applied
                    # and something AFTER it failed (e.g. the durable
                    # commit — dml re-buffers those ops for the next
                    # flush). Quarantining would falsely ledger an
                    # applied batch as rejected; this is an
                    # operational failure, not a bad batch — fail
                    # loud (review r9).
                    raise
            stats["dead_lettered"] += 1
            moved, failed = _quarantine(srcs)
            stats["dead_letter_files"].extend(moved)
            if failed:
                stats.setdefault(
                    "dead_letter_move_failed", []).extend(failed)
            stats["dead_letter_errors"].append(
                f"{type(e).__name__}: {e}"[:200])

    if timeout_s is None:
        # count pending batch files so the default scales with the
        # backlog; URI dirs (hdfs://, s3a://) go through the Hadoop
        # FS — os.listdir raises there, which used to pin every
        # remote backlog at the flat 120 s floor (ADVICE r8)
        try:
            if "://" in src_dir:
                jvm = spark._jvm
                p = jvm.org.apache.hadoop.fs.Path(src_dir)
                fs = p.getFileSystem(
                    spark._jsc.hadoopConfiguration())
                names = ([s.getPath().getName()
                          for s in fs.listStatus(p)]
                         if fs.exists(p) else [])
            else:
                import os
                names = os.listdir(src_dir)
            pending = sum(1 for n in names
                          if not n.startswith(("_", ".")))
        except Exception:
            pending = 0
        timeout_s = max(120, 5 * pending)
    stream = (spark.readStream.format("text")
              # one batch FILE per trigger: a declare batch is the
              # atomicity unit (PK skip is whole-batch), so two
              # producers' files must not merge into one micro-batch
              .option("maxFilesPerTrigger", 1)
              .load(src_dir))
    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", src_dir.rstrip("/")
                 + "/_ingest_checkpoint")
         .trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"declare_stream did not drain {src_dir} within "
            f"{timeout_s}s (applied so far, durably committed: "
            f"{stats})")
    return stats
