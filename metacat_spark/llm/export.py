"""Corpus publishing sinks — the last stage of the curation pipeline.

- export_corpus: deterministic hash-sharded parquet/json layout plus a
  manifest.json with corpus- and shard-level accounting (rows, tokens,
  an order-independent content checksum) so a downstream training job
  can verify it received exactly the published corpus.
- to_webdataset: tar-shard export (the WebDataset convention used by
  large-scale training loaders): one `{id}.txt` member per document,
  members sorted by id within a shard, shards assigned by id hash —
  byte-identical output for identical input on any cluster layout.

Both sinks write from executors (one task per shard); only the
manifest aggregation (a few rows per shard) reaches the driver.

Filesystem contract (ADVICE r5): manifest I/O goes through the
HADOOP FileSystem API on the driver (so hdfs:///s3a:// paths resolve
with the cluster's own FS configuration, not a driver-local open());
tar-shard bytes are written from executors through pyarrow.fs
resolved per-URI (executors have no JVM gateway), falling back to
local-file I/O for plain paths. Plain (scheme-less) paths therefore
require a filesystem the task can reach — local mode or a shared
POSIX mount; for object stores pass an explicit URI scheme.
"""

from __future__ import annotations

import json
import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) for a string path via the JVM — resolves
    scheme + credentials from the active Hadoop configuration."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _write_text(spark, path: str, data: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark, path: str) -> str:
    jvm = spark._jvm
    fs, p = _hadoop_fs(spark, path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def _open_shard_output(dest: str):
    """Executor-side byte sink for one tar shard: pyarrow.fs for
    URI-schemed destinations (s3://, hdfs:// with libhdfs, ...),
    plain local file I/O otherwise. No JVM available here."""
    if "://" in dest:
        from pyarrow import fs as pafs
        filesystem, p = pafs.FileSystem.from_uri(dest)
        return filesystem.open_output_stream(p)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    return open(dest, "wb")


def _commit_shard(tmp: str, dest: str):
    """Publish a completed shard under its final name: rename, so a
    task retry or speculative duplicate never exposes a partial file
    at ``dest`` (each attempt writes its own temp name; whichever
    commits last wins with a COMPLETE file). Local rename is atomic;
    pyarrow fs move is atomic on hdfs:// and object-complete on
    object stores."""
    if "://" in dest:
        from pyarrow import fs as pafs
        filesystem, p_dest = pafs.FileSystem.from_uri(dest)
        _, p_tmp = pafs.FileSystem.from_uri(tmp)
        filesystem.move(p_tmp, p_dest)
    else:
        os.replace(tmp, dest)


def _has_data_files(spark, path: str) -> bool:
    """True iff the directory tree at ``path`` contains any file a
    Spark data-source reader would treat as data (ignores _- and
    .-prefixed names like _SUCCESS/_manifest.json). Hadoop FS, so it
    answers for hdfs://, s3a://, and local paths alike."""
    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        return False
    it = fs.listFiles(p, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False


def _with_shard(df: DataFrame, id_col: str, n_shards: int):
    return df.withColumn(
        "__shard",
        F.pmod(F.xxhash64(F.col(id_col).cast("string")),
               F.lit(n_shards)).cast("int"))


def export_corpus(df: DataFrame, path: str, fmt: str = "parquet",
                  n_shards: int = 8, text_col: str = "text",
                  id_col: str = "doc_id") -> dict:
    """Write the corpus hash-sharded (`shard=K/` directories) and a
    `_manifest.json` next to it (underscore so Spark readers skip it). The content checksum is the SUM of
    per-document xxhash64(text) folded into 63 bits — commutative, so
    it is independent of write order/parallelism and a reader can
    recompute it with one aggregation. Returns the manifest dict."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported format: {fmt}")
    sharded = _with_shard(df, id_col, n_shards)
    (sharded.repartition(n_shards, "__shard")
     .write.partitionBy("__shard").mode("overwrite")
     .format(fmt).save(path))
    # manifest stats come from READING BACK the published files, not
    # from re-executing the input's lineage: a second execution of a
    # non-deterministic pipeline (or a source mutated between the two
    # jobs) would publish a manifest describing different data than
    # what was written — and the read-back is one pass instead of two
    # (review r6)
    try:
        written = df.sparkSession.read.format(fmt).load(path)
        per = (written.groupBy("__shard")
               .agg(F.count("*").alias("rows"),
                    F.sum(F.size(tokens(F.col(text_col))))
                    .alias("tokens"),
                    F.pmod(F.sum(F.pmod(F.xxhash64(F.col(text_col)),
                                        F.lit(1 << 62))
                                 .cast("decimal(38,0)")),
                           F.lit(1 << 62)).cast("long")
                    .alias("checksum"))
               .collect())
    except AnalysisException:
        # an EMPTY corpus writes only _SUCCESS — no data files, no
        # inferable schema; publish an honest zero-row manifest
        # instead of dying after the overwrite (review r7). But only
        # when the destination really holds no data files: a read-back
        # that failed for any OTHER analysis-time reason must surface,
        # not publish rows=0 for a non-empty write (ADVICE r8)
        if _has_data_files(df.sparkSession, path):
            raise
        per = []
    # `or 0`: null-text rows hash/tokenize to NULL, which F.sum
    # SKIPS — an all-null shard aggregates to None (review r7);
    # verify_manifest coalesces the same way, so the two stay equal
    shards = {int(r["__shard"]): {
        "rows": int(r["rows"]), "tokens": int(r["tokens"] or 0),
        "checksum": int(r["checksum"] or 0) % (1 << 62)}
        for r in per}
    manifest = {
        "format": fmt,
        "n_shards": n_shards,
        "rows": sum(s["rows"] for s in shards.values()),
        "tokens": sum(s["tokens"] for s in shards.values()),
        "checksum": sum(s["checksum"]
                        for s in shards.values()) % (1 << 62),
        "shards": {str(k): shards[k] for k in sorted(shards)},
    }
    # underscore prefix: Spark data-source listings ignore _-files
    # (like _SUCCESS), so a json-format export never reads its own
    # manifest back as data. Hadoop FS write: correct on hdfs://
    # s3a:// paths, identical behavior on local paths (ADVICE r5)
    _write_text(df.sparkSession, path.rstrip("/") + "/_manifest.json",
                json.dumps(manifest, indent=2, sort_keys=True))
    return manifest


def verify_manifest(spark, path: str, text_col: str = "text") -> bool:
    """Reader-side check: recompute rows/tokens/checksum from the
    published files and compare with manifest.json — one aggregation
    over the corpus, no driver materialization of the data."""
    manifest = json.loads(
        _read_text(spark, path.rstrip("/") + "/_manifest.json"))
    try:
        df = (spark.read.format(manifest["format"]).load(path))
    except AnalysisException:
        # no data files at all: valid iff the manifest says so
        return manifest["rows"] == 0 and manifest["tokens"] == 0
    got = df.agg(
        F.count("*").alias("rows"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("tokens"),
        F.pmod(F.sum(F.pmod(F.xxhash64(F.col(text_col)),
                            F.lit(1 << 62)).cast("decimal(38,0)")),
               F.lit(1 << 62)).cast("long")
        .alias("checksum")).collect()[0]
    return (int(got["rows"]) == manifest["rows"]
            and int(got["tokens"] or 0) == manifest["tokens"]
            and int(got["checksum"] or 0) % (1 << 62)
            == manifest["checksum"])


def to_webdataset(df: DataFrame, path: str, n_shards: int = 8,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> list[str]:
    """WebDataset-style tar shards: `shard-%05d.tar`, one
    `{id}.txt` member per document, members sorted by id within the
    shard. One applyInPandas task per shard writes its tar —
    documents never reach the driver. Returns the shard paths."""
    import pandas as pd

    if "://" not in path:
        os.makedirs(path, exist_ok=True)
    sharded = _with_shard(
        df.select(F.col(id_col).alias("id"),
                  F.col(text_col).alias("text")), "id", n_shards)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import io
        import tarfile
        import uuid
        if not len(pdf):
            return pd.DataFrame({"shard": [], "n": []})
        shard = int(pdf["__shard"].iloc[0])
        dest = path.rstrip("/") + f"/shard-{shard:05d}.tar"
        # per-ATTEMPT temp name + rename commit: a retried or
        # speculative task never interleaves writes under the final
        # name (review r7); a failed attempt leaves only its temp
        tmp = dest + f".tmp-{uuid.uuid4().hex}"
        pdf = pdf.sort_values("id")
        try:
            # stream mode ("w|"): entry-by-entry writes into the
            # sink, never the whole shard in memory — works on
            # pyarrow output streams (write-only, no seek) and local
            # files alike
            with _open_shard_output(tmp) as out, \
                    tarfile.open(fileobj=out, mode="w|") as tar:
                for doc_id, text in zip(pdf["id"], pdf["text"]):
                    # null text publishes as an EMPTY member, never
                    # the 4-byte literal "None" (review r7)
                    data = (b"" if pd.isna(text)
                            else str(text).encode("utf-8"))
                    info = tarfile.TarInfo(name=f"{doc_id}.txt")
                    info.size = len(data)
                    info.mtime = 0      # deterministic bytes
                    tar.addfile(info, io.BytesIO(data))
        except BaseException:
            if "://" in tmp:
                # best-effort: an orphaned .tmp-* next to published
                # shards would pollute naive listings (ADVICE r8);
                # never mask the original failure if delete fails too
                try:
                    from pyarrow import fs as pafs
                    filesystem, p_tmp = pafs.FileSystem.from_uri(tmp)
                    filesystem.delete_file(p_tmp)
                except Exception:
                    pass
            elif os.path.exists(tmp):
                os.unlink(tmp)
            raise
        _commit_shard(tmp, dest)
        return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

    done = (sharded.groupBy("__shard")
            .applyInPandas(write_shard, "shard int, n long")
            .collect())
    return [path.rstrip("/") + f"/shard-{int(r['shard']):05d}.tar"
            for r in sorted(done, key=lambda r: r["shard"])]


def load_corpus(spark, path: str):
    """Format-sniffing corpus reader: parquet directory/file, .jsonl/
    .json (JSON Lines), or .csv (header row) — the ingest mirror of
    export_corpus, so `corpus --input` accepts whatever format a
    producer published. Directories default to parquet (the
    export_corpus layout, manifest ignored)."""
    low = path.lower()
    if low.endswith((".jsonl", ".json", ".ndjson")):
        return spark.read.json(path)
    if low.endswith(".csv"):
        return spark.read.option("header", "true") \
                    .option("inferSchema", "true").csv(path)
    if low.endswith(".orc"):
        return spark.read.orc(path)
    return spark.read.parquet(path)
