"""Client facade — the MetaCatClient-equivalent API shell
(reference: metacat/webapi/webapi.py).

Where the reference client speaks HTTP to a WSGI server that compiles
MQL to PostgreSQL, this facade drives the Spark engine directly; the
method surface mirrors the reference's names and result shapes (lists/
iterators of plain dicts) so reference users can switch with minimal
change. Async query concurrency (webapi.py:248-298) maps onto Spark's
scheduler: concurrent jobs from a thread pool share the session.
"""

from __future__ import annotations

import json
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Iterator, Optional

from pyspark.sql import SparkSession

from .catalog import Catalog, from_tpch
from .dml import DML
from .engine import Engine


class MetaCatSparkClient:
    def __init__(self, spark: SparkSession, sf_dir: Optional[str] = None,
                 catalog: Optional[Catalog] = None,
                 max_concurrent_queries: int = 5,
                 durable_root: Optional[str] = None):
        if catalog is None:
            if sf_dir is None:
                raise ValueError("need sf_dir or catalog")
            catalog = from_tpch(spark, sf_dir)
        self.catalog = catalog
        store = None
        if durable_root:
            # durable catalog mode (r8): committed DML state overlays
            # the base catalog at startup; every mutation appends to
            # the commit log — the reference's PostgreSQL persistence
            # (schema.sql:51-66), re-expressed as a parquet commit log
            from .durable import DurableStore
            store = DurableStore(spark, durable_root)
            store.attach(catalog)
        self.engine = Engine(catalog)
        self.dml = DML(catalog, store=store)
        # 5 concurrent queries, like the reference client default
        # (webapi.py:248,277)
        self._pool = ThreadPoolExecutor(max_workers=max_concurrent_queries)

    # ------------------------------------------------------------ queries
    def query(self, mql: str, with_metadata: bool = False,
              with_provenance: bool = False, summary: Optional[str] = None,
              include_retired_files: bool = False,
              namespace: Optional[str] = None,
              save_as: Optional[str] = None,
              add_to: Optional[str] = None,
              after_id: Optional[str] = None,
              page_size: Optional[int] = None) -> list[dict]:
        """Run MQL, return a list of dicts (webapi.py:1238-1294 shape).
        save_as/add_to take "namespace:name" and materialize the result
        as dataset membership before returning. after_id/page_size are
        the id-cursor pagination surface (no global sort, unlike
        `skip`).

        Known cost (deliberate): with save_as/add_to the underlying
        file-set plan executes twice — once for the membership write,
        once for the returned rows. Sharing one DataFrame would
        couple the query projection (summary/meta/pagination shapes)
        to DML internals; the reference pays the same double cost
        (query then add_files round-trips), and the DML path is not
        a hot path here."""
        df = self.engine.query(mql, with_meta=with_metadata,
                               with_provenance=with_provenance,
                               summary=summary,
                               include_retired=include_retired_files,
                               default_namespace=namespace,
                               after_id=after_id, page_size=page_size)
        if save_as or add_to:
            fs = self.engine.file_set(
                mql, include_retired=include_retired_files,
                default_namespace=namespace)
            if save_as:
                ns, name = self._split_did(save_as, "save_as")
                self.dml.save_as(fs, ns, name)
            if add_to:
                ns, name = self._split_did(add_to, "add_to")
                self.dml.add_to(fs, ns, name)
        return [self._row_to_dict(r) for r in df.collect()]

    def query_iter(self, mql: str, **kw) -> Iterator[dict]:
        """Streaming variant (json-seq equivalent): lazy partition-wise
        iteration, no full materialization on the driver.  Honors the
        same summary/save_as/add_to keywords as query() — silently
        dropping them would stream a full row dump where the caller
        asked for a count, and lose materialization without a signal
        (review r6)."""
        if kw.get("save_as") or kw.get("add_to"):
            fs = self.engine.file_set(
                mql,
                include_retired=kw.get("include_retired_files", False),
                default_namespace=kw.get("namespace"))
            if kw.get("save_as"):
                ns, name = self._split_did(kw["save_as"], "save_as")
                self.dml.save_as(fs, ns, name)
            if kw.get("add_to"):
                ns, name = self._split_did(kw["add_to"], "add_to")
                self.dml.add_to(fs, ns, name)
        df = self.engine.query(mql, with_meta=kw.get("with_metadata", False),
                               with_provenance=kw.get(
                                   "with_provenance", False),
                               summary=kw.get("summary"),
                               include_retired=kw.get(
                                   "include_retired_files", False),
                               default_namespace=kw.get("namespace"),
                               after_id=kw.get("after_id"),
                               page_size=kw.get("page_size"))
        for r in df.toLocalIterator():
            yield self._row_to_dict(r)

    def stream_json_seq(self, mql: str, fp, **kw) -> int:
        """Write the result as RFC 7464 json-seq (RS + JSON + LF per
        record) — the reference server's streaming wire format
        (rfc7464.py, data_handler.py json-seq responses). Backed by
        query_iter: partition-at-a-time on the driver, never the full
        result. Returns the record count."""
        n = 0
        for d in self.query_iter(mql, **kw):
            fp.write("\x1e" + json.dumps(d, default=str) + "\n")
            n += 1
        return n

    def async_query(self, mql: str, **kw) -> Future:
        """Promise-returning variant (webapi.py:1296-1323)."""
        return self._pool.submit(self.query, mql, **kw)

    def explain(self, mql: str, with_metadata: bool = False,
                with_provenance: bool = False,
                summary: Optional[str] = None,
                include_retired_files: bool = False,
                namespace: Optional[str] = None) -> str:
        """Engine explain under the CLIENT surface's kwarg names —
        the names query() takes (review r7: explain(namespace=...)
        raised TypeError while query(namespace=...) worked, because
        **kw forwarded client names to engine parameters)."""
        return self.engine.explain(
            mql, with_meta=with_metadata,
            with_provenance=with_provenance, summary=summary,
            include_retired=include_retired_files,
            default_namespace=namespace)

    # ------------------------------------------------------------- lookup
    def get_file(self, fid: Optional[str] = None,
                 did: Optional[str] = None,
                 with_metadata: bool = True) -> Optional[dict]:
        """Full file record (webapi get_file, data_handler.py file
        GET): direct bucketed-table lookup — one pruned bucket, not an
        MQL query — returning every attribute incl. checksums."""
        from pyspark.sql import functions as F
        files = self.catalog.files
        if fid is not None:
            hit = F.col("id") == fid
        elif did is not None:
            ns, name = self._split_did(did, "did")
            hit = (F.col("namespace") == ns) & (F.col("name") == name)
        else:
            raise ValueError("need fid or did")
        cols = ["id", "namespace", "name", "size", "creator",
                "created_timestamp", "retired", "checksums"]
        if with_metadata:
            cols.append("metadata")
        row = files.where(hit).select(*cols).first()
        return None if row is None else self._row_to_dict(row)

    def get_files(self, specs: list[dict], with_metadata: bool = True,
                  with_provenance: bool = False) -> list[dict]:
        """Batch lookup (webapi get_files, data_handler.py:1245-1263
        `files`): each spec carries ``fid`` or ``namespace``+``name``.
        ONE pruned scan with an OR of two isin filters — never a
        per-spec query loop; provenance arrives as the same two
        grouped joins the query projection uses."""
        from pyspark.sql import functions as F
        fids = [s["fid"] for s in specs if s.get("fid")]
        dids = [f"{s['namespace']}:{s['name']}" for s in specs
                if not s.get("fid") and s.get("namespace")
                and s.get("name")]
        files = self.catalog.files
        hit = F.lit(False)
        if fids:
            hit = hit | F.col("id").isin(fids)
        if dids:
            hit = hit | F.concat_ws(":", "namespace", "name").isin(dids)
        cols = ["id", "namespace", "name", "size", "creator",
                "created_timestamp", "retired", "checksums"]
        if with_metadata:
            cols.append("metadata")
        out = files.where(hit).select(*cols)
        if with_provenance:
            pc = self.catalog.parent_child
            parents = (pc.groupBy(F.col("child_id").alias("id"))
                       .agg(F.collect_list("parent_id").alias("parents")))
            children = (pc.groupBy(F.col("parent_id").alias("id"))
                        .agg(F.collect_list("child_id").alias("children")))
            out = (out.join(parents, "id", "left")
                   .join(children, "id", "left"))
        return [self._row_to_dict(r) for r in out.collect()]

    def list_datasets(self, pattern: str = "*:*") -> list[dict]:
        ns, pat = self._split_did(pattern, "pattern")
        return self.query(f"datasets matching {ns}:{pat}")

    # ---------------------------------------------------------------- DML
    def declare_files(self, dataset: Optional[str], rows: list[dict]) -> int:
        ds = self._split_did(dataset, "dataset") if dataset else None
        return self.dml.declare_files(rows, dataset=ds)

    def update_file_metadata(self, fid: str, metadata: dict,
                             mode: str = "update") -> None:
        self.dml.update_file_metadata(fid, metadata, mode)

    def retire_file(self, fid: str, by: str = "client") -> None:
        self.dml.retire_file(fid, by)

    def update_file(self, fid: str, **kw) -> None:
        """Attribute/provenance update passthrough (webapi
        update_file): size, checksums, metadata, parents, children,
        replace."""
        self.dml.update_file(fid, **kw)

    # ------------------------------------------------------------ helpers
    @staticmethod
    def _split_did(value: str, what: str) -> tuple[str, str]:
        """'namespace:name' → (namespace, name), with a usable error
        for colon-less input (review r7: the bare tuple-unpack
        ValueError gave no hint of the expected format)."""
        ns, sep, name = value.partition(":")
        if not sep or not ns or not name:
            raise ValueError(
                f"{what} must be 'namespace:name', got {value!r}")
        return ns, name

    @staticmethod
    def _row_to_dict(row) -> dict:
        d = row.asDict(recursive=True)
        meta = d.get("metadata")
        if isinstance(meta, str):
            try:
                d["metadata"] = json.loads(meta)
            except (ValueError, TypeError):
                pass
        return d
