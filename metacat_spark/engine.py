"""The query engine: MQL text → PySpark DataFrame plan.

Translation strategy (SURVEY.md §3.4): parse MQL with our parser, then
build the DataFrame plan directly — Catalyst then performs everything
the reference's hand-rolled optimizer did (predicate pushdown,
conjunction merge, NOT elimination, union flattening, empty
propagation, column pruning; mql10.py:127-475) plus what it never had
(join reordering, AQE, whole-stage codegen).

Semantics preserved from the reference:
- file sets are distinct-by-file-id (dbobjects2.py:181-193); we use
  left-semi/left-anti joins so no explicit distinct is ever needed
- BFQs exclude retired files unless include_retired
  (dbobjects2.py:260-262); explicit file lists do NOT filter retired
  (dbobjects2.py:305-345)
- skip/limit merge law + `skip ⇒ ordered` (mql10.py:39-45,244-346,768-786)
- dataset `with subsets recursively` is a cycle-guarded iterative
  closure (dbobjects2.py:1060-1088,1505-1548)
- named queries are inlined at translate time with cycle detection
  (mql10.py:907-923)
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Catalog
from .mql import parse
from .mql.ast import (BasicFileQuery, ChildrenOf, DatasetQuery,
                      DatasetSelector, FileList, FileQuery, FilterOp,
                      JoinOp, LimitOp, MetaAnd, MinusOp, NamedQueryRef,
                      OrderedOp, ParentsOf, QueryQuery, SkipOp, UnionOp,
                      WhereOp)
from .predicate import CompileError, PredicateCompiler
from .schema import (DATASET_ATTRIBUTES, FILE_ATTRIBUTES, QUERY_ATTRIBUTES)

FILE_OUTPUT_COLUMNS = ["id", "namespace", "name", "size", "creator",
                       "created_timestamp", "retired"]


class QueryError(Exception):
    pass


class Engine:
    def __init__(self, catalog: Catalog):
        self.cat = catalog
        self.spark = catalog.spark
        if catalog.file_variant_column:
            # variant warehouse mode: every metadata predicate compiles
            # to variant_get over the ONE native VariantType column
            self.file_pred = PredicateCompiler(
                catalog.file_meta, FILE_ATTRIBUTES, json_column=None,
                variant_column=catalog.file_variant_column)
        else:
            self.file_pred = PredicateCompiler(catalog.file_meta,
                                               FILE_ATTRIBUTES, "metadata")
        self.dataset_pred = PredicateCompiler(catalog.dataset_meta,
                                              DATASET_ATTRIBUTES, "metadata")
        self.query_pred = PredicateCompiler(catalog.query_meta,
                                            QUERY_ATTRIBUTES, "metadata")

    # ------------------------------------------------------------- public
    def query(self, text: str, with_meta: bool = False,
              with_provenance: bool = False, summary: Optional[str] = None,
              include_retired: bool = False,
              default_namespace: Optional[str] = None,
              after_id: Optional[str] = None,
              page_size: Optional[int] = None) -> DataFrame:
        """Run an MQL query; returns a lazy DataFrame.

        Mirrors the REST /data/query option surface
        (webserver/data_handler.py:1266-1297).

        ``after_id``/``page_size`` are the scale-safe id-cursor
        pagination surface (docs/SCALING.md): `id > after_id` prunes
        the id-sorted bucketed scan (min/max row-group skipping) and
        the page limit compiles to a top-k (TakeOrderedAndProject) —
        no global Exchange+Sort, unlike MQL `skip n`, which is kept
        for reference parity. Page through by passing the last row's
        id back as the next ``after_id``.
        """
        top = parse(text, default_namespace=default_namespace)
        if summary and not isinstance(top, FileQuery):
            # summaries are defined over FILE sets (the reference's
            # data_handler summary surface); silently returning raw
            # dataset rows made /data/query?summary=count serve a
            # dataset record as "the count" (review r6)
            raise QueryError("summary= applies to file queries only")
        if isinstance(top, FileQuery):
            df = self._translate_fq(top.tree, include_retired,
                                    _named_stack=())
            if summary:
                return self._summary(df, summary)
            out = self._project_files(df, with_meta, with_provenance)
            if after_id is not None or page_size is not None:
                if after_id is not None:
                    out = out.where(F.col("id") > after_id)
                out = out.orderBy("id")
                if page_size is not None:
                    out = out.limit(int(page_size))
            return out
        if isinstance(top, DatasetQuery):
            df = self._translate_dataset_query(top)
            cols = ["namespace", "name", "frozen", "monotonic", "creator",
                    "description", "created_timestamp"]
            if with_meta:
                cols.append("metadata")
            return df.select(*cols)
        if isinstance(top, QueryQuery):
            df = self._translate_query_query(top)
            cols = ["namespace", "name", "source", "creator", "description"]
            if with_meta:
                cols.append("metadata")
            return df.select(*cols)
        raise QueryError(f"unsupported query {top!r}")

    def explain(self, text: str, **kw) -> str:
        """MQL AST + Spark physical plan (parity with `metacat query -x`,
        metacat/ui/metacat_query.py:64-84)."""
        top = parse(text, default_namespace=kw.get("default_namespace"))
        df = self.query(text, **kw)
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        return f"-- MQL AST --\n{top}\n\n-- Spark plan --\n{plan}"

    # ------------------------------------------------------- file queries
    def _translate_fq(self, node, include_retired: bool,
                      _named_stack: tuple) -> DataFrame:
        tr = lambda n: self._translate_fq(n, include_retired, _named_stack)

        if isinstance(node, BasicFileQuery):
            df = self.cat.files
            if not include_retired:
                df = df.where(~F.col("retired"))
            if node.datasets:
                df = self._apply_dataset_membership(df, node.datasets)
            if node.where is not None:
                df = df.where(self.file_pred.compile(node.where))
            return df

        if isinstance(node, FileList):
            df = self.cat.files  # explicit lists do NOT filter retired
            if node.kind == "fid":
                return df.where(F.col("id").isin(list(node.items)))
            cond = None
            for ns, name in node.items:
                if ns is None:
                    raise QueryError(f"no namespace for file {name!r}")
                c = (F.col("namespace") == ns) & (F.col("name") == name)
                cond = c if cond is None else (cond | c)
            return df.where(cond)

        if isinstance(node, NamedQueryRef):
            key = (node.namespace, node.name)
            if key in _named_stack:
                raise QueryError(f"named query cycle: {key}")
            src = self.cat.named_query_source(node.namespace, node.name)
            if src is None:
                raise QueryError(f"named query not found: "
                                 f"{node.namespace}:{node.name}")
            sub = parse(src, default_namespace=node.namespace)
            if not isinstance(sub, FileQuery):
                raise QueryError("named query must be a file query")
            return self._translate_fq(sub.tree, include_retired,
                                      _named_stack + (key,))

        if isinstance(node, WhereOp):
            return tr(node.child).where(self.file_pred.compile(node.exp))

        if isinstance(node, (UnionOp, JoinOp, MinusOp)):
            # id-set fast path: branches reduce to id sets WITHOUT
            # touching the files table (membership-only branches read
            # just the bucketed membership table; predicate branches an
            # id+predicate-pruned files scan), the sets combine
            # set-wise, and ONE final full-width files scan semi-joins
            # the result (bucketed on id → no shuffle on the big side).
            # The retired filter commutes with ∪/∩/∖ (it's a per-file
            # attribute), so for trees whose leaves are all BFQs — which
            # per-branch EXCLUDE retired — applying it once at the final
            # scan is exact. Trees with FileList / parents() / filter
            # leaves keep per-branch retired semantics and take the
            # row-level path. File sets are distinct-by-id
            # (dbobjects2.py:181-193), so with unique file ids id-set
            # algebra is exact — and ids ARE unique in any real catalog
            # (the reference's PK, our declare_files check). Only the
            # synthetic sf0.001 fixture carries a duplicated id
            # (DIVERGENCES §6); there we keep the multiplicity-exact
            # row-level path so dup copies flow like the oracle SQL.
            if self._all_bfq(node) and self._file_ids_unique():
                out = self.cat.files
                if not include_retired:
                    out = out.where(~F.col("retired"))
                return out.join(self._bfq_ids(node), "id", "left_semi")
            if isinstance(node, UnionOp):
                dfs = [tr(ch) for ch in node.children]
                return reduce(DataFrame.unionByName, dfs) \
                    .dropDuplicates(["id"])
            if isinstance(node, JoinOp):
                dfs = [tr(ch) for ch in node.children]
                out = dfs[0]
                for other in dfs[1:]:
                    out = out.join(other.select("id"), "id", "left_semi")
                return out
            left, right = tr(node.left), tr(node.right)
            return left.join(right.select("id"), "id", "left_anti")

        if isinstance(node, ParentsOf):
            child = tr(node.child)
            pc = self.cat.parent_child
            hits = pc.join(child.select(F.col("id").alias("child_id")),
                           "child_id", "left_semi")
            return self.cat.files.join(
                hits.select(F.col("parent_id").alias("id")), "id",
                "left_semi")

        if isinstance(node, ChildrenOf):
            parent = tr(node.child)
            pc = self.cat.parent_child
            hits = pc.join(parent.select(F.col("id").alias("parent_id")),
                           "parent_id", "left_semi")
            return self.cat.files.join(
                hits.select(F.col("child_id").alias("id")), "id",
                "left_semi")

        if isinstance(node, (SkipOp, LimitOp, OrderedOp)):
            return self._apply_skip_limit(node, tr)

        if isinstance(node, FilterOp):
            from .filters import run_filter
            child_dfs = [tr(ch) for ch in node.children]
            return run_filter(self, node.name, node.params, node.kwparams,
                              child_dfs)

        raise QueryError(f"cannot translate {node!r}")

    def _file_ids_unique(self) -> bool:
        """File-id uniqueness for the set-algebra fast path. Known
        catalogs carry the invariant with them (recorded at warehouse
        ingest as a table property; maintained by DML, whose declare
        path enforces the PK and whose patch paths never add rows) —
        no job runs here. The groupBy probe remains only as a fallback
        for ad-hoc from_dataframes catalogs, cached until something
        reassigns cat.files (which auto-invalidates the cache)."""
        cached = self.cat.ids_unique
        if cached is None:
            cached = (self.cat.files.groupBy("id").count()
                      .where(F.col("count") > 1).isEmpty())
            self.cat.ids_unique = cached
        return cached

    def _all_bfq(self, node) -> bool:
        """True iff every leaf of a set-op tree is a BasicFileQuery
        (where-wrappers allowed) — the shape for which the retired
        filter commutes to the final scan."""
        if isinstance(node, (UnionOp, JoinOp)):
            return all(self._all_bfq(c) for c in node.children)
        if isinstance(node, MinusOp):
            return self._all_bfq(node.left) and self._all_bfq(node.right)
        if isinstance(node, WhereOp):
            return self._all_bfq(node.child)
        return isinstance(node, BasicFileQuery)

    def _bfq_ids(self, node) -> DataFrame:
        """Set algebra over id sets only, never materializing file rows:
        membership-only BFQs read just the membership table; predicate
        BFQs an id+predicate-pruned files scan. The retired filter is
        NOT applied here — the enclosing final files scan applies it
        once (exact for all-BFQ trees; see translate note). Duplicate
        ids from overlapping selectors are tolerated: union dedups,
        semi/anti preserve sets, and the final semi-join emits each
        file row once."""
        if isinstance(node, UnionOp):
            parts = [self._bfq_ids(ch) for ch in node.children]
            return reduce(DataFrame.unionByName, parts) \
                .dropDuplicates(["id"])
        if isinstance(node, JoinOp):
            parts = [self._bfq_ids(ch) for ch in node.children]
            out = parts[0]
            for other in parts[1:]:
                out = out.join(other, "id", "left_semi")
            return out
        if isinstance(node, MinusOp):
            return self._bfq_ids(node.left).join(
                self._bfq_ids(node.right), "id", "left_anti")
        if isinstance(node, WhereOp):
            return (self.cat.files
                    .where(self.file_pred.compile(node.exp))
                    .select("id")
                    .join(self._bfq_ids(node.child), "id", "left_semi"))
        # BasicFileQuery leaf
        if node.where is not None:
            ids = self.cat.files \
                .where(self.file_pred.compile(node.where)).select("id")
            if node.datasets:
                ids = ids.join(self._membership_ids(node.datasets),
                               "id", "left_semi")
            return ids
        if node.datasets:
            return self._membership_ids(node.datasets)
        return self.cat.files.select("id")

    def _apply_skip_limit(self, node, tr) -> DataFrame:
        """Fold a contiguous skip/limit/ordered chain with the reference's
        merge law (mql10.py:39-45): innermost-first, skip adds and eats
        into a pending limit; limit takes the min. skip ⇒ ordered."""
        chain = []
        cur = node
        while isinstance(cur, (SkipOp, LimitOp, OrderedOp)):
            chain.append(cur)
            cur = cur.child
        df = tr(cur)
        skip, limit, ordered = 0, None, False
        for op in reversed(chain):  # innermost first
            if isinstance(op, SkipOp):
                skip += op.n
                if limit is not None:
                    limit = max(limit - op.n, 0)
            elif isinstance(op, LimitOp):
                limit = op.n if limit is None else min(limit, op.n)
            else:
                ordered = True
        if limit is not None and limit <= 0:
            return df.limit(0)
        if skip > 0:
            out = df.orderBy("id").offset(skip)
            return out.limit(limit) if limit is not None else out
        if limit is not None:
            return df.orderBy("id").limit(limit) if ordered else \
                df.limit(limit)
        return df.orderBy("id") if ordered else df

    # -------------------------------------------------- dataset selection
    def _selector_cond(self, sel: DatasetSelector, ns_col: str,
                       name_col: str):
        if sel.namespace is None:
            raise QueryError(f"no namespace for dataset {sel.name!r}")
        ns_ok = F.col(ns_col) == sel.namespace
        if sel.kind == "did":
            return ns_ok & (F.col(name_col) == sel.name)
        if sel.kind == "pattern":
            # escape LIKE metacharacters FIRST: a literal '_' in the
            # glob (ubiquitous in dataset names) must not match any
            # character (review r6 — 'urgent_*' wrongly matched
            # 'urgentX0')
            like = (sel.name.replace("\\", "\\\\")
                    .replace("%", "\\%").replace("_", "\\_")
                    .replace("*", "%").replace("?", "_"))
            return ns_ok & F.col(name_col).like(like)
        if sel.kind == "regexp":
            return ns_ok & F.col(name_col).rlike(sel.name)
        raise QueryError(f"bad selector kind {sel.kind}")

    def _resolve_datasets(self, selectors) -> DataFrame:
        """Selected datasets as a (namespace, name, <attrs>) DataFrame,
        expanding `with subsets [recursively]` via an iterative,
        cycle-safe closure (parity: dbobjects2.py:1505-1548)."""
        ds = self.cat.datasets
        parts = []
        for sel in selectors:
            seed = ds.where(self._selector_cond(sel, "namespace", "name"))
            if sel.with_subsets or sel.with_ancestors:
                names = seed.select("namespace", "name")
                closure = self._subset_closure(names, sel.recursively,
                                               up=sel.with_ancestors)
                seed = ds.join(closure, ["namespace", "name"], "left_semi")
            if sel.having is not None:
                seed = seed.where(self.dataset_pred.compile(sel.having))
            parts.append(seed)
        out = reduce(DataFrame.unionByName, parts)
        return out.dropDuplicates(["namespace", "name"])

    def _subset_closure(self, seed: DataFrame, recursively: bool,
                        up: bool = False) -> DataFrame:
        """Dataset DAG closure. ``up=False`` walks parent→child
        (``with subsets``, dbobjects2.py:1062-1086); ``up=True`` walks
        child→parent (``ancestors``, dbobjects2.py:1094-1122) — the same
        traversal with the edge roles swapped."""
        edges = self.cat.datasets_parent_child
        here, there = (("child", "parent") if up else ("parent", "child"))
        out_sel = [F.col(f"{there}_namespace").alias("namespace"),
                   F.col(f"{there}_name").alias("name")]

        def step(front: DataFrame) -> DataFrame:
            return (edges.join(
                front.withColumnRenamed("namespace", f"{here}_namespace")
                     .withColumnRenamed("name", f"{here}_name"),
                [f"{here}_namespace", f"{here}_name"], "left_semi")
                .select(*out_sel))

        if not recursively:
            return seed.unionByName(step(seed)).dropDuplicates(
                ["namespace", "name"])
        # transitive closure: frontier loop with visited-set cycle guard
        acc = seed.dropDuplicates(["namespace", "name"]).localCheckpoint()
        frontier = acc
        while True:
            nxt = (step(frontier)
                   .dropDuplicates(["namespace", "name"])
                   .join(acc, ["namespace", "name"], "left_anti")
                   .localCheckpoint())
            if nxt.isEmpty():
                return acc
            acc = acc.unionByName(nxt).localCheckpoint()
            frontier = nxt

    def _membership_ids(self, selectors) -> DataFrame:
        """File ids selected by dataset membership — reads ONLY the
        bucketed membership table (no files scan)."""
        fd = self.cat.files_datasets
        complex_sel = any(s.with_subsets or s.with_ancestors
                          or s.having is not None
                          for s in selectors)
        if complex_sel:
            ds = self._resolve_datasets(selectors).select(
                F.col("namespace").alias("dataset_namespace"),
                F.col("name").alias("dataset_name"))
            fd = fd.join(F.broadcast(ds),
                         ["dataset_namespace", "dataset_name"], "left_semi")
        else:
            cond = reduce(lambda a, b: a | b,
                          [self._selector_cond(s, "dataset_namespace",
                                               "dataset_name")
                           for s in selectors])
            fd = fd.where(cond)
        return fd.select(F.col("file_id").alias("id"))

    def _apply_dataset_membership(self, files_df: DataFrame,
                                  selectors) -> DataFrame:
        return files_df.join(self._membership_ids(selectors),
                             "id", "left_semi")

    # ----------------------------------------------------------- datasets
    def _translate_dataset_query(self, q: DatasetQuery) -> DataFrame:
        return self._resolve_datasets(q.selectors)

    def _translate_query_query(self, q: QueryQuery) -> DataFrame:
        df = self.cat.queries_tbl
        if q.pattern is not None:
            df = df.where(self._selector_cond(q.pattern, "namespace", "name"))
        if q.where is not None:
            df = df.where(self.query_pred.compile(q.where))
        return df

    # ---------------------------------------------------------- summaries
    def _summary(self, df: DataFrame, kind: str) -> DataFrame:
        if kind == "count":
            return df.agg(F.count("*").alias("count"),
                          F.sum("size").alias("total_size"))
        if kind == "keys":
            return (df.select(F.explode(F.json_object_keys("metadata"))
                              .alias("key"))
                    .distinct())
        if kind == "key-values":
            return self._summary_key_values(df)
        raise QueryError(f"unknown summary {kind!r}")

    # canonical (vtype, value-string) formatting per logical metadata
    # type — shared contract with the driver oracle (the oracle SQL in
    # __spark_entry__.py is generated from the same MetaSchema).
    _KV_VTYPE = {"int": "number", "float": "number", "str": "string",
                 "bool": "boolean"}

    @staticmethod
    def _kv_canonical(col: F.Column, mtype: str) -> F.Column:
        if mtype == "float":
            # fixed-scale decimal: identical text in Spark and DuckDB
            # (double→string would render 8.34192E8 vs 834192000.0)
            return col.cast("decimal(38,6)").cast("string")
        if mtype in ("int", "str", "bool"):
            return col.cast("string")
        return F.to_json(col)  # arrays/maps: compact JSON text

    def _summary_key_values(self, df: DataFrame) -> DataFrame:
        """Distinct (key, vtype, value) triples over the file set's
        metadata — the reference's ``jsonb_each`` summary
        (dbobjects2.py:390-404) with an explicit JSON type tag so
        non-scalar and scalar values keep faithful representations.
        Shredded keys are read from their typed columns (no JSON
        re-parse, stays in codegen); unshredded keys fall back to the
        JSON column."""
        schema = self.cat.file_meta
        structs = []
        for mk in schema.by_key.values():
            vtype = self._KV_VTYPE.get(
                mk.mtype, "object" if mk.is_map else "array")
            structs.append(F.struct(
                F.lit(mk.key).alias("key"), F.lit(vtype).alias("vtype"),
                self._kv_canonical(F.col(mk.column), mk.mtype)
                .alias("value")))
        parts = []
        if structs:
            kv = (df.select(F.explode(F.array(*structs)).alias("kv"))
                  .select("kv.*").where(F.col("value").isNotNull()))
            parts.append(kv)
        vcol = getattr(self.cat, "file_variant_column", None)
        if vcol and vcol in df.columns:
            # VARIANT mode: the variant value knows its own type, so
            # the summary reports the SAME typed vtype contract as the
            # shredded path instead of a flat 'json' (r7; verified by
            # the variant parity sweep). Dynamic per-key access via
            # try_variant_get with a concat'd path; number rendering
            # follows the shredded canonicalization — integers plain,
            # decimal-pointed numbers as decimal(38,6) text.
            shredded = list(schema.by_key)
            # the variant path grammar has NO escape sequences, and a
            # malformed path throws even under try_variant_get — so
            # quote the key with whichever quote character it does
            # not contain; a key holding BOTH kinds is inexpressible
            # and yields a NULL path → NULL value (dropped row),
            # never a crash (review r7: the old single-quote-only
            # concat crashed the whole summary on a key like it's)
            path_col = (F.when(
                ~F.col("key").contains("'"),
                F.concat(F.lit("$['"), F.col("key"), F.lit("']")))
                .when(~F.col("key").contains('"'),
                      F.concat(F.lit('$["'), F.col("key"),
                               F.lit('"]'))))
            vg = f"try_variant_get(`{vcol}`, __vpath, 'variant')"
            sch = F.expr(f"schema_of_variant({vg})")
            val_str = F.expr(f"cast({vg} as string)")
            # try_cast: ANSI mode would otherwise abort the whole
            # summary on a schema-free number outside decimal(38,6)
            # range (review r7); such values fall back to their raw
            # string rendering
            num_canon = F.expr(
                f"coalesce(cast(try_cast({vg} as decimal(38,6)) "
                f"as string), cast({vg} as string))")
            vtype = (F.when(F.startswith(sch, F.lit("ARRAY")), "array")
                     .when(F.startswith(sch, F.lit("OBJECT"))
                           | F.startswith(sch, F.lit("STRUCT"))
                           | F.startswith(sch, F.lit("MAP")), "object")
                     .when(sch == "STRING", "string")
                     .when(sch == "BOOLEAN", "boolean")
                     .otherwise(F.lit("number")))
            value = (F.when(sch.isin("BIGINT", "INT", "SMALLINT",
                                     "TINYINT"), val_str)
                     .when(vtype == "number", num_canon)
                     .otherwise(val_str))
            other = (df.select(
                F.col(vcol),
                F.explode(F.json_object_keys("metadata")).alias("key"))
                .where(~F.col("key").isin(shredded))
                .withColumn("__vpath", path_col)
                .select("key", vtype.alias("vtype"),
                        value.alias("value"))
                .where(F.col("value").isNotNull()))
            parts.append(other)
        elif "metadata" in df.columns:
            shredded = list(schema.by_key)
            # get_json_object cannot address keys containing a quote
            # at all (its path grammar has no workable quoting) — such
            # keys return NULL and their rows drop from the summary;
            # known limitation of this legacy JSON fallback (the
            # shredded and variant paths both handle them)
            other = (df.select(
                F.col("metadata"),
                F.explode(F.json_object_keys("metadata")).alias("key"))
                .where(~F.col("key").isin(shredded))
                .select("key", F.lit("json").alias("vtype"),
                        F.expr("get_json_object(metadata, "
                               "concat('$[\\'', key, '\\']'))")
                        .alias("value"))
                .where(F.col("value").isNotNull()))
            parts.append(other)
        return reduce(DataFrame.unionByName, parts).distinct()

    # --------------------------------------------------------- projection
    def _project_files(self, df: DataFrame, with_meta: bool,
                       with_provenance: bool) -> DataFrame:
        # tolerate minimal sources (from_dataframes): project only the
        # canonical columns the backing table actually has
        cols = [c for c in FILE_OUTPUT_COLUMNS if c in df.columns]
        if with_meta and "metadata" in df.columns:
            cols.append("metadata")
        out = df.select(*cols)
        if with_provenance:
            pc = self.cat.parent_child
            parents = (pc.groupBy(F.col("child_id").alias("id"))
                       .agg(F.collect_list("parent_id").alias("parents")))
            children = (pc.groupBy(F.col("parent_id").alias("id"))
                        .agg(F.collect_list("child_id").alias("children")))
            out = (out.join(parents, "id", "left")
                   .join(children, "id", "left"))
        return out

    # --------------------------------------------------- aggregation API
    # count over a COLUMN counts non-null values (SQL count(col));
    # the None-column case maps to count(*) at the call site
    _AGG_FNS = {"count": F.count,
                "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
                "count_distinct": F.countDistinct,
                # exact percentile with linear interpolation — matches
                # DuckDB quantile_cont for oracle parity; use
                # percentile_approx in application code at 100 TB if
                # the full-sort cost of exactness isn't warranted
                "median": lambda c: F.percentile(c, F.lit(0.5))}

    def _resolve_value(self, key: str, numeric: bool = False):
        """(column, schema_free) for an attribute or dotted metadata
        key: schema_free marks values that arrive as STRINGS with no
        type information (JSON fallback / variant mode) — shared by
        the aggregation API and profile()."""
        if key in FILE_ATTRIBUTES:
            return F.col(key), False
        col, mtype = self.file_pred._scalar_column(key)
        if mtype.startswith("variant:"):
            # variant mode: _scalar_column returns a lit(None)
            # placeholder (only _typed() materializes the getter)
            # — extract as string here, like the JSON fallback
            vkey = mtype[len("variant:"):]
            col = F.try_variant_get(
                F.col(self.file_pred.variant_column),
                f"$['{vkey}']", "string")
            mtype = "json"
        if numeric and mtype == "json":
            # schema-on-read string -> numeric for sum/avg/median
            # (ANSI mode rejects implicit string arithmetic;
            # try_cast nulls non-numeric values instead)
            return col.try_cast("double"), False
        return col, mtype == "json"

    def profile(self, text: str, keys: list,
                include_retired: bool = False,
                default_namespace: Optional[str] = None) -> DataFrame:
        """Numeric distribution profile of attributes / dotted
        metadata keys over a file set — the DuckDB-SUMMARIZE /
        pandas-describe companion to the GUI's value histogram
        (``_meta_stats`` buckets VALUES; this profiles
        DISTRIBUTIONS). One row per key:

            (key, n, n_null, min, max, avg, stddev, p25, p50, p75)

        computed in ONE scan + ONE aggregate (k×9 aggregate
        expressions, map-side combinable except the exact
        percentiles), then unpivoted with ``stack`` — no per-key
        jobs. Percentiles are exact linear interpolation (DuckDB
        quantile_cont parity — swap percentile_approx at 100 TB per
        the quality-gate contract); stddev is the sample form and
        NULL below two values (Spark's NaN is normalized so both
        engines agree). Every numeric resolves through the same
        shredded/JSON/variant machinery as predicates — schema-free
        string values try_cast to double, non-numerics profile as
        NULL."""
        df = self.file_set(text, include_retired, default_namespace)
        if not keys:
            raise QueryError("profile() needs at least one key")
        for k in keys:
            # key names are interpolated into the stack() SQL below —
            # restrict to the dotted-identifier alphabet so a quoted
            # or malformed key is a clean error, not a SQL parse
            # traceback
            if not re.fullmatch(r"[A-Za-z0-9_.\-]+", k):
                raise QueryError(f"profile(): bad key {k!r}")
        sel, aggs = [], [F.count("*").alias("_total")]
        for i, k in enumerate(keys):
            col, _ = self._resolve_value(k, numeric=True)
            c = F.col(f"_k{i}")
            sel.append(col.try_cast("double").alias(f"_k{i}"))
            aggs += [
                F.count(c).alias(f"n_{i}"),
                F.round(F.min(c), 6).alias(f"min_{i}"),
                F.round(F.max(c), 6).alias(f"max_{i}"),
                F.round(F.avg(c), 6).alias(f"avg_{i}"),
                F.when(F.count(c) > 1,
                       F.round(F.stddev_samp(c), 6))
                .alias(f"std_{i}"),
                F.round(F.percentile(c, F.lit(0.25)), 6)
                .alias(f"p25_{i}"),
                F.round(F.percentile(c, F.lit(0.5)), 6)
                .alias(f"p50_{i}"),
                F.round(F.percentile(c, F.lit(0.75)), 6)
                .alias(f"p75_{i}"),
            ]
        agged = df.select(*sel).agg(*aggs)
        parts = [
            (f"'{k}', n_{i}, _total - n_{i}, min_{i}, max_{i}, "
             f"avg_{i}, std_{i}, p25_{i}, p50_{i}, p75_{i}")
            for i, k in enumerate(keys)]
        return agged.selectExpr(
            f"stack({len(keys)}, {', '.join(parts)}) as "
            f"(key, n, n_null, min, max, avg, stddev, p25, p50, p75)")

    def aggregate(self, text: str, group_by: list,
                  aggs: dict, cube: bool = False,
                  include_retired: bool = False,
                  default_namespace: Optional[str] = None) -> DataFrame:
        """General aggregation over a file set — beyond-reference
        surface (the reference has only fixed summaries, SURVEY §2.7;
        Spark gives grouping sets/cube for free).

        group_by: attribute names or dotted metadata keys (resolved
        through the same shredded/JSON machinery as predicates).
        aggs: {output_alias: (fn, column)} with fn in
        count/sum/avg/min/max/count_distinct; column may be an
        attribute, a dotted metadata key, or None for count.
        """
        df = self.file_set(text, include_retired, default_namespace)
        resolve = self._resolve_value
        numeric_fns = {"sum", "avg", "median"}
        gnames = [k.replace(".", "_") for k in group_by]
        sel = [resolve(k)[0].alias(n) for k, n in zip(group_by, gnames)]
        schema_free = {}
        for alias, (fn, key) in aggs.items():
            if key is not None:
                col, free = resolve(key, fn in numeric_fns)
                sel.append(col.alias(f"_in_{alias}"))
                schema_free[alias] = free
        named = df.select(*sel)
        grouped = named.cube(*gnames) if cube else named.groupBy(*gnames)
        agg_cols = []
        for alias, (fn, key) in aggs.items():
            c = F.col(f"_in_{alias}")
            if key is None:
                agg_cols.append(F.count("*").alias(alias))
                continue
            if fn in ("min", "max") and schema_free.get(alias):
                # schema-free values are strings: a plain min/max
                # would order NUMBERS lexicographically ('99' > '499'
                # — the r7 variant-sweep finding). Order by a
                # type-aware key instead: numeric values compare as
                # numbers and sort BEFORE non-numeric strings (so a
                # purely numeric key gets numeric min/max; in a
                # mixed-type key, min favors numbers and max favors
                # strings — documented). Output stays the raw string.
                num = c.try_cast("double")
                ordk = F.when(c.isNotNull(), F.struct(
                    num.isNull().alias("s"), num.alias("n"),
                    c.alias("t")))
                agg_cols.append(
                    (F.min_by(c, ordk) if fn == "min"
                     else F.max_by(c, ordk)).alias(alias))
                continue
            agg_cols.append(self._AGG_FNS[fn](c).alias(alias))
        return grouped.agg(*agg_cols)

    # ------------------------------------------------------ file set core
    def file_set(self, text: str, include_retired: bool = False,
                 default_namespace: Optional[str] = None) -> DataFrame:
        """Full-schema (shredded) file set for internal composition."""
        top = parse(text, default_namespace=default_namespace)
        if not isinstance(top, FileQuery):
            raise QueryError("file_set() requires a file query")
        return self._translate_fq(top.tree, include_retired, ())
