"""User-filter pattern: batch external-source metadata enrichment.

Mirrors the reference's custom-filter contract
(DUNE_specials/custom_filters/runsdb.py:6-60; loader
metacat/filters/filters.py:201-218): take a file stream, look rows up
in an external system in chunks, merge the fetched columns into each
file's metadata, optionally dropping files the source doesn't know.

Spark-first shape: an Arrow-batched mapInPandas stage inside the same
plan — the chunking the reference does by hand (1000 rows/round-trip,
dbobjects2.py:67-68) becomes the Arrow batch size; lookups parallelize
per-partition instead of serializing through one server thread.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

from . import register_filter

# external lookup: batch of file ids → {file_id: {extra metadata}}
LookupFn = Callable[[list[str]], dict[str, dict]]

_LOOKUPS: dict[str, LookupFn] = {}


def register_lookup(name: str, fn: LookupFn) -> None:
    """Register an external lookup source by name; usable in MQL as
    ``filter enrich(source=<name>)(query)``."""
    _LOOKUPS[name] = fn


def _demo_lookup(ids: list[str]) -> dict[str, dict]:
    """Deterministic stand-in for an external run database."""
    return {i: {"ext.batch": len(ids), "ext.tag": i[-4:]} for i in ids}


register_lookup("demo", _demo_lookup)


def enrich(df: DataFrame, lookup: LookupFn,
           drop_missing: bool = False,
           meta_schema=None) -> DataFrame:
    """``meta_schema`` (a MetaSchema) keeps the SHREDDED m_* columns
    in sync with the enriched JSON: a where-clause compiled after the
    filter resolves shredded keys first, so leaving them stale made
    the predicate see pre-enrichment values while with_meta output
    showed the enriched ones (review r6)."""
    schema = df.schema
    shredded = []
    if meta_schema is not None:
        shredded = [(mk.key, mk.column, mk.mtype)
                    for mk in meta_schema.by_key.values()
                    if mk.column in df.columns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            found = lookup(list(pdf["id"]))
            metas = []
            dicts = []
            keep = []
            for fid, meta in zip(pdf["id"], pdf["metadata"]):
                extra = found.get(fid)
                keep.append(extra is not None or not drop_missing)
                base = json.loads(meta) if meta else {}
                if extra:
                    base.update(extra)
                dicts.append(base)
                metas.append(json.dumps(base))
            cols = {"metadata": metas}
            for key, coln, mtype in shredded:
                vals = [d.get(key) for d in dicts]
                if mtype == "float":
                    vals = [float(v) if isinstance(v, int) else v
                            for v in vals]
                cols[coln] = pd.Series(vals, index=pdf.index,
                                       dtype=object)
            pdf = pdf.assign(**cols)[pd.Series(keep).values]
            yield pdf

    return df.mapInPandas(run, schema)


@register_filter("enrich")
def _f_enrich(engine, params, kw, dfs):
    source = str(kw.get("source", params[0] if params else "demo"))
    drop_missing = bool(kw.get("drop_missing", False))
    fn = _LOOKUPS.get(source)
    if fn is None:
        raise KeyError(f"unknown enrichment source {source!r}; "
                       f"registered: {sorted(_LOOKUPS)}")
    if len(dfs) != 1:
        raise ValueError("enrich expects one file set")
    return enrich(dfs[0], fn, drop_missing,
                  meta_schema=engine.cat.file_meta)
