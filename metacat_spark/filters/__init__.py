"""MQL "filters" — the reference's UDF/UDTF extension surface
(docs/mql.rst:280-404; base contract metacat/filters/filters.py:27-50).

A filter takes N file sets + scalar params and yields a file set,
optionally enriching metadata from external sources. Here each filter
is a Python callable producing a DataFrame plan — the standard five
(filters.py:52-191) are re-expressed as scalable DataFrame ops, and
user filters can use mapInPandas for batch external enrichment
(pattern: DUNE_specials/custom_filters/runsdb.py:6-60).

Determinism notes (documented divergences, cf. docs/mql.rst:809-830 —
the reference itself disclaims order stability):
- ``sample``/``every_nth`` are positional in the reference over an
  arbitrary stream order; we define position by file-id order so the
  result is deterministic and oracle-checkable.
- ``randomize`` reorders within a sliding window in the reference; we
  produce a deterministic pseudo-random full reorder (same SET).
- ``mix`` interleaves proportionally until the first input exhausts;
  we implement the same stop rule via closed-form row-number math.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_REGISTRY: dict[str, Callable] = {}


def register_filter(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def run_filter(engine, name: str, params: list, kwparams: dict,
               child_dfs: list[DataFrame]) -> DataFrame:
    fn = _REGISTRY.get(name)
    if fn is None:
        raise KeyError(f"unknown filter {name!r}; registered: "
                       f"{sorted(_REGISTRY)}")
    return fn(engine, [p.value for p in params],
              {k: v.value for k, v in kwparams.items()}, child_dfs)


def _one(dfs: list[DataFrame]) -> DataFrame:
    if len(dfs) != 1:
        raise ValueError("filter expects exactly one file set")
    return dfs[0]


def _with_rn(df: DataFrame) -> DataFrame:
    """0-based position by file-id order. A global window sort — fine at
    catalog scale; positional filters are inherently sequential."""
    return df.withColumn(
        "_rn", F.row_number().over(Window.orderBy("id")) - 1)


@register_filter("limit")
def _f_limit(engine, params, kw, dfs):
    (n,) = params
    return _one(dfs).limit(int(n))


@register_filter("sample")
def _f_sample(engine, params, kw, dfs):
    """Deterministic every-1/f accumulator sampler (filters.py:52-69 —
    NOT random despite its docstring). Row at position i is kept iff
    floor((i+1)*f) > floor(i*f), which replays the reference's
    `x += f; if x >= 1: yield; x -= 1` accumulator exactly."""
    frac = float(params[0]) if params else float(kw.get("fraction", 0.1))
    df = _with_rn(_one(dfs))
    keep = (F.floor((F.col("_rn") + 1) * frac)
            > F.floor(F.col("_rn") * frac))
    return df.where(keep).drop("_rn")


@register_filter("sample_hash")
def _f_sample_hash(engine, params, kw, dfs):
    """Scale-path sampler: order-independent, shuffle-free, same
    expected fraction — keyed on a hash of the file id."""
    frac = float(params[0])
    df = _one(dfs)
    bucket = F.pmod(F.xxhash64("id"), F.lit(1_000_000))
    return df.where(bucket < int(frac * 1_000_000))


@register_filter("every_nth")
@register_filter("stride")
def _f_stride(engine, params, kw, dfs):
    """Position i kept iff i % modulo == remainder (filters.py:85-103)."""
    modulo = int(params[0])
    remainder = int(params[1]) if len(params) > 1 else 0
    df = _with_rn(_one(dfs))
    return df.where(F.col("_rn") % modulo == remainder).drop("_rn")


def adler32_column(col) -> F.Column:
    """adler32 of a string column over CODEPOINTS, computed JVM-side
    with higher-order functions. Equals zlib.adler32 for ASCII input
    (every catalog file id) but NOT for multi-byte UTF-8 — zlib runs
    over bytes, F.ascii yields the first codepoint. The byte-exact
    formulation is _adler32_udf (the one the hash filter and the
    samplers actually use); this mirror exists for JVM-side
    composition and the oracle replay, both ASCII-scoped.

    A = (1 + Σ c_i) mod 65521
    B = (n + Σ (n-i) c_i) mod 65521   (i 0-based)
    adler32 = B * 65536 + A
    """
    chars = F.split(col, "")
    n = F.length(col)
    s = F.aggregate(chars, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.ascii(x))
    a = (F.lit(1) + s) % 65521
    weighted = F.aggregate(
        F.transform(chars, lambda x, i: (n.cast("long") - i) * F.ascii(x)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    b = (n.cast("long") + weighted) % 65521
    return b * F.lit(65536).cast("long") + a


_adler32_pandas = None


def _adler32_udf():
    """Arrow-batched zlib.adler32 — measured ~10× faster than the
    higher-order-function formulation (nested lambdas fall out of
    whole-stage codegen and run interpreted)."""
    global _adler32_pandas
    if _adler32_pandas is None:
        import zlib
        udf = F.pandas_udf(
            lambda s: s.map(lambda x: zlib.adler32(x.encode())), "long")
        # deterministic in fact — but marking it nondeterministic stops
        # Catalyst pushing the (expensive) Python filter below the
        # membership join, where it would hash the whole files table
        _adler32_pandas = udf.asNondeterministic()
    return _adler32_pandas


@register_filter("hash")
def _f_hash(engine, params, kw, dfs):
    """adler32(file_id) % modulo == remainder — order-independent,
    partitions are disjoint (filters.py:105-123).

    Direct Arrow-UDF filter (r7): ArrowEvalPython ships ONLY the
    referenced `id` column to the Python worker regardless of row
    width, so the old id-projection + semi-join-back bought nothing
    and cost a join + an extra codegen stage — measured at sf0.1
    (fresh session each, bench-shape warmup): cold 4.05 s → 2.64 s,
    warm ~1.0 s → ~0.75 s, identical rows. asNondeterministic still
    pins the filter ABOVE the membership join (pushdown would adler32
    the whole files table)."""
    modulo = int(params[0])
    remainder = int(params[1]) if len(params) > 1 else 0
    df = _one(dfs)
    return df.where(_adler32_udf()(F.col("id")) % modulo == remainder)


@register_filter("randomize")
def _f_randomize(engine, params, kw, dfs):
    """Set-preserving deterministic pseudo-random reorder. The reference
    shuffles within a bounded window (filters.py:125-149); a keyed-hash
    full reorder is the scalable equivalent (same set, stronger
    shuffle)."""
    seed = int(params[0]) if params else 0
    df = _one(dfs)
    return df.orderBy(F.xxhash64(F.col("id"), F.lit(seed)))


@register_filter("mix")
def _f_mix(engine, params, kw, dfs):
    """Proportional round-robin merge of N file sets, stopping when the
    first input exhausts, global dedup by id (filters.py:151-191).

    Closed form: input i emits its rows in id order at "times"
    rank/ratio_i; the merge stops at T = min_i(count_i/ratio_i); keep
    rows with time <= T, dedup by id keeping the earliest time.
    """
    ratios = [float(p) for p in params] or [1.0] * len(dfs)
    if len(ratios) != len(dfs):
        raise ValueError("mix: one ratio per input file set")
    tagged = []
    for i, (df, r) in enumerate(zip(dfs, ratios)):
        t = (_with_rn(df)
             .withColumn("_t", (F.col("_rn") + 1) / F.lit(r))
             .withColumn("_src", F.lit(i))
             .drop("_rn"))
        tagged.append(t)
    allrows = reduce(DataFrame.unionByName, tagged)
    # stop threshold: first input to exhaust
    counts = (allrows.groupBy("_src").agg(F.max("_t").alias("maxt"))
              .agg(F.min("maxt").alias("t")).collect())
    tstop = counts[0]["t"] if counts else 0.0
    w = Window.partitionBy("id").orderBy("_t", "_src")
    return (allrows.where(F.col("_t") <= tstop)
            .withColumn("_pick", F.row_number().over(w))
            .where(F.col("_pick") == 1)
            .drop("_t", "_src", "_pick"))


# user-filter pattern (external enrichment) registers itself
from . import enrichment  # noqa: E402,F401
