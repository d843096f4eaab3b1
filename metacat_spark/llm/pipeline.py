"""End-to-end training-data curation pipeline composition.

Chains the individual operators into the canonical curation flow:

    raw documents
      → text analysis (tokens, quality, language)
      → quality gate
      → exact dedup
      → near-dup removal (MinHash-LSH pairs → drop the higher id)
      → curated corpus + per-stage accounting

One lazy plan end-to-end; only the LSH stage introduces shuffles
beyond the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as DD
from . import text as TX


def curate(documents: DataFrame, min_quality: float = 0.3,
           min_tokens: int = 5, jaccard_threshold: float = 0.8,
           text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Returns the curated documents (original columns + analysis)."""
    c = F.col(text_col)
    # stage the token split ONCE (analyze()'s pattern), and extract
    # the marker tokens once — lang_id and the stop-ratio then count
    # over the tiny marker array instead of re-traversing the full
    # token array in ~21 interpreted HOF filters per row (r6→r7)
    toks = F.col("__toks")
    mk = F.col("__mk")
    analyzed = (documents.withColumn("__toks", TX.tokens(c))
                .withColumn("__mk", TX.marker_tokens(c))
                .withColumns({
                    "n_tokens": F.size(toks),
                    "quality": TX.quality_score_from(
                        c, toks, n_the=TX.occurrences_in(mk, "the")),
                    "lang_pred": TX.lang_id_from_markers(mk),
                    "fingerprint": TX.poly_hash(c),
                }).drop("__toks", "__mk"))
    gated = analyzed.where((F.col("quality") >= min_quality)
                           & (F.col("n_tokens") >= min_tokens))
    exact = DD.dedup_exact(gated, text_col, id_col)
    near_pairs = DD.minhash_lsh_pairs(exact, n=2, k=32, bands=8,
                                     threshold=jaccard_threshold,
                                     text_col=text_col, id_col=id_col)
    drop = near_pairs.select(F.col("id_b").alias(id_col)).distinct()
    return exact.join(drop, id_col, "left_anti")


def curate_exact(documents: DataFrame, min_quality: float = 0.3,
                 min_tokens: int = 5, jaccard_threshold: float = 0.12,
                 n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """The curation flow with EXACT n-gram-Jaccard near-dup removal
    instead of MinHash-LSH: every stage is deterministic relational
    algebra, so the WHOLE pipeline is SQL-expressible and
    oracle-hash-checked end-to-end (`curate` keeps the LSH scale path;
    this is its verification twin and the right choice when the corpus
    fits the exact pair join)."""
    c = F.col(text_col)
    toks = F.col("__toks")
    analyzed = (documents.withColumn("__toks", TX.tokens(c))
                .withColumns({
                    "n_tokens": F.size(toks),
                    "quality": TX.quality_score_from(
                        c, toks, n_the=TX.the_count(c)),
                }).drop("__toks"))
    gated = analyzed.where((F.col("quality") >= min_quality)
                           & (F.col("n_tokens") >= min_tokens))
    exact = DD.dedup_exact(gated, text_col, id_col)
    pairs = DD.ngram_jaccard_pairs(exact, n=n,
                                   threshold=jaccard_threshold,
                                   text_col=text_col, id_col=id_col)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return exact.join(drop, id_col, "left_anti")


def stratified_sample(df: DataFrame, fractions: dict,
                      stratum_col: str = "lang",
                      id_col: str = "doc_id",
                      default: float = 0.0,
                      mod: int = 10000) -> DataFrame:
    """Deterministic per-stratum sampling for corpus curation: keep a
    row iff adler32(str(id)) % mod < fraction[stratum]·mod. The usual
    re-balancing step (downsample over-represented languages/sources)
    as a pure, reproducible filter — zero shuffle, zero RNG state, the
    same rows survive on every run and every cluster size. Strata
    absent from ``fractions`` keep ``default``. The adler32 is the
    same portable checksum the `hash` filter mirrors in DuckDB, so the
    operator is oracle-checkable end-to-end.

    Hashing runs as the Arrow-batched ``_adler32_udf`` over a narrow
    (id, stratum) projection with a semi-join back — the wide rows
    (document text) never cross the Python boundary, and the
    higher-order-function formulation (~10× slower, interpreted
    per-character) stays out of the hot path. Same zlib.adler32 value
    either way, so the DuckDB oracle is untouched."""
    from ..filters import _adler32_udf

    m = F.create_map(*[F.lit(x) for kv in fractions.items()
                       for x in kv])
    thr = F.coalesce(m[F.col(stratum_col)],
                     F.lit(float(default))) * mod
    h = _adler32_udf()(F.col(id_col).cast("string")) % mod
    keep = df.select(id_col, stratum_col).where(h < thr)
    return df.join(keep, [id_col, stratum_col], "left_semi")


def mixture_fractions(counts: dict, target: dict) -> dict:
    """Largest downsample-only fractions realizing a target mixture.

    Given per-stratum counts c_s and target weights w_s, the biggest
    corpus with exact proportions w_s (never upsampling) has total
    T = min_s(c_s / w_s); each stratum then keeps T·w_s rows, i.e.
    fraction T·w_s / c_s. The binding stratum keeps everything.
    Target strata absent from ``counts`` are ignored (an exact mix
    containing them is unachievable without upsampling); strata not
    in ``target`` get no entry (dropped by stratified_sample's
    default 0.0). Pure arithmetic — replayed verbatim by the SQL
    oracle, so keep the operation order stable."""
    present = {s: w for s, w in target.items()
               if w > 0 and counts.get(s)}
    if not present:
        return {}
    T = min(counts[s] / w for s, w in present.items())
    return {s: min(1.0, T * w / counts[s]) for s, w in present.items()}


def sample_to_mixture(df: DataFrame, target: dict,
                      stratum_col: str = "lang",
                      id_col: str = "doc_id",
                      mod: int = 10000,
                      by: str = "docs",
                      text_col: str = "text") -> DataFrame:
    """Re-balance a corpus to target mixture proportions (the domain-
    weighting step of a pretraining data recipe): one narrow groupBy
    collects per-stratum masses (#strata rows — the only driver
    traffic), mixture_fractions turns them into deterministic keep-
    fractions, and stratified_sample's hash filter applies them with
    zero additional shuffle. Fully reproducible: same corpus, same
    target ⇒ same surviving rows on any cluster.

    ``by="docs"`` weights strata by document count; ``by="tokens"``
    weights by TOKEN mass — what a pretraining recipe actually
    specifies (a stratum of long documents contributes more tokens
    per doc, so its keep-fraction must shrink accordingly). The
    per-doc hash filter then realizes the token share in
    expectation; the fractions themselves are exact closed-form over
    the measured token masses."""
    if by == "tokens":
        from .text import token_count
        counts = {r[0]: r[1] for r in
                  df.groupBy(stratum_col)
                  .agg(F.sum(token_count(F.col(text_col)))
                       .alias("m")).collect()}
    else:
        counts = {r[0]: r[1] for r in
                  df.groupBy(stratum_col).count().collect()}
    frac = mixture_fractions(counts, target)
    return stratified_sample(df, frac, stratum_col, id_col, mod=mod)


def repetition_scores(df: DataFrame, n: int = 2,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Repetition-based quality signals (the Gopher/C4 family of
    rules): per document,

    - ``n_ngrams``      — total n-gram occurrences,
    - ``dup_ngram_frac``— fraction of occurrences that are repeats
                          (1 − distinct/total),
    - ``top_ngram_frac``— fraction of tokens covered by the single
                          most frequent n-gram (count·n / n_tokens,
                          capped at 1).

    High values mark boilerplate/spam for a curation gate. Shape:
    occurrence rows from the codegen shingle builder
    (shingle_rows(distinct=False)), ONE groupBy (id, shingle) with
    map-side combine, then a groupBy(id) rollup — two narrow
    shuffles, no Python."""
    occ = DD.shingle_rows(df, n, text_col, id_col, distinct=False)
    per = (occ.groupBy("id", "shingle")
           .agg(F.count("*").alias("c")))
    stats = (per.groupBy("id")
             .agg(F.sum("c").alias("n_ngrams"),
                  F.count("*").alias("n_distinct"),
                  F.max("c").alias("max_c")))
    ntok = df.select(F.col(id_col).alias("id"),
                     TX.token_count(F.col(text_col)).alias("n_tok"))
    return (stats.join(ntok, "id")
            .select(F.col("id").alias(id_col),
                    "n_ngrams",
                    F.round(1 - F.col("n_distinct")
                            / F.col("n_ngrams"), 6)
                    .alias("dup_ngram_frac"),
                    F.round(F.least(
                        F.lit(1.0),
                        F.col("max_c") * n / F.col("n_tok")), 6)
                    .alias("top_ngram_frac")))


def curation_report(documents: DataFrame, curated: DataFrame,
                    id_col: str = "doc_id") -> dict:
    n_in = documents.count()
    n_out = curated.count()
    # curate() adds lang_pred; curate_exact/curate_v2 don't — the
    # report must not crash on their output (review r6)
    by_lang = ({r["lang_pred"]: r["n"] for r in
                curated.groupBy("lang_pred")
                .agg(F.count("*").alias("n")).collect()}
               if "lang_pred" in curated.columns else {})
    return {"n_in": n_in, "n_out": n_out,
            "removed": n_in - n_out, "by_lang_pred": by_lang}


def source_report(df: DataFrame, text_col: str = "text",
                  source_col: str = "source") -> DataFrame:
    """Per-source corpus health report — the first table a curation
    run reads before setting mixture weights: document and token
    volume, mean quality, and the exact-duplicate count (docs minus
    distinct content hashes) per source.  One groupBy(source) shuffle
    over a narrow pre-projection; every expression is a JVM built-in.
    Mean quality is rounded per-doc (6) then re-rounded after the avg
    (4) so distributed float-sum ordering can't flip the hash."""
    from .text import quality_score, token_count
    c = F.col(text_col)
    base = df.select(F.col(source_col).alias("source"),
                     token_count(c).alias("n_tok"),
                     quality_score(c).alias("q"),
                     F.md5(c).alias("h"))
    return (base.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens"),
                 F.round(F.avg("q"), 4).alias("avg_quality"),
                 (F.count("*") - F.countDistinct("h"))
                 .alias("n_exact_dups")))


def select_token_budget(df: DataFrame, budget: int,
                        score=None, text_col: str = "text",
                        id_col: str = "doc_id",
                        quantize: int | None = 3) -> DataFrame:
    """Quality-ranked selection under a token budget: order documents
    by (score desc, id asc) and keep the maximal prefix whose
    cumulative token count fits ``budget`` — the selection step when
    assembling a fixed-token training mix from a larger pool.
    ``score`` defaults to quality_score; ``quantize`` rounds it first.

    Scale shape — NO global per-document sort:

    1. one groupBy(score) over a narrow (id, n_tok, score)
       projection → per-score token mass (quantize bounds this table
       to ~10^quantize rows);
    2. running sum over that TINY table (single-partition window over
       score groups, not documents);
    3. broadcast the per-score cumulative offsets back;
    4. per-document running sum WITHIN each score partition
       (Window.partitionBy(score).orderBy(id) — distributed across
       score values), offset by the group's cumulative start.

    cum_tok then equals the global (score desc, id) prefix sum, so
    ``cum_tok <= budget`` reproduces the exact sequential semantics —
    the SQL oracle replays it with one global window.

    Returns the selected (id, n_tok, score, cum_tok)."""
    from pyspark.sql import Window
    from .text import quality_score, token_count
    c = F.col(text_col)
    s = quality_score(c) if score is None else score
    if quantize is not None:
        s = F.round(s, quantize)
    base = df.select(F.col(id_col).alias(id_col),
                     token_count(c).alias("n_tok"), s.alias("score"))
    per = base.groupBy("score").agg(F.sum("n_tok").alias("g_tok"))
    wg = (Window.orderBy(F.col("score").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    offs = per.select("score", F.coalesce(F.sum("g_tok").over(wg),
                                          F.lit(0)).alias("cum_excl"))
    wd = (Window.partitionBy("score").orderBy(id_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    return (base.join(F.broadcast(offs), "score")
            .withColumn("cum_tok",
                        F.col("cum_excl") + F.sum("n_tok").over(wd))
            .where(F.col("cum_tok") <= budget)
            .select(id_col, "n_tok", "score", "cum_tok"))


def split_corpus(df: DataFrame, splits: dict | None = None,
                 id_col: str = "doc_id", salt: str = "",
                 mod: int = 10000) -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    adler32(str(id) + salt) % mod, split chosen by cumulative
    fraction boundaries in ``splits`` insertion order (default
    80/10/10). Pure projection — zero shuffle, zero RNG state; the
    partition is exhaustive and disjoint by construction, and a
    document's assignment depends only on its id, so growing the
    corpus never reassigns existing documents (the property that
    keeps eval sets honest across ingest batches). ``salt`` derives
    independent splits from the same ids. Same portable adler32 the
    hash filter mirrors in DuckDB — oracle-checkable end-to-end;
    hashing is the Arrow-batched ``_adler32_udf`` over just the id
    column (only UDF inputs cross the Python boundary)."""
    from ..filters import _adler32_udf

    if splits is None:
        splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    h = _adler32_udf()(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))) % mod
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = h < F.lit(acc * mod)
        expr = F.when(cond, name) if expr is None \
            else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def curate_stream(spark, src_dir: str, min_quality: float = 0.3,
                  min_tokens: int = 1,
                  table: str = "curate_stream") -> DataFrame:
    """Streaming-ingest curation: the batch pipeline's stateless
    stages (token gate, quality gate, PII redaction) applied to a
    document STREAM, with exact content dedup as the one stateful
    stage (dropDuplicates on md5 — state is one hash per distinct
    content; bound with a watermark on an arrival-time column in a
    real continuous deployment). This is the continuous-ingest twin
    of ``curate``'s front half: documents stream in, gated and
    scrubbed documents stream out, near-dup removal runs as a
    periodic batch compaction downstream (LSH state is not
    stream-shaped). availableNow → memory sink; returns the curated
    table. Equivalence with the batch stages is pinned by test."""

    from .util import stream_parquet

    from .text import (quality_score, redact_pii, token_count)

    stream = stream_parquet(spark, src_dir)
    out = (stream
           .withColumn("n_tok", token_count(F.col("text")))
           .withColumn("quality", quality_score(F.col("text")))
           .where((F.col("n_tok") >= min_tokens)
                  & (F.col("quality") >= min_quality))
           .withColumn("text", redact_pii(F.col("text")))
           .withColumn("__h", F.md5(F.col("text")))
           .dropDuplicates(["__h"])
           .drop("__h"))
    q = (out.writeStream.format("memory").queryName(table)
         .outputMode("append").trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(
            "curate_stream did not finish within 120s — refusing to "
            "return a partially populated memory table")
    return spark.table(table)


def curate_v2(documents: DataFrame, min_quality: float = 0.3,
              min_tokens: int = 5, substr_n: int = 8,
              jaccard_n: int = 3, jaccard_threshold: float = 0.12,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """The full modern curation chain, every stage deterministic
    relational algebra so the WHOLE composition is SQL-replayable and
    hash-checkable end-to-end:

        quality + token gate  →  PII scrub  →  exact dedup  →
        duplicated-substring scrub (ExactSubstr)  →  exact n-gram
        near-dup removal over the SCRUBBED text  →  curated corpus

    Near-dup runs on the scrubbed text deliberately: cutting shared
    boilerplate spans first is what lets genuinely-distinct documents
    that merely shared a header survive the Jaccard stage.  Documents
    scrubbed to empty are dropped.  `curate` (MinHash-LSH) remains
    the 100 TB path for the near-dup stage; every other stage here IS
    the scale path already (linear, no pairwise joins)."""
    return _curate_v2_stages(documents, min_quality, min_tokens,
                             substr_n, jaccard_n, jaccard_threshold,
                             text_col, id_col)["final"]


def _curate_v2_stages(documents, min_quality, min_tokens, substr_n,
                      jaccard_n, jaccard_threshold, text_col,
                      id_col) -> dict:
    """The curate_v2 stage DataFrames, exposed for the lineage
    ledger: gated → exact → kept (post-scrub, non-empty) → final.
    Composed from the SAME stage builders as v3 (review r8: a fix to
    the shared gate/scrub logic must move both pipelines and both
    oracles in lockstep)."""
    head = _gate_exact_stages(documents, min_quality, min_tokens,
                              text_col, id_col)
    tail = _scrub_neardup_stages(
        head["exact"].select(id_col, text_col), substr_n, jaccard_n,
        jaccard_threshold, text_col, id_col)
    return {**head, **tail}


def curate_v3(documents: DataFrame, min_quality: float = 0.3,
              min_tokens: int = 5, substr_n: int = 8,
              jaccard_n: int = 3, jaccard_threshold: float = 0.12,
              line_min_df: int = 2,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """curate_v2 extended with the r7 operators, in the order the
    CCNet/RefinedWeb pipelines that motivated them run (VERDICT r7
    #5): Unicode normalization FIRST (so gating/hashing/shingling all
    see canonical text) and boilerplate line dedup BEFORE near-dup
    (so a shared banner can't fuse distinct documents into pairs):

        NFC normalize + control strip  →  quality + token gate  →
        PII scrub  →  exact dedup  →  boilerplate line dedup
        (drop lines in ≥ line_min_df distinct docs; docs reduced to
        empty are dropped)  →  duplicated-substring scrub
        (ExactSubstr)  →  exact n-gram near-dup removal  →  corpus

    Every stage stays deterministic relational algebra (the one
    Python stage is normalize's Arrow batch), so the WHOLE seven-
    stage composition replays as ONE DuckDB statement and is
    hash-checked end-to-end (`doc_curation_v3`). Scale shape: each
    added stage is linear — normalization is one Arrow pass,
    line dedup is two narrow hash shuffles + a broadcast-able anti
    join (llm/dedup.py drop_common_lines); `curate` (MinHash-LSH)
    remains the 100 TB swap-in for the near-dup stage."""
    return _curate_v3_stages(documents, min_quality, min_tokens,
                             substr_n, jaccard_n, jaccard_threshold,
                             line_min_df, text_col, id_col)["final"]


def _gate_exact_stages(src, min_quality, min_tokens, text_col,
                       id_col) -> dict:
    """Shared v2/v3 head: quality+token gate → PII scrub → exact
    dedup (checkpointed — the exact subtree feeds the span index,
    the token explode, the scrub join, and the near-dup shingles;
    without a checkpoint Spark recomputes the gate+md5 chain once
    per consumer)."""
    c = F.col(text_col)
    toks = F.col("__toks")
    analyzed = (src.withColumn("__toks", TX.tokens(c))
                .withColumns({
                    "n_tokens": F.size(toks),
                    "quality": TX.quality_score_from(
                        c, toks, n_the=TX.the_count(c)),
                }).drop("__toks"))
    gated = analyzed.where((F.col("quality") >= min_quality)
                           & (F.col("n_tokens") >= min_tokens))
    red = gated.withColumn(text_col, TX.redact_pii(c))
    exact = DD.dedup_exact(red, text_col, id_col) \
        .localCheckpoint(eager=False)
    return {"gated": gated, "exact": exact}


def _scrub_neardup_stages(src, substr_n, jaccard_n,
                          jaccard_threshold, text_col,
                          id_col) -> dict:
    """Shared v2/v3 tail: ExactSubstr scrub (docs scrubbed to empty
    drop) → exact n-gram near-dup removal over the SCRUBBED text."""
    scrub = DD.scrub_duplicate_spans(
        src, n=substr_n, text_col=text_col, id_col=id_col)
    kept = scrub.where(F.col("n_tok_after") > 0) \
                .localCheckpoint(eager=False)
    pairs = DD.ngram_jaccard_pairs(kept, n=jaccard_n,
                                   threshold=jaccard_threshold,
                                   text_col=text_col, id_col=id_col)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    final = kept.join(drop, id_col, "left_anti")
    return {"kept": kept, "final": final}


def _fate_ledger(documents, id_col, stages) -> DataFrame:
    """Per-document fate from ordered stage memberships: the first
    stage a doc is MISSING from names its fate; survivors are
    'kept'. Narrow id-only left joins over the stage outputs."""
    out = documents.select(id_col)
    expr = None
    for i, (df, label) in enumerate(stages):
        flag = f"_s{i}"
        out = out.join(df.select(F.col(id_col),
                                 F.lit(True).alias(flag)),
                       id_col, "left")
        w = F.col(flag).isNull()
        expr = (F.when(w, label) if expr is None
                else expr.when(w, label))
    return out.select(id_col, expr.otherwise("kept").alias("fate"))


def _curate_v3_stages(documents, min_quality, min_tokens, substr_n,
                      jaccard_n, jaccard_threshold, line_min_df,
                      text_col, id_col) -> dict:
    """The curate_v3 stage DataFrames, exposed for the lineage
    ledger: gated → exact → lined (post-line-dedup, non-empty) →
    kept (post-scrub, non-empty) → final."""
    normed = (TX.normalize_text(documents, text_col=text_col,
                                id_col=id_col)
              .select(F.col("doc_id").alias(id_col),
                      F.col("text_norm").alias(text_col)))
    head = _gate_exact_stages(normed, min_quality, min_tokens,
                              text_col, id_col)
    lines = DD.drop_common_lines(
        head["exact"].select(id_col, text_col),
        min_df=line_min_df, text_col=text_col, id_col=id_col)
    lined = (lines.where(F.length(F.col("text")) > 0)
             .select(F.col("doc_id").alias(id_col),
                     F.col("text").alias(text_col))
             .localCheckpoint(eager=False))
    tail = _scrub_neardup_stages(lined, substr_n, jaccard_n,
                                 jaccard_threshold, text_col, id_col)
    return {**head, "lined": lined, **tail}


def curate_v3_ledger(documents: DataFrame, min_quality: float = 0.3,
                     min_tokens: int = 5, substr_n: int = 8,
                     jaccard_n: int = 3,
                     jaccard_threshold: float = 0.12,
                     line_min_df: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """curate_v2_ledger extended to the v3 fates: every input doc
    labeled kept / dropped_gate / dropped_exact_dup /
    boilerplate_empty (every line was shared boilerplate) /
    scrubbed_empty / dropped_near_dup."""
    st = _curate_v3_stages(documents, min_quality, min_tokens,
                           substr_n, jaccard_n, jaccard_threshold,
                           line_min_df, text_col, id_col)
    return _fate_ledger(documents, id_col, [
        (st["gated"], "dropped_gate"),
        (st["exact"], "dropped_exact_dup"),
        (st["lined"], "boilerplate_empty"),
        (st["kept"], "scrubbed_empty"),
        (st["final"], "dropped_near_dup")])


def curate_v2_ledger(documents: DataFrame, min_quality: float = 0.3,
                     min_tokens: int = 5, substr_n: int = 8,
                     jaccard_n: int = 3,
                     jaccard_threshold: float = 0.12,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document curation lineage: EVERY input document labeled
    with its fate through the v2 pipeline — kept, dropped_gate,
    dropped_exact_dup, scrubbed_empty, or dropped_near_dup. The
    audit trail a data-governance review (or a "why was my document
    removed?" ticket) needs; four id-only left joins over the stage
    memberships, so the ledger costs the pipeline plus narrow
    id-set joins."""
    st = _curate_v2_stages(documents, min_quality, min_tokens,
                           substr_n, jaccard_n, jaccard_threshold,
                           text_col, id_col)
    return _fate_ledger(documents, id_col, [
        (st["gated"], "dropped_gate"),
        (st["exact"], "dropped_exact_dup"),
        (st["kept"], "scrubbed_empty"),
        (st["final"], "dropped_near_dup")])


def cap_per_domain(df: DataFrame, n: int = 100,
                   domain_col: str = "source",
                   text_col: str = "text",
                   id_col: str = "doc_id",
                   pre_reduce_salts: int = 32) -> DataFrame:
    """Per-domain document cap — the standard web-corpus diversity
    control (a handful of mega-domains otherwise dominate the token
    budget): keep the top ``n`` documents of EACH domain by quality
    score (ties broken by id, so the survivor set is deterministic
    and replayable). Returns survivors with their quality and
    within-domain rank.

    Plan (two-phase, VERDICT r8 #3): a per-domain top-N window alone
    concentrates a mega-domain's rows in ONE task (AQE skew splitting
    applies to shuffle joins, NOT window partitions) — a
    30%-of-corpus domain is a 30%-of-corpus task. Phase 1 therefore
    pre-reduces under a SALTED window partitioned by (domain,
    xxhash64(id) % pre_reduce_salts): at most ``n`` rows per salt
    bucket survive, bounding the worst task at |domain|/salts and the
    phase-2 input at n × salts rows per domain. Phase 2 runs the
    exact window on that reduced set. Output is IDENTICAL to the
    one-window plan: every row of the true per-domain top-n is also
    in the top-n of its own salt bucket (its bucket holds a subset of
    its superiors), so pre-reduction drops no survivor; and each
    survivor's superiors all survive phase 1, so phase-2 ranks equal
    global ranks. The quality score is computed ONCE (phase 1, pure
    JVM projection) and carried, never recomputed.
    ``pre_reduce_salts=1`` degenerates to the single-window plan."""
    from pyspark.sql import Window

    q = TX.quality_score(F.col(text_col))
    scored = (df.withColumn("quality", F.round(q, 6))
              .select(id_col, domain_col, "quality"))
    if pre_reduce_salts > 1:
        ws = (Window.partitionBy(domain_col, "_salt")
              .orderBy(F.desc("quality"), F.col(id_col)))
        scored = (scored
                  .withColumn("_salt",
                              F.pmod(F.xxhash64(F.col(id_col)),
                                     F.lit(pre_reduce_salts)))
                  .withColumn("_pr", F.row_number().over(ws))
                  .where(F.col("_pr") <= n)
                  .drop("_salt", "_pr"))
    w = (Window.partitionBy(domain_col)
         .orderBy(F.desc("quality"), F.col(id_col)))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= n)
            .select(id_col, domain_col, "quality", "rank"))


def corpus_diff(old: DataFrame, new: DataFrame,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Snapshot diff between two corpus versions — the audit a
    rolling continuous-ingest corpus needs before retraining: which
    documents were added, removed, or changed (content fingerprint
    moved), and which are unchanged.

    Returns (id_col, status ∈ {added, removed, changed, unchanged},
    old_fp, new_fp) with the shared rolling-hash fingerprints (NULL
    on the missing side). Plan shape: each side reduces to narrow
    (id, fp) rows — the TEXT never crosses the join — then ONE
    full-outer hash join on id. At 100 TB both sides are
    id-partitioned scans; the join is the only shuffle and carries
    16 bytes per row."""
    from .text import poly_hash

    # presence comes from EXPLICIT marker columns, not fingerprint
    # nullability — a NULL-text document (legal in any user parquet)
    # has a NULL fingerprint while being perfectly present, and must
    # not masquerade as added/removed (review r9c). eqNullSafe keeps
    # NULL-text-on-both-sides as 'unchanged'.
    o = old.select(F.col(id_col).alias("id"),
                   poly_hash(F.col(text_col)).alias("old_fp"),
                   F.lit(True).alias("__in_old"))
    n = new.select(F.col(id_col).alias("id"),
                   poly_hash(F.col(text_col)).alias("new_fp"),
                   F.lit(True).alias("__in_new"))
    j = o.join(n, "id", "full_outer")
    status = (F.when(F.col("__in_old").isNull(), F.lit("added"))
              .when(F.col("__in_new").isNull(), F.lit("removed"))
              .when(F.col("old_fp").eqNullSafe(F.col("new_fp")),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(F.col("id").alias(id_col),
                    status.alias("status"), "old_fp", "new_fp")


def quality_quantile_gate(df: DataFrame, keep_frac: float = 0.75,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Adaptive quality gate: keep the TOP ``keep_frac`` of documents
    by quality score, with the cutoff computed from the corpus itself
    (exact percentile) rather than a fixed threshold — fixed
    thresholds drift across corpora; quantile gates don't. Ties at
    the cutoff keep (>=), so the kept fraction can slightly exceed
    keep_frac on tied scores — deterministic either way.

    Plan: one exact-percentile aggregate (1 row, broadcast) + the
    filter; the corpus never sorts globally. Returns the surviving
    rows plus the quality and cutoff columns."""
    q = TX.quality_score(F.col(text_col))
    scored = df.withColumn("quality", F.round(q, 6))
    cut = scored.agg(
        F.expr(f"percentile(quality, {1.0 - keep_frac})")
        .alias("cutoff"))
    return (scored.crossJoin(F.broadcast(cut))
            .where(F.col("quality") >= F.col("cutoff"))
            .withColumn("cutoff", F.round("cutoff", 6)))
