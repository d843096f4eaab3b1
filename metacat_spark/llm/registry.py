"""Shared op → builder registry for the corpus/events analytics
surfaces.

`cli.py` (argparse) and `server.py` (HTTP query params) both dispatch
through THESE tables, so the op set and every op's parameter
semantics cannot drift between the two surfaces (they did once —
VERDICT r6 #3). Each builder is a pure function from an
:class:`OpContext` (surface-independent inputs + parameters) to an
unexecuted DataFrame; consumption (json-seq streaming, parquet
write, bounded print) stays surface-specific.

Out of registry scope, deliberately:
- ``publish`` / ``verify-manifest`` (CLI-only): filesystem actions,
  not DataFrame builders — and exposing corpus publication over a
  GET endpoint would reintroduce the mutating-GET hole closed in r6.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class OpError(Exception):
    """User-facing parameter/authorization error raised while
    building an op. ``status`` follows HTTP semantics (400 bad
    parameters, 403 forbidden path); the CLI maps any OpError to a
    non-zero exit."""

    def __init__(self, msg: str, status: int = 400):
        super().__init__(msg)
        self.status = status


# ValueErrors raised INSIDE executor tasks (cheap in-task checks that
# would cost an extra Spark job per healthy serve if run driver-side —
# review r10 moved them into the task). Spark wraps them in an opaque
# PythonException at EXECUTION time, after the op builder has already
# returned its lazy DataFrame, so the OpError mapping happens at the
# surfaces' execution boundary via op_error_from_task (ADVICE r10).
_TASK_ERROR_MARKERS = (
    "rerank=True but a postings row has no stored member vector",
)


def op_error_from_task(e: BaseException):
    """Translate a known in-task ValueError (wrapped by Spark in a
    PythonException/Py4JJavaError whose str() is a full remote
    traceback) back into the clean OpError→400 contract every
    driver-side misuse check uses. Returns None for unrecognized
    exceptions so callers re-raise or fall through to their generic
    handler."""
    text = str(e)
    for marker in _TASK_ERROR_MARKERS:
        if marker in text:
            return OpError(marker)
    return None


class OpContext:
    """Surface-independent inputs for op builders.

    - ``docs`` / ``embs`` / ``events``: zero-arg callables returning
      the primary DataFrames (lazy — an op that never touches
      embeddings must not force an embeddings read).
    - ``params``: raw parameter mapping. HTTP passes strings, the
      CLI passes argparse-typed values; the typed getters normalize
      both and raise OpError on malformed values.
    - ``load_corpus``: callable(path) -> DataFrame for SECONDARY
      corpora (test sets, admission baselines). The server wraps
      this with its --data-root path jail (raising OpError 403);
      the CLI reads any local path.
    - ``local_fs``: True only on the CLI — ops that WRITE to
      caller-supplied filesystem paths (ann --ingest appending a
      postings table) must refuse on the HTTP surface, where a
      remote client would otherwise direct server-side writes.
    """

    def __init__(self, *, docs: Callable[[], DataFrame] | None = None,
                 embs: Callable[[], DataFrame] | None = None,
                 events: Callable[[], DataFrame] | None = None,
                 params: dict | None = None,
                 load_corpus: Callable[[str], DataFrame] | None = None,
                 corpus_path: Callable[[str], str] | None = None,
                 local_fs: bool = False):
        self._docs, self._embs, self._events = docs, embs, events
        self.params = params or {}
        self._load_corpus = load_corpus
        self._corpus_path = corpus_path
        self.local_fs = local_fs

    def docs(self) -> DataFrame:
        if self._docs is None:
            raise OpError("documents table unavailable on this surface")
        return self._docs()

    def embs(self) -> DataFrame:
        if self._embs is None:
            raise OpError("embeddings table unavailable on this surface")
        return self._embs()

    def events(self) -> DataFrame:
        if self._events is None:
            raise OpError("events table unavailable on this surface")
        return self._events()

    def corpus(self, path: str) -> DataFrame:
        if self._load_corpus is None:
            raise OpError("secondary corpus loading unavailable on "
                          "this surface")
        return self._load_corpus(path)

    def corpus_path(self, path: str) -> str:
        """Validate a client-supplied filesystem path that will be
        read DIRECTLY (streaming sources) instead of loaded through
        ``load_corpus``. FAIL-CLOSED: a surface must explicitly
        install a validator (the HTTP server installs its --data-root
        jail, the CLI installs identity — local-user trust model);
        with none installed the op errors rather than silently
        bypassing the jail."""
        if self._corpus_path is None:
            raise OpError("streaming source paths unavailable on "
                          "this surface")
        return self._corpus_path(path)

    # --- typed parameter getters ------------------------------------
    def param(self, name: str, default=None):
        v = self.params.get(name)
        return default if v is None else v

    def require(self, name: str, hint: str) -> str:
        v = self.params.get(name)
        if v in (None, ""):
            raise OpError(hint)
        return v

    def int_param(self, name: str, default: int | None = None):
        v = self.param(name, default)
        if v is None:
            return None
        try:
            return int(v)
        except (TypeError, ValueError):
            raise OpError(f"{name} must be an integer, got {v!r}")

    def float_param(self, name: str, default: float | None = None):
        v = self.param(name, default)
        if v is None:
            return None
        try:
            return float(v)
        except (TypeError, ValueError):
            raise OpError(f"{name} must be a number, got {v!r}")

    def flag(self, name: str) -> bool:
        """Presence-with-truthy-value semantics: 'v2=no' must NOT
        enable v2 (review r6); argparse store_true booleans pass
        through."""
        v = self.params.get(name)
        if isinstance(v, bool):
            return v
        if v is None:
            return False
        return str(v).strip().lower() in ("1", "true", "yes", "on")

    def choice(self, name: str, allowed: tuple, default: str) -> str:
        v = str(self.param(name, default))
        if v not in allowed:
            raise OpError(f"unknown {name}: {v}")
        return v


def _kv_floats(spec: str, what: str) -> dict:
    """'en=0.6,de=0.4' → {'en': 0.6, 'de': 0.4}; tolerates trailing
    commas; raises OpError on malformed values."""
    out = {}
    for part in (spec or "").split(","):
        k, _, v = part.partition("=")
        if not k.strip():
            continue
        try:
            out[k.strip()] = float(v)
        except ValueError:
            raise OpError(f"{what}: bad weight {part!r}")
    return out


# ---------------------------------------------------------------------
# corpus ops
# ---------------------------------------------------------------------

CORPUS_OPS: dict[str, Callable[[OpContext], DataFrame]] = {}
EVENT_OPS: dict[str, Callable[[OpContext], DataFrame]] = {}


def _corpus_op(name):
    def reg(fn):
        CORPUS_OPS[name] = fn
        return fn
    return reg


def _event_op(name):
    def reg(fn):
        EVENT_OPS[name] = fn
        return fn
    return reg


@_corpus_op("analyze")
def _op_analyze(ctx: OpContext) -> DataFrame:
    from .text import analyze
    return analyze(ctx.docs())


@_corpus_op("quality")
def _op_quality(ctx: OpContext) -> DataFrame:
    from .pipeline import repetition_scores
    from .text import quality_score
    docs = ctx.docs()
    return (docs.select("doc_id",
                        quality_score(F.col("text")).alias("quality"))
            .join(repetition_scores(docs), "doc_id"))


@_corpus_op("dedup")
def _op_dedup(ctx: OpContext) -> DataFrame:
    from . import dedup as DD
    docs = ctx.docs()
    method = ctx.choice("method",
                        ("exact", "minhash", "ngram", "simhash",
                         "semantic", "semantic-text", "containment",
                         "substring"), "exact")
    thr = ctx.float_param("threshold", 0.5)
    recall = ctx.flag("recall")
    if recall and method not in ("minhash", "simhash",
                                 "containment"):
        # the gauge compares an APPROXIMATE pair method to the exact
        # n-gram Jaccard truth — on exact/row-level methods it would
        # silently gauge nothing (loud-flag contract)
        raise OpError("dedup: --recall applies to the approximate "
                      "pair methods (minhash, simhash, containment)")

    def gauged(pairs):
        # precision/recall vs the exact Jaccard pairs at the same
        # threshold — the measure-before-trust verb for a banding/
        # hashing configuration (r11; same pattern as ann --recall)
        if not recall:
            return pairs
        return DD.dedup_pair_metrics(
            pairs, DD.ngram_jaccard_pairs(docs, threshold=thr))

    if method == "exact":
        return DD.dedup_exact(docs)
    if method == "minhash":
        return gauged(DD.minhash_lsh_pairs(docs, threshold=thr))
    if method == "semantic":
        return DD.semantic_dedup(docs, ctx.embs(), threshold=thr)
    if method == "semantic-text":
        return DD.semantic_dedup_text(docs)
    if method == "containment":
        return gauged(DD.ngram_containment_pairs(docs,
                                                 threshold=thr))
    if method == "simhash":
        return gauged(DD.simhash_pairs(
            docs, max_hamming=ctx.int_param("max_hamming", 3)))
    if method == "substring":
        return DD.duplicate_spans(docs, n=ctx.int_param("ngram", 8))
    return DD.ngram_jaccard_pairs(docs, threshold=thr)


@_corpus_op("semdedup")
def _op_semdedup(ctx: OpContext) -> DataFrame:
    from . import dedup as DD
    return DD.semantic_dedup(ctx.docs(), ctx.embs(),
                             threshold=ctx.float_param("threshold", 0.9))


@_corpus_op("admit")
def _op_admit(ctx: OpContext) -> DataFrame:
    from . import dedup as DD
    path = ctx.require("corpus", "admit needs corpus=<path of the "
                                 "existing corpus> (docs are the "
                                 "new batch)")
    return DD.dedup_against(ctx.docs(), ctx.corpus(path))


def _test_corpus(ctx: OpContext, op: str) -> DataFrame:
    path = ctx.require(
        "test", f"{op} needs test=<parquet path of the other corpus> "
                "(served docs are the train/B side)")
    return ctx.corpus(path)


@_corpus_op("contamination")
def _op_contamination(ctx: OpContext) -> DataFrame:
    from . import dedup as DD
    test = _test_corpus(ctx, "contamination")
    docs = ctx.docs()
    method = ctx.choice("method",
                        ("exact", "jaccard", "containment", "lsh"),
                        "exact")
    thr = ctx.float_param("threshold", 0.5)
    if method == "exact":
        return DD.cross_corpus_exact(test, docs)
    fn = {"jaccard": DD.cross_corpus_jaccard,
          "containment": DD.cross_corpus_containment,
          "lsh": DD.cross_corpus_lsh}[method]
    return fn(test, docs, threshold=thr)


@_corpus_op("decontaminate")
def _op_decontaminate(ctx: OpContext) -> DataFrame:
    """Default method = containment (the published eval-
    decontamination shape); threshold passes through only when the
    caller set one, so each method keeps its own signature default
    (containment 0.8, jaccard/lsh 0.5) on BOTH surfaces (review r7:
    the CLI and HTTP surfaces had drifted to containment@0.8 vs
    exact@0.5)."""
    from . import dedup as DD
    test = _test_corpus(ctx, "decontaminate")
    method = ctx.choice("method",
                        ("exact", "jaccard", "containment", "lsh",
                         "novelty"),
                        "containment")
    kw = {}
    if method != "exact":
        t = ctx.float_param("threshold")
        if t is not None:
            kw["threshold"] = t
    return DD.decontaminate(ctx.docs(), test, method=method, **kw)


@_corpus_op("divergence")
def _op_divergence(ctx: OpContext) -> DataFrame:
    """Side A = the primary docs, side B = the test= corpus (the CLI
    convention; the old HTTP handler had them swapped, so this is a
    DELIBERATE breaking change for HTTP clients reading the two
    directional columns: kl_a_m is now KL(served docs ‖ mixture) and
    kl_b_m KL(test ‖ mixture). js_divergence and n_terms_union are
    symmetric and unaffected)."""
    from .text import corpus_divergence, divergent_terms
    test = _test_corpus(ctx, "divergence")
    docs = ctx.docs()
    k = ctx.int_param("top_terms", 0)
    if k:
        return divergent_terms(docs, test, k=k)
    return corpus_divergence(docs, test)


@_corpus_op("report")
def _op_report(ctx: OpContext) -> DataFrame:
    from .pipeline import source_report
    return source_report(ctx.docs())


@_corpus_op("stats")
def _op_stats(ctx: OpContext) -> DataFrame:
    from .text import corpus_stats
    return corpus_stats(ctx.docs())


@_corpus_op("novelty")
def _op_novelty(ctx: OpContext) -> DataFrame:
    # r14 per-doc n-gram novelty vs a reference corpus — the
    # memorization/train-overlap gauge (served docs are measured;
    # the reference collapses to one distinct shingle set, no pair
    # explosion like contamination's test x train space)
    from .dedup import ngram_novelty
    path = ctx.require(
        "reference",
        "novelty needs reference=<parquet path of the reference "
        "corpus> (served docs are measured against it)")
    n = ctx.int_param("n", 13)
    if n < 1:
        raise OpError(f"novelty: n must be >= 1, got {n}")
    return ngram_novelty(ctx.docs(), ctx.corpus(path), n=n)


@_corpus_op("decode-coverage")
def _op_decode_coverage(ctx: OpContext) -> DataFrame:
    # r14 codec-coverage gauge: real-decode vs fallback rate per
    # sniffed container. --input pointing at a real asset table
    # (binary `content` column) measures that corpus; without one,
    # the documents table is synthesized into the deterministic
    # asset fixture (text bytes as payloads) — the plumbing check.
    # --ingest <src> streams an asset dir and emits the per-batch
    # drift gauge instead (bounded rows, so it serves on BOTH
    # surfaces; --sink persists the history, CLI only)
    from .multimodal import (decode_coverage, decode_coverage_stream,
                             synthesize_assets)
    ingest = ctx.param("ingest")
    sink = ctx.param("sink")
    if ctx.param("timeout") is not None and ingest is None:
        raise OpError("decode-coverage: --timeout applies to "
                      "--ingest")
    if sink is not None and ingest is None:
        raise OpError("decode-coverage: --sink applies to --ingest")
    if ingest is not None:
        if sink is not None and not ctx.local_fs:
            raise OpError("decode-coverage: --sink writes the gauge "
                          "history to a caller-supplied path — CLI "
                          "only", status=403)
        src = ctx.corpus_path(str(ingest))
        return decode_coverage_stream(
            ctx.docs().sparkSession, src,
            sink_dir=None if sink is None else str(sink),
            timeout_s=ctx.int_param("timeout", 120))
    docs = ctx.docs()
    if "content" in docs.columns:
        return decode_coverage(docs)
    return decode_coverage(synthesize_assets(docs))


@_corpus_op("select")
def _op_select(ctx: OpContext) -> DataFrame:
    from .pipeline import select_token_budget
    ctx.require("budget", "select needs budget=<tokens>")
    return select_token_budget(ctx.docs(), ctx.int_param("budget"))


@_corpus_op("cluster-sample")
def _op_cluster_sample(ctx: OpContext) -> DataFrame:
    # semantic-diversity selection (r13): bounded per-cluster sample
    # over the embeddings (or hashed doc vectors with --hashed);
    # --index serves a stored build_ivf_centroids artifact, else
    # training runs inline — the ann train-once/serve-many shape.
    # r14 lifecycle verbs over a stored artifact: --stats (the
    # occupancy/skew gauge) and --ingest <src> --sink <dir> (the
    # streaming assignment twin, CLI only like ann --ingest)
    from .similarity import (cluster_assign_stream,
                             cluster_balanced_sample,
                             cluster_sample_stats,
                             hashed_doc_vectors)
    stats = ctx.flag("stats")
    ingest = ctx.param("ingest")
    idx = ctx.param("index")
    if stats and ingest is not None:
        raise OpError("cluster-sample: conflicting verbs --stats, "
                      "--ingest — pick one")
    # verb-scoped options are loud when their verb is absent (the
    # standing loud-flag contract): a silently dropped option would
    # misstate what ran
    if (stats or ingest is not None) and (
            ctx.param("per_cluster") is not None
            or ctx.param("by") is not None):
        raise OpError("cluster-sample: --per-cluster/--by apply to "
                      "the sampling verb, not --stats/--ingest")
    if ctx.param("balance_threshold") is not None and not stats:
        raise OpError("cluster-sample: --balance-threshold applies "
                      "to --stats")
    if ctx.param("timeout") is not None and ingest is None:
        raise OpError("cluster-sample: --timeout applies to "
                      "--ingest")
    if ctx.param("sink") is not None and ingest is None:
        raise OpError("cluster-sample: --sink applies to --ingest")
    if ctx.flag("hashed"):
        if ingest is not None:
            raise OpError("cluster-sample: --ingest streams "
                          "embedding rows; --hashed does not apply")
        df = hashed_doc_vectors(ctx.docs())
        kw = {"vec_col": "vector", "id_col": "doc_id"}
    else:
        df = ctx.embs()
        kw = {}
    if ctx.param("clusters") is not None and idx is not None:
        # a stored artifact fixes the cluster count — silently
        # dropping --clusters would misstate what ran (loud-flag)
        raise OpError("cluster-sample: --clusters applies to inline "
                      "training; --index serves a stored artifact")
    if stats:
        if idx is None:
            raise OpError("cluster-sample: --stats gauges a STORED "
                          "centroid artifact — pass --index")
        try:
            return cluster_sample_stats(
                df, ctx.corpus(str(idx)),
                balance_threshold=ctx.float_param(
                    "balance_threshold", 4.0),
                vec_col=kw.get("vec_col", "embedding"))
        except ValueError as e:
            raise OpError(str(e))
    if ingest is not None:
        sink = ctx.param("sink")
        if idx is None or sink is None:
            raise OpError("cluster-sample: --ingest needs --index "
                          "<stored centroid artifact> and --sink "
                          "<destination dir for the assigned rows>")
        if not ctx.local_fs:
            raise OpError("cluster-sample: --ingest writes assigned "
                          "rows to a caller-supplied path — CLI "
                          "only", status=403)
        src = ctx.corpus_path(str(ingest))
        return cluster_assign_stream(
            ctx.embs().sparkSession, src, ctx.corpus(str(idx)),
            sink_dir=str(sink),
            timeout_s=ctx.int_param("timeout", 120))
    try:
        return cluster_balanced_sample(
            df, per_cluster=ctx.int_param("per_cluster", 50),
            n_clusters=ctx.int_param("clusters", 16),
            centroids=None if idx is None else ctx.corpus(str(idx)),
            order_col=ctx.param("by"), **kw)
    except ValueError as e:
        raise OpError(str(e))


@_corpus_op("lm")
def _op_lm(ctx: OpContext) -> DataFrame:
    from .text import bigram_logprob, unigram_logprob
    method = ctx.choice("method", ("unigram", "bigram"), "bigram")
    return (bigram_logprob if method == "bigram"
            else unigram_logprob)(ctx.docs())


@_corpus_op("moorelewis")
def _op_moorelewis(ctx: OpContext) -> DataFrame:
    # Moore-Lewis cross-entropy-difference selection: served docs are
    # the RAW pool, target= is the in-domain corpus to select toward
    from .text import moore_lewis_scores
    path = ctx.require(
        "target", "moorelewis needs target=<parquet path of the "
                  "in-domain corpus> (served docs are the raw pool)")
    return moore_lewis_scores(ctx.docs(), ctx.corpus(path))


@_corpus_op("search")
def _op_search(ctx: OpContext) -> DataFrame:
    # BM25 keyword search; library ValueError (e.g. whitespace-only
    # query) surfaces as OpError so both surfaces keep the clean
    # bad-parameter contract (review r9). r11 index verbs (the
    # train-once/serve-many split): --build-index emits the
    # persistable inverted index (write with -o), --index serves
    # queries from a stored one, --extend adds the served corpus to
    # a stored index (write the merged artifact with -o).
    from .search import (build_text_index, build_text_index_stream,
                         compact_text_index, extend_text_index,
                         search_bm25, search_text_index,
                         search_text_index_many, shrink_text_index,
                         text_index_stats, upsert_text_index)
    build = ctx.flag("build_index")
    extend = ctx.flag("extend")
    shrink = ctx.flag("shrink")
    upsert = ctx.flag("upsert")
    verify = ctx.flag("verify_index")
    compact = ctx.flag("compact_index")
    ingest = ctx.param("ingest")
    idx = ctx.param("index")
    many = ctx.param("queries")
    if build and (idx is not None or extend or shrink or upsert
                  or verify or compact or ingest is not None
                  or many is not None):
        raise OpError("search: --build-index creates a NEW index — "
                      "it cannot take --index/--extend/--shrink/"
                      "--upsert/--verify-index/--compact-index/"
                      "--ingest/--queries")
    if ctx.param("max_parts") is not None and not verify:
        # BEFORE the ingest branch (review r13: placed after it,
        # `--ingest --max-parts` silently dropped the flag)
        raise OpError("search: --max-parts applies to "
                      "--verify-index (the compact_recommended "
                      "threshold)")
    if ingest is not None:
        # streaming build: parquet-appends index fragments to the
        # --index dir (append-is-extend, r12). Caller-supplied write
        # path — CLI only, like ann --ingest.
        if extend or shrink or upsert or verify or compact \
                or many is not None \
                or ctx.param("query") is not None:
            raise OpError("search: --ingest conflicts with the "
                          "other index verbs and --query/--queries")
        if idx is None:
            raise OpError("search: --ingest needs --index "
                          "<destination index dir for the streamed "
                          "fragments>")
        if not ctx.local_fs:
            raise OpError(
                "search: --ingest writes an index to a "
                "caller-supplied path — CLI only", status=403)
        src = ctx.corpus_path(str(ingest))
        try:
            return build_text_index_stream(
                ctx.docs().sparkSession, src, str(idx),
                timeout_s=ctx.int_param("timeout", 300))
        except ValueError as e:
            raise OpError(str(e))
    if ctx.param("timeout") is not None:
        # mirror of ann's check (ADVICE r12): --timeout only bounds
        # the --ingest drain — silently ignoring it on other verbs
        # violates the loud-flag contract
        raise OpError("search: --timeout applies to --ingest")
    edits = [v for v, on in (("--extend", extend),
                             ("--shrink", shrink),
                             ("--upsert", upsert),
                             ("--verify-index", verify),
                             ("--compact-index", compact)) if on]
    if len(edits) > 1:
        raise OpError(f"search: conflicting verbs "
                      f"{', '.join(edits)} — pick one")
    if ((build or edits)
            and ctx.param("query") is not None):
        raise OpError("search: index verbs take no --query "
                      "(serve with --index --query)")
    if many is not None:
        # batched serving (r12): ONE plan over the union of the
        # batch's terms — index-only (a corpus-scan per batch would
        # defeat the point) and exclusive with --query / edit verbs
        if ctx.param("query") is not None or edits:
            raise OpError("search: --queries is the batched serve — "
                          "it conflicts with --query and the index "
                          "edit verbs")
        if idx is None:
            raise OpError("search: --queries needs --index <stored "
                          "index table> (batched serving reads the "
                          "index, never rescans the corpus)")
        batch = {}
        for part in str(many).split(";"):
            part = part.strip()
            if not part:
                continue
            qid, _, terms = part.partition(":")
            if not _ or not qid.strip() or not terms.split():
                raise OpError(
                    f"search: --queries item {part!r} is not "
                    f"'<id>:<space-separated terms>'")
            if qid.strip() in batch:
                raise OpError(f"search: duplicate query id "
                              f"{qid.strip()!r} in --queries")
            batch[qid.strip()] = terms.split()
        if not batch:
            raise OpError("search: --queries is empty — need "
                          "'<id>:<terms>[;<id>:<terms>...]'")
        try:
            return search_text_index_many(ctx.corpus(str(idx)),
                                          batch,
                                          k=ctx.int_param("k", 10))
        except ValueError as e:
            raise OpError(str(e))
    try:
        if build:
            return build_text_index(ctx.docs())
        if edits:
            if idx is None:
                raise OpError(f"search: {edits[0]} needs --index "
                              f"<stored index table>")
            if verify:
                return text_index_stats(
                    ctx.corpus(str(idx)),
                    max_parts=ctx.int_param("max_parts", 32))
            if compact:
                return compact_text_index(ctx.corpus(str(idx)))
            fn = (extend_text_index if extend
                  else shrink_text_index if shrink
                  else upsert_text_index)
            return fn(ctx.corpus(str(idx)), ctx.docs())
        terms = ctx.require(
            "query",
            "search needs query=<space-separated terms>").split()
        if idx is not None:
            return search_text_index(ctx.corpus(str(idx)), terms,
                                     k=ctx.int_param("k", 10))
        return search_bm25(ctx.docs(), terms,
                           k=ctx.int_param("k", 10))
    except ValueError as e:
        raise OpError(str(e))


@_corpus_op("hybrid")
def _op_hybrid(ctx: OpContext) -> DataFrame:
    # hybrid retrieval: BM25 + cosine-vs-a-stored-vector, RRF-fused;
    # a vec_id absent from the embeddings table is a ValueError from
    # the library (not a silent BM25-only result) → OpError here
    # r11 served mode: kwindex= + postings= + vecindex= serve BOTH
    # ranker lists from stored artifacts (inverted index + IVF-PQ
    # postings) — nothing rescans a corpus at query time; the query
    # vector is still fetched by vec_id from the embeddings table
    from .search import _fetch_query_vec, hybrid_from_indexes, \
        hybrid_rrf
    terms = ctx.require(
        "query", "hybrid needs query=<space-separated terms>").split()
    ctx.require("vec", "hybrid needs vec=<query vec_id from the "
                       "embeddings table>")
    kwidx = ctx.param("kwindex")
    posts = ctx.param("postings")
    vidx = ctx.param("vecindex")
    given = [v for v in (kwidx, posts, vidx) if v is not None]
    if given and len(given) != 3:
        raise OpError("hybrid: served mode needs ALL of "
                      "kwindex=/postings=/vecindex= (partial index "
                      "sets would silently half-serve)")
    try:
        if given:
            qvec = _fetch_query_vec(ctx.embs(),
                                    ctx.int_param("vec"),
                                    "embedding", "vec_id", "hybrid")
            return hybrid_from_indexes(
                ctx.docs().sparkSession, ctx.corpus(str(kwidx)),
                ctx.corpus(str(posts)), ctx.corpus(str(vidx)),
                terms, qvec, n=ctx.int_param("n", 50),
                k=ctx.int_param("k", 10),
                n_probe=ctx.int_param("n_probe", 4),
                rerank=bool(ctx.int_param("rerank", 1)))
        return hybrid_rrf(ctx.docs(), ctx.embs(), terms,
                          query_vec_id=ctx.int_param("vec"),
                          n=ctx.int_param("n", 50),
                          k=ctx.int_param("k", 10))
    except ValueError as e:
        raise OpError(str(e))


@_corpus_op("hybrid-stream")
def _op_hybrid_stream(ctx: OpContext) -> DataFrame:
    # streaming hybrid retrieval: drain a documents stream and an
    # embeddings stream into bounded running leaderboards
    # (search_stream_topk / cosine_stream_topk), RRF-fuse the finals.
    # The SERVED static tables supply the BM25 reference statistics
    # and the query vector; the stream paths go through the same
    # filesystem jail as secondary corpora (corpus_path — fail-closed)
    from .search import hybrid_stream_topk
    terms = ctx.require(
        "query",
        "hybrid-stream needs query=<space-separated terms>").split()
    ctx.require("vec", "hybrid-stream needs vec=<query vec_id from "
                       "the embeddings table>")
    docs_src = ctx.corpus_path(ctx.require(
        "src", "hybrid-stream needs src=<documents parquet path to "
               "stream>"))
    vec_src = ctx.corpus_path(ctx.require(
        "vecsrc", "hybrid-stream needs vecsrc=<embeddings parquet "
                  "path to stream>"))
    docs = ctx.docs()
    # per-invocation sink names: the HTTP server handles requests
    # concurrently, and two drains sharing a memory queryName either
    # collide at start() or cross-contaminate the lazily-read
    # leaderboards (review r10)
    import uuid
    table = f"hybrid_stream_{uuid.uuid4().hex[:12]}"
    spark = docs.sparkSession
    # deploy posture (r12): sink=<dir> writes both emission
    # histories to parquet under <dir>/kw and <dir>/vec instead of
    # driver-resident memory sinks. Caller-supplied write path —
    # CLI only, like ann --ingest.
    sink = ctx.param("sink")
    if sink is not None and not ctx.local_fs:
        raise OpError("hybrid-stream: sink= writes leaderboard "
                      "history to a caller-supplied path — CLI "
                      "only", status=403)
    try:
        out = hybrid_stream_topk(
            spark, docs_src, vec_src, terms,
            query_vec_id=ctx.int_param("vec"), stats_from=docs,
            query_from=ctx.embs(), n=ctx.int_param("n", 50),
            k=ctx.int_param("k", 10), table=table,
            sink_dir=None if sink is None else str(sink))
        # the fused result is <= k rows but reads the two memory-sink
        # temp views lazily; materialize it eagerly so the sinks
        # (which hold EVERY intermediate leaderboard emit) can be
        # dropped below — otherwise each request on a long-running
        # server leaks two uuid-named in-memory tables and driver
        # memory grows without bound (ADVICE r10)
        return spark.createDataFrame(out.collect(), out.schema)
    except ValueError as e:
        raise OpError(str(e))
    finally:
        for suffix in ("_kw", "_vec"):
            try:
                spark.catalog.dropTempView(table + suffix)
            except Exception:  # noqa: BLE001 — sink may not exist yet
                pass


@_corpus_op("dsir")
def _op_dsir(ctx: OpContext) -> DataFrame:
    # DSIR hashed-ngram importance weights; m= switches to the
    # Gumbel-top-m resample (selection) output
    from .text import dsir_logweights, dsir_resample
    path = ctx.require(
        "target", "dsir needs target=<parquet path of the in-domain "
                  "corpus> (served docs are the raw pool)")
    buckets = ctx.int_param("buckets", 1024)
    m = ctx.int_param("m")
    if m is None:
        return dsir_logweights(ctx.docs(), ctx.corpus(path),
                               buckets=buckets)
    if m < 1:
        raise OpError(f"dsir: m must be >= 1, got {m}")
    return dsir_resample(ctx.docs(), ctx.corpus(path), m=m,
                         buckets=buckets,
                         seed=ctx.int_param("seed", 42))


@_corpus_op("train")
def _op_train(ctx: OpContext) -> DataFrame:
    # in-engine classifier training: label = (label_col == pos);
    # score=true returns per-doc probabilities instead of weights
    from .train import score_logreg_hashed, train_logreg_hashed
    col = ctx.require("label", "train needs label=<column>")
    pos = ctx.require("pos", "train needs pos=<positive value of "
                             "the label column>")
    docs = ctx.docs().withColumn(
        "__y", (F.col(col).cast("string") == pos).cast("double"))
    try:
        w = train_logreg_hashed(docs, "__y",
                                steps=ctx.int_param("steps", 10),
                                lr=ctx.float_param("lr", 10.0),
                                buckets=ctx.int_param("buckets", 256))
    except ValueError as e:  # e.g. steps < 1
        raise OpError(str(e))
    if not ctx.flag("score"):
        return w
    return score_logreg_hashed(docs, w,
                               buckets=ctx.int_param("buckets", 256))


@_corpus_op("bpe")
def _op_bpe(ctx: OpContext) -> DataFrame:
    # BPE vocabulary learning; encode=true tokenizes the corpus with
    # the learned merges instead of returning the merge table
    from .train import bpe_encode, train_bpe_merges
    cap = ctx.int_param("vocab_cap", 50000)
    if cap < 1:
        raise OpError(f"bpe: vocab_cap must be >= 1, got {cap}")
    merges = train_bpe_merges(
        ctx.docs(), num_merges=ctx.int_param("merges", 100),
        vocab_cap=cap)
    if not ctx.flag("encode"):
        return merges
    return bpe_encode(ctx.docs(), merges)


@_corpus_op("unigram")
def _op_unigram(ctx: OpContext) -> DataFrame:
    # unigram-LM tokenizer (SentencePiece-style): EM-trained piece
    # vocabulary; encode=true Viterbi-tokenizes the corpus with it
    # instead of returning the (piece, logp) table
    from .train import train_unigram, unigram_encode
    cap = ctx.int_param("vocab_cap", 50000)
    size = ctx.int_param("vocab_size", 8000)
    if cap < 1 or size < 1:
        raise OpError(f"unigram: vocab_cap/vocab_size must be >= 1, "
                      f"got {cap}/{size}")
    vocab = train_unigram(ctx.docs(), vocab_size=size, vocab_cap=cap)
    if not ctx.flag("encode"):
        return vocab
    return unigram_encode(ctx.docs(), vocab)


@_corpus_op("tokstats")
def _op_tokstats(ctx: OpContext) -> DataFrame:
    # side-by-side BPE/unigram/WordPiece fertility + compression on
    # this corpus — the tokenizer-selection evaluation verb
    from .train import tokenizer_stats
    cap = ctx.int_param("vocab_cap", 50000)
    size = ctx.int_param("vocab_size", 8000)
    if cap < 1 or size < 1:
        raise OpError(f"tokstats: vocab_cap/vocab_size must be "
                      f">= 1, got {cap}/{size}")
    return tokenizer_stats(ctx.docs(), vocab_size=size,
                           vocab_cap=cap)


@_corpus_op("wordpiece")
def _op_wordpiece(ctx: OpContext) -> DataFrame:
    # WordPiece vocabulary learning (BERT-style likelihood-gain
    # merges); encode=true greedy-longest-match tokenizes the corpus
    # with it instead of returning the (step, piece, score) table
    from .train import train_wordpiece, wordpiece_encode
    cap = ctx.int_param("vocab_cap", 50000)
    size = ctx.int_param("vocab_size", 8000)
    if cap < 1 or size < 1:
        raise OpError(f"wordpiece: vocab_cap/vocab_size must be "
                      f">= 1, got {cap}/{size}")
    vocab = train_wordpiece(ctx.docs(), vocab_size=size,
                            vocab_cap=cap)
    if not ctx.flag("encode"):
        return vocab
    return wordpiece_encode(ctx.docs(), vocab)


@_corpus_op("diff")
def _op_diff(ctx: OpContext) -> DataFrame:
    # snapshot diff: served docs are the OLD version, new= is the
    # newer snapshot ("new" rather than "against": _registry_params
    # renames against→test for the divergence/contamination family)
    from .pipeline import corpus_diff
    path = ctx.require(
        "new", "diff needs new=<parquet path of the NEW corpus "
               "snapshot> (served docs are the old version)")
    return corpus_diff(ctx.docs(), ctx.corpus(path))


@_corpus_op("domaincap")
def _op_domaincap(ctx: OpContext) -> DataFrame:
    from .pipeline import cap_per_domain
    # two-arg param getter so the CLI/registry default-parity
    # introspection test sees the default (review r8)
    return cap_per_domain(ctx.docs(), n=ctx.int_param("n", 100),
                          domain_col=str(ctx.param("domain",
                                                    "source")))


@_corpus_op("pack")
def _op_pack(ctx: OpContext) -> DataFrame:
    from .packing import pack_sequences
    return pack_sequences(ctx.docs(),
                          max_tokens=ctx.int_param("max_tokens", 512))


@_corpus_op("markup")
def _op_markup(ctx: OpContext) -> DataFrame:
    # HTML/markup stripping — the web-scrape stage before quality
    # gating; plain text passes through unchanged
    from .text import strip_markup
    return strip_markup(ctx.docs())


@_corpus_op("normalize")
def _op_normalize(ctx: OpContext) -> DataFrame:
    # defaults and validation live in the library signature (the
    # single source — review r7); only user-provided params pass
    # through, and the library's ValueError surfaces as OpError
    from .text import normalize_text
    kwargs = {}
    if ctx.param("form") is not None:
        kwargs["form"] = str(ctx.param("form"))
    try:
        return normalize_text(ctx.docs(), **kwargs)
    except ValueError as e:
        raise OpError(str(e))


@_corpus_op("chunk")
def _op_chunk(ctx: OpContext) -> DataFrame:
    # same single-source pattern: size defaults to 128 and stride to
    # 3/4·size inside chunk_tokens; validation raises there
    from .text import chunk_tokens
    kwargs = {}
    if ctx.param("size") is not None:
        kwargs["size"] = ctx.int_param("size")
    if ctx.param("stride") is not None:
        kwargs["stride"] = ctx.int_param("stride")
    try:
        return chunk_tokens(ctx.docs(), **kwargs)
    except ValueError as e:
        raise OpError(str(e))


@_corpus_op("boilerplate")
def _op_boilerplate(ctx: OpContext) -> DataFrame:
    # single-source pattern: defaults (min_df=2, delim newline) and
    # validation live in the library signature
    from .dedup import drop_common_lines
    kwargs = {}
    if ctx.param("min_df") is not None:
        kwargs["min_df"] = ctx.int_param("min_df")
    if ctx.param("delim") is not None:
        kwargs["delim"] = str(ctx.param("delim"))
    try:
        return drop_common_lines(ctx.docs(), **kwargs)
    except ValueError as e:
        raise OpError(str(e))


@_corpus_op("redact")
def _op_redact(ctx: OpContext) -> DataFrame:
    from .text import pii_count, redact_pii
    return ctx.docs().select(
        "doc_id", redact_pii(F.col("text")).alias("text"),
        pii_count(F.col("text")).alias("n_pii"))


@_corpus_op("curate")
def _op_curate(ctx: OpContext) -> DataFrame:
    from .pipeline import (curate, curate_v2, curate_v2_ledger,
                           curate_v3, curate_v3_ledger)
    mq = ctx.float_param("min_quality", 0.3)
    if ctx.flag("ledger"):
        # the ledger matches the pipeline version it audits
        return (curate_v3_ledger if ctx.flag("v3")
                else curate_v2_ledger)(ctx.docs(), min_quality=mq)
    if ctx.flag("v3"):
        return curate_v3(ctx.docs(), min_quality=mq)
    if ctx.flag("v2"):
        return curate_v2(ctx.docs(), min_quality=mq)
    return curate(ctx.docs(), min_quality=mq)


@_corpus_op("gate")
def _op_gate(ctx: OpContext) -> DataFrame:
    from .text import gopher_gate
    return gopher_gate(ctx.docs())


@_corpus_op("c4")
def _op_c4(ctx: OpContext) -> DataFrame:
    from .text import c4_line_filter
    return c4_line_filter(ctx.docs())


@_corpus_op("scrub")
def _op_scrub(ctx: OpContext) -> DataFrame:
    from .dedup import scrub_duplicate_spans
    return scrub_duplicate_spans(ctx.docs(),
                                 n=ctx.int_param("ngram", 8))


@_corpus_op("substring")
def _op_substring(ctx: OpContext) -> DataFrame:
    from .dedup import duplicate_spans
    return duplicate_spans(ctx.docs(), n=ctx.int_param("ngram", 8))


@_corpus_op("split")
def _op_split(ctx: OpContext) -> DataFrame:
    from .pipeline import split_corpus
    splits = _kv_floats(ctx.param("splits") or "", "splits") or None
    return split_corpus(ctx.docs(), splits,
                        salt=str(ctx.param("salt", "")))


@_corpus_op("mixture")
def _op_mixture(ctx: OpContext) -> DataFrame:
    from .pipeline import sample_to_mixture
    spec = ctx.require("target",
                       "mixture needs target=stratum=weight[,...]")
    target = _kv_floats(str(spec), "target")
    if not target:
        raise OpError("mixture needs target=stratum=weight[,...]")
    return sample_to_mixture(
        ctx.docs(), target,
        stratum_col=str(ctx.param("stratum_col", "lang")),
        by=ctx.choice("by", ("docs", "tokens"), "docs"))


@_corpus_op("ann")
def _op_ann(ctx: OpContext) -> DataFrame:
    from . import similarity as SIM
    method = ctx.choice("method", ("gemm", "lsh", "ivf", "ivfpq"),
                        "gemm")
    k = ctx.int_param("k", 5)
    kw = {}
    if ctx.flag("hashed"):
        # no embeddings table needed: vectorize the documents with
        # the hashing trick and search those
        df = SIM.hashed_doc_vectors(ctx.docs())
        kw = {"vec_col": "vector", "id_col": "doc_id"}
    else:
        df = ctx.embs()
    retire = ctx.param("retire")
    compact = ctx.flag("compact")
    post = ctx.param("postings")
    ingest = ctx.param("ingest")
    health = ctx.flag("health")
    upsert = ctx.flag("upsert")
    if method != "ivfpq" and (ctx.flag("encode")
                              or ctx.flag("distortion")
                              or post is not None
                              or retire is not None or compact
                              or ingest is not None or health
                              or upsert):
        # same loud-flag contract as --build-index below (review r9)
        raise OpError(f"ann: --encode/--distortion/--postings/"
                      f"--retire/--compact/--ingest/--health/"
                      f"--upsert apply to method ivfpq, not "
                      f"{method}")
    # the index verbs are mutually exclusive, and build never takes
    # a served index — silent precedence would run a different verb
    # than the user asked for (review r10, same loud-flag contract).
    # --postings is the SERVE verb only when --retire/--compact/
    # --health are absent; with them it names the table those verbs
    # operate on.
    verbs = [v for v, on in (
        ("--build-index", ctx.flag("build_index")),
        ("--encode", ctx.flag("encode")),
        ("--distortion", ctx.flag("distortion")),
        ("--retire", retire is not None),
        ("--compact", compact),
        ("--ingest", ingest is not None),
        ("--health", health),
        ("--upsert", upsert),
        ("--postings", post is not None and retire is None
         and not compact and ingest is None and not health
         and not upsert)) if on]
    if len(verbs) > 1:
        raise OpError(f"ann: conflicting verbs {', '.join(verbs)} — "
                      f"pick one")
    # verb-scoped options are loud when their verb is absent — a
    # silently dropped --codes-only/--min-ratio would make the user
    # believe a storage mode / compaction threshold applied when it
    # did not (review r11, same loud-flag contract)
    if ctx.flag("codes_only") and not (ctx.flag("encode")
                                       or ingest is not None
                                       or upsert):
        raise OpError("ann: --codes-only applies to --encode, "
                      "--ingest or --upsert")
    if ctx.param("min_ratio") is not None and not compact:
        raise OpError("ann: --min-ratio applies to --compact")
    if ctx.param("timeout") is not None and ingest is None:
        raise OpError("ann: --timeout applies to --ingest")
    recall = ctx.flag("recall")
    if recall and (ctx.flag("build_index") or ctx.flag("encode")
                   or ctx.flag("distortion") or retire is not None
                   or compact or ingest is not None or health
                   or upsert):
        # recall measures a SEARCH against the exact ground truth —
        # on a non-search verb it would silently do nothing
        # (loud-flag contract)
        raise OpError("ann: --recall applies to a search "
                      "(plain, --index, or --postings serve)")

    def searched(res, corpus=None):
        # wrap any search result with the recall gauge when asked:
        # ground truth is the exact block-GEMM top-k at the same k.
        # Self-search verbs grade against the input frame; the
        # SERVED verb (--postings) grades against the members
        # actually served — the stored postings' vectors — because
        # after --ingest/--retire the postings corpus has diverged
        # from the input frame and a self-join truth would grade
        # against the wrong corpus (ADVICE r11)
        if not recall:
            return res
        from .similarity import (ann_recall, live_postings,
                                 topk_gemm, topk_gemm_vs)
        if corpus is None:
            return ann_recall(res, topk_gemm(df, k=k, **kw))
        live = live_postings(corpus)
        if live.where(F.col("vec").isNull()).take(1):
            raise OpError(
                "ann: --recall on codes-only postings has no exact "
                "ground truth — re-encode without --codes-only")
        vc = kw.get("vec_col", "embedding")
        ic = kw.get("id_col", "vec_id")
        members = live.select(F.col("id").alias(ic),
                              F.col("vec").alias(vc))
        return ann_recall(res, topk_gemm_vs(df, members, k=k, **kw))

    opq = ctx.int_param("opq", 0)
    if opq and not ctx.flag("build_index"):
        # the rotation is a TRAINING choice baked into the artifact;
        # every later verb reads it from the stored index — an --opq
        # on encode/serve would silently do nothing (loud-flag
        # contract)
        raise OpError("ann: --opq applies to --build-index (served "
                      "verbs read the rotation from the artifact)")
    if opq < 0:
        raise OpError(f"ann: --opq must be >= 0, got {opq}")
    if ctx.flag("build_index") and ctx.param("index") is not None:
        raise OpError("ann: --build-index trains a NEW index; it "
                      "cannot take --index (did you mean --encode, "
                      "--postings or --distortion?)")
    if method in ("gemm", "lsh"):
        # loud, not silent: an index flag on a non-index method must
        # not quietly run (or write) a normal search (review r9)
        if ctx.flag("build_index") or ctx.param("index") is not None:
            raise OpError(f"ann: --build-index/--index apply to "
                          f"method ivf or ivfpq, not {method}")
        if method == "gemm":
            return searched(SIM.topk_gemm(df, k=k, **kw))
        return searched(SIM.lsh_bucketed_topk(df, k=k, **kw))
    # IVF / IVF-PQ train-once/serve-many (r9): build_index=true emits
    # the persistable index table (write it with -o / consume the
    # json-seq); index=<path> serves from a stored table and skips
    # training. Without either, training runs inline as before.
    # Library ValueErrors (bad dim/m split, malformed index table)
    # surface as OpError.
    idx = ctx.param("index")
    # rerank=0 serves pure-ADC scores — the only way to search a
    # codes-only postings table (encode with keep_vectors=False);
    # rerank=1 (default) is the high-recall exact-rerank posture
    rerank = bool(ctx.int_param("rerank", 1))
    try:
        if method == "ivfpq":
            if ctx.flag("build_index"):
                return SIM.build_ivfpq_index(df, train_iters=2,
                                             opq_iters=opq, **kw)
            # r10 production verbs over a STORED index: encode=true
            # emits postings rows (the incremental ADD — append them
            # to the stored postings table), postings=<path> serves
            # queries from stored postings, distortion=true reports
            # the staleness gauge vs the build-time baseline
            if ctx.flag("encode"):
                if idx is None:
                    raise OpError("ann: --encode needs --index "
                                  "<stored index table>")
                return SIM.encode_ivfpq(
                    df, ctx.corpus(str(idx)),
                    keep_vectors=not ctx.flag("codes_only"), **kw)
            if ctx.flag("distortion"):
                if idx is None:
                    raise OpError("ann: --distortion needs --index "
                                  "<stored index table>")
                return SIM.ivfpq_distortion(df, ctx.corpus(str(idx)),
                                            **kw)
            # index-lifecycle CRUD over a stored postings table:
            # --retire emits tombstone rows (append with -o
            # --append); --compact emits the rewritten table
            # (replace with -o). Neither needs --index — they
            # operate on the postings alone.
            if retire is not None:
                if post is None:
                    raise OpError("ann: --retire needs --postings "
                                  "<stored postings table> (append "
                                  "the tombstones with -o --append)")
                postings_df = ctx.corpus(str(post))
                # parse the id list against the POSTINGS id type —
                # per-token type guessing let a non-numeric id reach
                # createDataFrame on a numeric table as a raw
                # PySparkTypeError traceback (review r11)
                numeric = dict(postings_df.dtypes).get(
                    "id", "bigint") not in ("string",)
                ids = []
                for part in str(retire).split(","):
                    part = part.strip()
                    if not part:
                        continue
                    if numeric:
                        try:
                            ids.append(int(part))
                        except ValueError:
                            raise OpError(
                                f"ann: --retire id {part!r} is not "
                                f"valid for the postings id type")
                    else:
                        ids.append(part)
                if not ids:
                    raise OpError("ann: --retire needs a non-empty "
                                  "comma-separated id list")
                return SIM.retire_vectors(postings_df, ids)
            if compact:
                if post is None:
                    raise OpError("ann: --compact needs --postings "
                                  "<stored postings table> (write "
                                  "the rewritten table with -o)")
                return SIM.compact_postings(
                    ctx.corpus(str(post)),
                    min_ratio=ctx.float_param("min_ratio", 0.0))
            if ingest is not None:
                # streaming ADD: encode an embedding STREAM against
                # the stored index, parquet-appending postings to
                # --postings; returns the per-micro-batch distortion
                # gauge. Writes to a caller-supplied path — CLI only
                if idx is None or post is None:
                    raise OpError(
                        "ann: --ingest needs --index <stored index "
                        "table> and --postings <destination dir for "
                        "the streamed postings>")
                if ctx.flag("hashed"):
                    raise OpError("ann: --ingest streams embedding "
                                  "rows; --hashed does not apply")
                if not ctx.local_fs:
                    raise OpError(
                        "ann: --ingest writes a postings table to a "
                        "caller-supplied path — CLI only", status=403)
                src = ctx.corpus_path(str(ingest))
                return SIM.encode_ivfpq_stream(
                    df.sparkSession, src, ctx.corpus(str(idx)),
                    str(post),
                    keep_vectors=not ctx.flag("codes_only"),
                    timeout_s=ctx.int_param("timeout", 300))
            if upsert:
                # REPLACE-or-ADD (r13 — the text index's upsert
                # analogue): drop every stored row of the input
                # frame's ids (stale tombstones included) and append
                # the freshly encoded batch; write the rewritten
                # table with -o
                if idx is None or post is None:
                    raise OpError("ann: --upsert needs --index "
                                  "<stored index table> and "
                                  "--postings <stored postings "
                                  "table> (write the rewritten "
                                  "table with -o)")
                return SIM.upsert_vectors(
                    ctx.corpus(str(post)), df, ctx.corpus(str(idx)),
                    keep_vectors=not ctx.flag("codes_only"), **kw)
            if health:
                # the rebuild-decision gauge: distortion of the
                # input frame vs the build baseline + tombstone load
                # + list balance, one row with a recommendation
                if idx is None or post is None:
                    raise OpError("ann: --health needs --index "
                                  "<stored index table> and "
                                  "--postings <stored postings "
                                  "table>")
                return SIM.index_health(
                    df, ctx.corpus(str(post)), ctx.corpus(str(idx)),
                    **kw)
            if post is not None:
                if idx is None:
                    raise OpError("ann: --postings needs --index "
                                  "<stored index table>")
                postings_df = ctx.corpus(str(post))
                return searched(SIM.ivf_pq_search(
                    df, postings_df, ctx.corpus(str(idx)),
                    k=k, rerank=rerank, **kw), corpus=postings_df)
            if idx is not None:
                return searched(SIM.ivf_pq_topk(
                    df, k=k, index=ctx.corpus(str(idx)),
                    rerank=rerank, **kw))
            return searched(SIM.ivf_pq_topk(
                df, k=k, train_iters=2, rerank=rerank, **kw))
        if ctx.flag("build_index"):
            return SIM.build_ivf_centroids(df, train_iters=2, **kw)
        if idx is not None:
            return searched(SIM.ivf_topk(
                df, k=k, centroids=ctx.corpus(str(idx)), **kw))
        return searched(SIM.ivf_topk(df, k=k, train_iters=2,
                                     **kw))
    except ValueError as e:
        raise OpError(str(e))


# ---------------------------------------------------------------------
# events ops
# ---------------------------------------------------------------------


@_event_op("windowed")
def _ev_windowed(ctx: OpContext) -> DataFrame:
    from ..streaming import events as EV
    return EV.windowed_counts(ctx.events(),
                              str(ctx.param("window", "1 hour")))


@_event_op("sessionize")
def _ev_sessionize(ctx: OpContext) -> DataFrame:
    from ..streaming import events as EV
    return EV.sessionize(ctx.events(), ctx.int_param("gap", 30))


@_event_op("funnel")
def _ev_funnel(ctx: OpContext) -> DataFrame:
    from ..streaming import events as EV
    steps = [x.strip() for x in
             str(ctx.param("steps", "view,click,purchase")).split(",")]
    fn = EV.funnel_counts if ctx.flag("counts") else EV.funnel
    return fn(ctx.events(), steps,
              horizon_s=ctx.int_param("horizon", 3600))


@_event_op("retention")
def _ev_retention(ctx: OpContext) -> DataFrame:
    from ..streaming import events as EV
    return EV.retention_cohorts(ctx.events())


@_event_op("attribution")
def _ev_attribution(ctx: OpContext) -> DataFrame:
    from ..streaming import events as EV
    model = ctx.choice("model", ("last", "first", "linear",
                             "position"), "last")
    try:
        return EV.attribution(
            ctx.events(),
            conversion=str(ctx.param("conversion", "purchase")),
            model=model,
            lookback_s=ctx.int_param("lookback", 3600))
    except ValueError as e:
        raise OpError(str(e))


@_event_op("paths")
def _ev_paths(ctx: OpContext) -> DataFrame:
    from ..streaming import events as EV
    return EV.common_paths(ctx.events(), n=ctx.int_param("length", 3),
                           k=ctx.int_param("top", 20))


@_event_op("anomalies")
def _ev_anomalies(ctx: OpContext) -> DataFrame:
    from ..streaming import events as EV
    return EV.window_anomalies(ctx.events(),
                               str(ctx.param("window", "1 hour")),
                               trailing=ctx.int_param("trailing", 24))
