"""Text-analysis operators: token counting, quality scoring, language
ID, document fingerprinting.

All expressions are Spark built-ins (JVM codegen). The polynomial
rolling hash (POLY_MOD/POLY_MUL) is plain integer arithmetic, mirrored
exactly by the DuckDB oracle via list_reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

POLY_MOD = 2147483647  # 2^31 - 1; acc*31 + c stays well inside int64
POLY_MUL = 31

# tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "los", "es"],
    "fr": ["le", "la", "les", "est"],
    "de": ["der", "die", "und", "ist"],
    "zh": ["de", "shi", "le", "he"],
}

# all distinct marker words, longest-first (bounded-token regex
# alternation: longest-first means no alternative can win on a prefix
# of a longer marker before the lookahead rejects it)
MARKER_WORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws},
                      key=lambda w: (-len(w), w))
# one pass over the text extracting exactly the tokens (maximal
# non-whitespace runs, i.e. the units of tokens()) that equal a marker
# word: (?:^|\s) anchors the token start (consuming at most the single
# preceding whitespace char — a following marker separated by one
# space still matches, because the lookahead does not consume), the
# lookahead anchors the token end.
MARKER_RE = ("(?:^|\\s)(" + "|".join(MARKER_WORDS) + ")(?=\\s|$)")


def tokens(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(col, r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer, minus the trailing-space lookahead (which
# RE2 lacks): contractions, letter runs, digit runs, punctuation runs,
# whitespace. Runs identically under Java regex (Spark) and RE2
# (DuckDB oracle) — both leftmost-first alternation.
BPE_SPLIT_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
                r"| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization (the units a byte-pair encoder would
    merge within). JVM-side regexp_extract_all — no Python worker."""
    return F.regexp_extract_all(col, F.lit(BPE_SPLIT_RE), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col))


# C0 controls except \t \n \r, plus DEL — the characters every
# curation pipeline strips before tokenization. Identical character
# class under Java regex (Spark) and RE2 (DuckDB oracle).
CTRL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

_nfc_udfs: dict = {}


def _norm_udf(form: str):
    """Arrow-batched unicodedata.normalize for one normal form.
    ASCII rows short-circuit (normalization is the identity on
    ASCII, and str.isascii is a flag check — the common fast path
    for web corpora). Python's normalize agrees byte-for-byte with
    DuckDB's nfc_normalize (fuzz-verified, 522 composed/decomposed/
    reordered cases) — both implement UAX #15."""
    if form not in _nfc_udfs:
        import unicodedata

        def run(s):
            return s.map(
                lambda x: x if x is None or x.isascii()
                else unicodedata.normalize(form, x))
        _nfc_udfs[form] = F.pandas_udf(run, "string")
    return _nfc_udfs[form]


def normalize_text(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   form: str = "NFC") -> DataFrame:
    """Unicode normalization + control-character cleanup — the
    canonical first stage of a text-curation pipeline (mojibake from
    mixed encodings, decomposed accents from mac filesystems, and
    stray C0 controls otherwise survive into tokenization and split
    the vocabulary).

    Output: (doc_id, text_norm, n_ctrl_removed, changed). ``form``
    is any of NFC/NFKC/NFD/NFKD (NFC default; the DuckDB oracle twin
    covers NFC via nfc_normalize).

    Plan shape: ONE ArrowEvalPython stage for the normalization
    (ships only the text column; ASCII rows short-circuit inside the
    batch), then JVM-codegen regexp_replace/length for the control
    strip and change accounting. n_ctrl_removed is a LENGTH
    DIFFERENCE, so it is unit-independent (UTF-16 on the Spark side,
    code points in the oracle — removed controls are BMP, everything
    else cancels)."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normal form: {form}")
    staged = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__raw"),
        _norm_udf(form)(F.col(text_col)).alias("__nfc"))
    cleaned = F.regexp_replace(F.col("__nfc"), CTRL_CLASS, "")
    return staged.select(
        "doc_id",
        cleaned.alias("text_norm"),
        (F.length("__nfc") - F.length(cleaned)).cast("long")
        .alias("n_ctrl_removed"),
        (cleaned != F.col("__raw")).alias("changed"))


# the shared markup-stripping chain: (pattern, replacement), applied
# IN ORDER by strip_markup and mirrored verbatim in the SQL oracle.
# Patterns stick to the Java∩RE2 common dialect ((?is) inline flags,
# non-greedy .*?, no backrefs) so Spark and DuckDB compile them
# identically.
MARKUP_STEPS = [
    (r"(?is)<script\b.*?</script>", " "),   # script WITH content
    (r"(?is)<style\b.*?</style>", " "),     # style WITH content
    (r"(?s)<!--.*?-->", " "),               # comments
    (r"(?is)</?(?:br|p|div|li|tr|h[1-6])\b[^>]*>", "\n"),
    (r"(?s)<[^>]+>", " "),                  # every remaining tag
    # entities: &amp; must unescape LAST, or "&amp;lt;" (the literal
    # text "&lt;") would double-unescape into "<"
    (r"&nbsp;", " "), (r"&lt;", "<"), (r"&gt;", ">"),
    (r"&quot;", "\""), (r"&#0*39;", "'"), (r"&#0*34;", "\""),
    (r"&apos;", "'"), (r"&amp;", "&"),
    (r"[ \t\x0b\f\r]+", " "),               # collapse blanks
    (r" ?\n ?", "\n"), (r"\n{2,}", "\n"),   # tidy line structure
    (r"(?s)^\s+", ""), (r"(?s)\s+$", ""),     # trim (incl. newlines)
]


def strip_markup(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """HTML/markup stripping — the web-scrape curation stage between
    raw capture and quality gating (the boilerplate REMOVAL
    complement of ``c4_line_filter``/``drop_common_lines``, which
    assume tag-free text): drop script/style elements WITH their
    payload, drop comments, turn block-level tags into newlines and
    every other tag into a space, unescape the standard entities,
    and collapse the resulting whitespace. Plain text passes through
    unchanged (modulo blank collapsing), so the stage is safe to run
    unconditionally.

    The chain is ``MARKUP_STEPS`` applied in order — ALL JVM
    regexp_replace codegen, no Python stage — and the DuckDB oracle
    replays the identical patterns, so the entry is value-hash
    exact. Returns (doc_id, text_clean, n_chars_removed, changed);
    n_chars_removed is a length difference (UTF-16 vs code points
    cancels — removed markup is ASCII)."""
    cleaned = F.col(text_col)
    for pat, rep in MARKUP_STEPS:
        cleaned = F.regexp_replace(cleaned, pat, rep)
    return df.select(
        F.col(id_col).alias("doc_id"),
        cleaned.alias("text_clean"),
        (F.length(text_col) - F.length(cleaned)).cast("long")
        .alias("n_chars_removed"),
        (cleaned != F.col(text_col)).alias("changed"))


def chunk_tokens(df: DataFrame, size: int = 128,
                 stride: int | None = None,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Overlapping token-window chunks — the unit an embedding/RAG
    pipeline indexes (documents are longer than an encoder's window;
    stride < size keeps context across the seam).

    Windows start at 0, stride, 2·stride, …; the chunk count is
    1 + ceil(max(n_tokens − size, 0) / stride), so the final window
    always reaches the end of the document and a short document
    yields exactly one chunk. ``stride=None`` derives
    max(1, size·3/4) — the overlap ratio tracks a caller's --size
    without forcing a paired --stride. Null-text documents yield NO
    chunks (greatest/least null-SKIP rather than propagate, so
    without the explicit filter a null doc would fabricate one
    phantom full-size chunk — review r7). Output: (doc_id, chunk_id,
    n_chunk_tokens, chunk_text), provenance preserved by doc_id.

    All whole-stage codegen and SHUFFLE-FREE: one narrow explode per
    chunk index, window assembly by slice + concat_ws — the same
    pattern as shingle_rows, so it scales the same way (no token-row
    shuffle, no window sort)."""
    if stride is None:
        stride = max(1, size * 3 // 4)
    if size < 1 or stride < 1 or stride > size:
        # stride > size would sample gapped windows AND let the
        # final start position land past the document end (an empty
        # trailing chunk) — overlapping/contiguous windows only
        raise ValueError(f"need 1 <= stride <= size, got "
                         f"size={size} stride={stride}")
    base = (df.select(F.col(id_col).alias("doc_id"),
                      tokens(F.col(text_col)).alias("__toks"))
            .where(F.col("__toks").isNotNull()))
    n = F.size("__toks")
    n_chunks = (F.lit(1)
                + F.ceil(F.greatest(n - size, F.lit(0))
                         / F.lit(stride))).cast("long")
    ex = base.select(
        "doc_id", "__toks", n.alias("__n"),
        F.explode(F.sequence(F.lit(0).cast("long"),
                             n_chunks - 1)).alias("chunk_id"))
    start = F.col("chunk_id") * stride
    return ex.select(
        "doc_id", "chunk_id",
        F.least(F.lit(size).cast("long"),
                F.col("__n") - start).alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice("__toks", (start + 1).cast("int"),
                         F.lit(size))).alias("chunk_text"))


def occurrences_in(toks: Column, word: str) -> Column:
    """Exact-token occurrence count over a pre-split token array."""
    return F.size(F.filter(toks, lambda x: x == F.lit(word)))


def marker_tokens(col: Column) -> Column:
    """The sub-array of tokens(col) that are language-marker words,
    extracted in ONE JVM regexp pass over the raw text (no split, no
    interpreted HOF). Marker counting over this array costs
    O(markers) per word instead of O(tokens) — the q9 fix (r7): the
    old per-word `size(filter(toks, ...))` ran ~21 interpreted
    traversals of the full token array per row."""
    return F.regexp_extract_all(col, F.lit(MARKER_RE), 1)


def word_occurrences(col: Column, word: str) -> Column:
    """Exact-token occurrence count (portable: list_filter in DuckDB)."""
    return occurrences_in(tokens(col), word)


# PII scrubbing rules: (name, pattern, replacement), applied in order.
# Patterns deliberately avoid lookaround/backreferences so the SAME
# source compiles identically under Java regex (Spark executors) and
# RE2 (the DuckDB oracle) — the cross-engine-portable subset.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{13,16}\b", "<CARD>"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_count(col: Column) -> Column:
    """Exact replacement count: rule i is counted on the text with
    rules < i already applied, so a span consumed by an earlier rule
    (e.g. the 13-digit local part of '1234567890123@x.com', which the
    card rule would also match in the raw text) is never double-counted
    — n_pii equals the number of substitutions redact_pii makes
    (ADVICE r4). Still whole-stage codegen: regexp_count/replace are
    JVM built-ins."""
    n = F.lit(0)
    cur = col
    for _, pat, repl in PII_RULES:
        n = n + F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return n


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its typed placeholder — the
    curation scrub stage before training. Chained regexp_replace,
    all JVM-side; rule order means earlier placeholders are never
    re-matched by later rules (placeholders contain no digits)."""
    out = col
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def poly_hash(col: Column) -> Column:
    """Deterministic polynomial rolling hash of a string:
    fold(chars, acc -> (acc*31 + ascii(c)) % (2^31-1)).
    DuckDB mirror: list_reduce(list_prepend(0, codes), ...)"""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * POLY_MUL + F.ascii(x)) % POLY_MOD)


# large multiplier for ORDER-quality sampling keys: with *31 (or raw
# adler32) short sequential ids never wrap the modulus, so the
# "hash" order is length/digit-dominated — sorting 0..1999 by
# adler32(str(id)) puts exactly 0..99 first (review r13b: a
# systematic selection bias where the caller wanted a uniform
# sample). 33554393 (a prime near 2^25) wraps on every character, so
# the order is well mixed at any corpus size (measured uniform chunk
# means at 500/2k/60k ids, zero collisions at 60k), while staying a
# plain int64 fold DuckDB replays exactly.
SAMPLE_MUL = 33554393


def sample_order_key(col: Column, seed: int = 42) -> Column:
    """Deterministic well-mixed ordering key for hash-based sampling
    (``fold(chars(s || '#seed'), acc -> (acc*SAMPLE_MUL + ascii(c))
    % POLY_MOD)``): sort ascending and take the head for an unbiased,
    replayable uniform sample. DuckDB mirror: the same list_reduce
    fold (see __spark_entry__ SAMPLE_KEY)."""
    s = F.concat(col.cast("string"), F.lit(f"#{seed}"))
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * SAMPLE_MUL + F.ascii(x)) % POLY_MOD)


def quality_score_from(col: Column, toks: Column,
                       n_the: Column | None = None) -> Column:
    """quality_score over a pre-split token array (one split total).
    ``n_the`` lets a caller that already extracted marker tokens
    (analyze) supply the 'the'-count without another array traversal.

    try_divide everywhere: Spark 4 defaults to ANSI mode, where a
    plain `/ 0` on an EMPTY document (n_chars = 0) kills the whole
    job — and upstream stages (c4_line_filter, the ExactSubstr
    scrub) legitimately emit empty texts. try_divide yields NULL,
    exactly what the DuckDB oracle's division produces, so the
    whole score goes NULL for empty docs on both engines
    (review r6)."""
    n_chars = F.length(col)
    n_words = F.size(toks)
    avg_wlen = F.try_divide(n_chars - (n_words - 1), n_words)
    if n_the is None:
        n_the = occurrences_in(toks, "the")
    stop_ratio = F.try_divide(n_the, n_words)
    alnum = F.length(F.regexp_replace(col, r"[^a-zA-Z0-9 ]", ""))
    punct_ratio = F.try_divide(n_chars - alnum, n_chars)
    wlen_term = F.when((avg_wlen >= 3.0) & (avg_wlen <= 10.0), F.lit(1.0)) \
                 .otherwise(F.lit(0.5))
    return F.round(
        wlen_term * 0.5
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.2,
        6)


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of mean word length
    (penalize <3 or >10), stopword presence, and non-alnum ratio.
    Deterministic arithmetic — same formula runs in the oracle. The
    'the'-count runs as one JVM regexp_count (token-bounded pattern,
    same value as the list-filter count) instead of an interpreted
    filter traversal of the token array."""
    return quality_score_from(col, tokens(col), n_the=the_count(col))


def the_count(col: Column) -> Column:
    """Occurrences of the exact token 'the' as one JVM regexp_count —
    value-identical to occurrences_in(tokens(col), 'the') (the
    (?:^|\\s)/(?=\\s|$) pair bounds a whole whitespace-delimited
    token; the lookahead end means back-to-back markers still
    match)."""
    return F.regexp_count(col, F.lit(r"(?:^|\s)the(?=\s|$)"))


def lang_scores_from(toks: Column) -> dict[str, Column]:
    """Marker-stopword count per language over pre-split tokens."""
    return {lang: sum((occurrences_in(toks, w) for w in words),
                      F.lit(0))
            for lang, words in LANG_MARKERS.items()}


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-stopword count per language."""
    return lang_scores_from(tokens(col))


def lang_id(col: Column) -> Column:
    """argmax over marker counts; ties/zero → 'und' (undetermined).

    Formulated as greatest() + first-match instead of a sequential
    max-fold: the fold re-inlines every score into every later branch
    (Catalyst's projection collapse), blowing the expression tree up
    exponentially in the language count — the greatest() form keeps it
    linear. Semantics are identical: winner = first language in sorted
    order reaching the (positive) maximum."""
    return lang_id_from_markers(marker_tokens(col))


def lang_id_from(toks: Column) -> Column:
    """lang_id over a pre-split token array."""
    return _lang_id_from_scores(lang_scores_from(toks))


def lang_id_from_markers(mk: Column) -> Column:
    """lang_id over a pre-extracted marker_tokens array — the cheap
    path: every per-word count traverses only the (tiny) marker array.
    Value-identical to lang_id/lang_id_from: marker_tokens(text)
    contains exactly the tokens of text that are marker words, so the
    per-word counts are equal."""
    return _lang_id_from_scores(lang_scores_from(mk))


def _lang_id_from_scores(scores: dict[str, Column]) -> Column:
    m = F.greatest(*(scores[lang] for lang in sorted(LANG_MARKERS)))
    best = F.lit("und")
    # reversed so the FIRST sorted language wins ties
    for lang in reversed(sorted(LANG_MARKERS)):
        best = F.when(scores[lang] == m, F.lit(lang)).otherwise(best)
    return F.when(m > 0, best).otherwise(F.lit("und"))


def term_rows(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id, term) rows: whitespace-split, lowercased, empties dropped.
    The shared base for corpus-frequency analytics."""
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(tokens(F.col(text_col))).alias("t"))
            .where(F.col("t") != "")
            .select("id", F.lower("t").alias("term")))


def top_terms(df: DataFrame, k: int = 50, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide top-k terms by occurrence count. One partial-
    aggregated groupBy(term) shuffle; the top-k is
    TakeOrderedAndProject (per-partition heads + merge), never a
    global sort — the heavy-hitter query shape that survives 100 TB.
    Deterministic tie-break on term."""
    return (term_rows(df, text_col, id_col)
            .groupBy("term").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), "term").limit(k))


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document top-k terms by tf·idf (idf = ln(N/df), document
    frequency from the same per-doc term counts — one extra narrow
    groupBy, no second corpus scan; N joins in as a broadcast 1-row
    aggregate, never a driver collect). Window top-k per doc with a
    term tie-break."""
    from pyspark.sql import Window
    tf = (term_rows(df, text_col, id_col)
          .groupBy("id", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.round(F.col("tf")
                                  * F.log(F.col("n_docs")
                                          / F.col("df")), 6)))
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), "term")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("id", "term", "tf", "tfidf", "rank"))


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Perplexity-lite quality signal: per-doc mean unigram
    log-probability under the corpus's own (add-one-smoothed) unigram
    model. Low scores flag documents whose vocabulary is atypical for
    the corpus (boilerplate, noise, other languages) — the cheap
    stand-in for LM-perplexity filtering in curation pipelines.

    Plan: one term-frequency aggregate over (id, term) rows, corpus
    totals as a broadcast 1-row aggregate, one shuffle join back on
    term, one per-doc aggregate. All arithmetic is ln over exact
    counts — mirrored verbatim by the SQL oracle."""
    terms = term_rows(df, text_col, id_col)
    tf = terms.groupBy("term").agg(F.count("*").alias("cnt"))
    totals = tf.agg(F.sum("cnt").alias("n_total"),
                    F.count("*").alias("n_vocab"))
    scored = (terms.join(tf, "term")
              .crossJoin(F.broadcast(totals))
              .withColumn("lp", F.log((F.col("cnt") + 1)
                                      / (F.col("n_total")
                                         + F.col("n_vocab")))))
    return (scored.groupBy("id")
            .agg(F.round(F.avg("lp"), 6).alias("avg_logprob"),
                 F.count("*").alias("n_terms")))


def moore_lewis_scores(raw: DataFrame, target: DataFrame,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Cross-entropy-difference data selection (Moore & Lewis 2010 —
    the classic recipe for mining general crawl for DOMAIN-relevant
    training data): score every raw document by

        ml_score = mean over tokens of
                   [ln P_target(w) − ln P_raw(w)]

    under each corpus's own add-one-smoothed unigram model (terms
    unseen in the target back off to its smoothing mass). High scores
    = looks like the target domain and UNLIKE generic raw text — rank
    and keep the top slice (compose with quality_quantile_gate-style
    cutoffs or a threshold).

    Plan shape: two vocabulary-bounded term-frequency aggregates (one
    per corpus), a LEFT join of raw's occurrence rows against the
    target tf (unseen ⇒ count 0), broadcast 1-row totals, one per-doc
    aggregate. Nothing corpus-sized crosses a shuffle twice; the tf
    tables are vocabulary-bounded. All arithmetic is ln over exact
    counts — replayed verbatim by the SQL oracle."""
    terms = term_rows(raw, text_col, id_col)
    tf_r = terms.groupBy("term").agg(F.count("*").alias("c_r"))
    tot_r = tf_r.agg(F.sum("c_r").alias("n_r"),
                     F.count("*").alias("v_r"))
    tf_t = (term_rows(target, text_col, id_col)
            .groupBy("term").agg(F.count("*").alias("c_t")))
    tot_t = tf_t.agg(F.sum("c_t").alias("n_t"),
                     F.count("*").alias("v_t"))
    scored = (terms
              .join(tf_r, "term")
              .join(tf_t, "term", "left")
              .crossJoin(F.broadcast(tot_r))
              .crossJoin(F.broadcast(tot_t))
              .withColumn(
                  "diff",
                  F.log((F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                        / (F.col("n_t") + F.col("v_t")))
                  - F.log((F.col("c_r") + 1)
                          / (F.col("n_r") + F.col("v_r")))))
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_terms"),
                 F.round(F.avg("diff"), 6).alias("ml_score"))
            .select(F.col("id").alias(id_col), "n_terms",
                    "ml_score"))


def perplexity_buckets(df: DataFrame, reference: DataFrame = None,
                       cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """CCNet-style head/middle/tail corpus partitioning (Wenzek et
    al. 2020 §4.4): score every document by its mean unigram
    log-probability under a REFERENCE-corpus language model
    (``reference``, defaulting to the corpus itself), then split the
    corpus at the score's 1/3 and 2/3 quantiles — ``head`` is the
    most reference-like third (lowest perplexity), ``tail`` the
    least. CCNet uses a Wikipedia-trained KenLM; this is the same
    decision rule over the repo's add-one-smoothed unigram model
    (the documented stand-in — ``unigram_logprob``), with
    out-of-vocabulary terms smoothed to count 0 + 1 so cross-corpus
    scoring is total.

    Plan: reference term counts (vocabulary-bounded) + a broadcast
    1-row totals aggregate; ONE left join back on term; a per-doc
    aggregate; thresholds as ONE exact-percentile aggregate (1 row,
    broadcast back — same contract as pipeline.quality_gate: swap
    ``percentile`` for ``percentile_approx`` in application code at
    100 TB, where the exact form's single value buffer is the
    bottleneck; exact here because the DuckDB oracle's
    quantile_cont matches it bit-for-bit). No global sort.

    Returns (id_col, score, bucket) — score rounded to 6 (the
    oracle-hash convention), bucket in {'head','middle','tail'}."""
    ref = reference if reference is not None else df
    tf, totals = _ppl_model(ref, text_col, id_col)
    scored = _ppl_scores(df, tf, totals, text_col, id_col)
    th = scored.agg(
        F.percentile("score", F.lit(float(cuts[0]))).alias("t1"),
        F.percentile("score", F.lit(float(cuts[1]))).alias("t2"))
    return (scored.crossJoin(F.broadcast(th))
            .withColumn("bucket",
                        F.when(F.col("score") >= F.col("t2"), "head")
                        .when(F.col("score") >= F.col("t1"),
                              "middle")
                        .otherwise("tail"))
            .select(F.col("id").alias(id_col), "score", "bucket"))


def _ppl_model(reference: DataFrame, text_col: str, id_col: str):
    """(tf, totals) — the add-one unigram model tables shared by the
    batch and streaming CCNet scorers (one vocabulary-bounded count
    table + a 1-row totals aggregate)."""
    tf = (term_rows(reference, text_col, id_col)
          .groupBy("term").agg(F.count("*").alias("cnt")))
    totals = tf.agg(F.sum("cnt").alias("n_total"),
                    F.count("*").alias("n_vocab"))
    return tf, totals


def _ppl_scores(df: DataFrame, tf: DataFrame, totals: DataFrame,
                text_col: str, id_col: str) -> DataFrame:
    """(id, score): per-doc mean add-one log-prob under the model —
    ONE shared Spark expression, so the batch op and the streaming
    twin produce BIT-identical scores (the foreachBatch stream path
    runs this very plan per micro-batch; a reimplementation in
    driver Python would differ in last-ulp log/fold behavior and
    break the batch≡stream pin)."""
    return (term_rows(df, text_col, id_col)
            .join(tf, "term", "left")
            .crossJoin(F.broadcast(totals))
            .withColumn(
                "lp",
                F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                      / (F.col("n_total") + F.col("n_vocab"))))
            .groupBy("id")
            .agg(F.round(F.avg("lp"), 6).alias("score")))


def perplexity_stream(spark, src_dir: str, reference: DataFrame,
                      threshold_corpus: DataFrame = None,
                      cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      max_files_per_batch: int = 1,
                      timeout_s: int | None = 120,
                      sink_dir: str | None = None,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Streaming twin of ``perplexity_buckets`` — CCNet bucketing as
    a DEPLOY stage: the add-one unigram model is trained ONCE from
    the static reference corpus, the head/tail thresholds are FIXED
    once batch-side (exact percentiles of ``threshold_corpus`` —
    default the reference itself — scored under that model), and
    each streamed micro-batch is scored with the IDENTICAL Spark
    expression as the batch op (foreachBatch; stream-static
    broadcast joins) and bucketed against the fixed thresholds.

    Bit-identical scores by construction (shared ``_ppl_scores``
    plan); zero aggregation state — a doc's bucket never depends on
    other streamed docs. That last point is the semantic difference
    from the batch op, whose thresholds move with the scored corpus:
    fixed thresholds are the CCNet deployment posture (calibrate
    once on a reference, bucket every incoming batch forever).

    Deploy posture: pass ``sink_dir`` — each micro-batch parquet-
    appends its (id, score, bucket) rows there and the return value
    is the BOUNDED per-batch gauge (batch_id, n, n_head, n_middle,
    n_tail), so driver state never grows with the stream
    (VERDICT r11 #1; checkpointed, at-least-once). Without it:
    per-doc rows return driver-side — the test rig. File-sink ≡
    memory-sink ≡ batch pinned by test."""
    from .util import stream_parquet

    tf, totals = _ppl_model(reference, text_col, id_col)
    tf = tf.cache()
    tf.count()
    tc = (threshold_corpus if threshold_corpus is not None
          else reference)
    th = (_ppl_scores(tc, tf, totals, text_col, id_col)
          .agg(F.percentile("score", F.lit(float(cuts[0])))
               .alias("t1"),
               F.percentile("score", F.lit(float(cuts[1])))
               .alias("t2")).collect()[0])
    t1, t2 = th["t1"], th["t2"]
    if t1 is None or t2 is None:
        tf.unpersist()
        raise ValueError("perplexity_stream: the threshold corpus "
                         "produced no scores (no tokens)")
    id_t = reference.schema[id_col].dataType.simpleString()
    stream = stream_parquet(
        spark, src_dir, max_files_per_trigger=max_files_per_batch)
    rows: list = []
    gauge_rows: list = []

    def on_batch(bdf, bid):
        out = (_ppl_scores(bdf, tf, totals, text_col, id_col)
               .withColumn("bucket",
                           F.when(F.col("score") >= t2, "head")
                           .when(F.col("score") >= t1, "middle")
                           .otherwise("tail"))
               .select(F.col("id").alias(id_col), "score", "bucket"))
        if sink_dir is None:
            rows.extend(out.collect())
            return
        out.write.mode("append").parquet(sink_dir)
        g = out.agg(
            F.count("*").alias("n"),
            *[F.sum((F.col("bucket") == b).cast("long"))
              .alias(f"n_{b}") for b in ("head", "middle", "tail")]
        ).collect()[0]
        gauge_rows.append((int(bid), g["n"], g["n_head"] or 0,
                           g["n_middle"] or 0, g["n_tail"] or 0))

    writer = stream.writeStream.foreachBatch(on_batch)
    if sink_dir is not None:
        writer = writer.option(
            "checkpointLocation",
            checkpoint_dir or sink_dir + "__checkpoint")
    q = writer.trigger(availableNow=True).start()
    try:
        if timeout_s is None:
            q.awaitTermination()
        elif not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"perplexity_stream did not finish within "
                f"{timeout_s}s — refusing to return a partially "
                f"populated table" if sink_dir is None else
                f"perplexity_stream did not finish within "
                f"{timeout_s}s — the sink may be partially written; "
                f"restart resumes from the checkpoint")
    finally:
        tf.unpersist()
    if sink_dir is not None:
        return spark.createDataFrame(
            gauge_rows, "batch_id long, n long, n_head long, "
                        "n_middle long, n_tail long")
    return spark.createDataFrame(
        rows, f"{id_col} {id_t}, score double, bucket string")


def hashed_bigram_feature(w1: Column, w2: Column,
                          buckets: int) -> Column:
    """DSIR's hashed n-gram feature: the shared polynomial rolling
    hash of the space-joined bigram, folded into `buckets` bins.
    Plain int64 arithmetic — mirrored verbatim by the DuckDB oracle
    (list_reduce over unicode codes, same constants as poly_hash)."""
    return poly_hash(F.concat_ws(" ", w1, w2)) % buckets


def dsir_logweights(raw: DataFrame, target: DataFrame,
                    buckets: int = 1024, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023):
    score every raw-pool document by the log importance weight of a
    hashed-bigram bag-of-ngrams model,

        log w(d) = Σ over d's bigram occurrences of
                   [ln p_target(bucket) − ln p_raw(bucket)]

    with add-one smoothing over the fixed `buckets`-bin feature space.
    Where Moore-Lewis fits open-vocabulary unigram LMs, DSIR hashes
    bigrams into a BOUNDED feature space — the bucket-count tables are
    at most `buckets` rows regardless of corpus size, so both model
    joins broadcast at any scale.

    Plan shape: two bucket-bounded aggregates (one per corpus), raw's
    occurrence rows joined against the BROADCAST bucket tables,
    broadcast 1-row totals, one per-doc aggregate. Documents with
    fewer than two tokens have no bigram features and are absent from
    the output (log w undefined), as in the reference recipe.

    Returns (id_col, n_feats, dsir_logw) — the weight is the SUM of
    per-occurrence log-ratios (the paper's importance weight), not a
    length-normalized mean; pair with `dsir_resample` for selection.
    """
    feat = hashed_bigram_feature(F.col("w1"), F.col("w2"), buckets)
    fr = (bigram_rows(raw, text_col, id_col)
          .select("id", feat.alias("f")))
    ft = (bigram_rows(target, text_col, id_col)
          .select(feat.alias("f")))
    cr = fr.groupBy("f").agg(F.count("*").alias("c_r"))
    tot_r = cr.agg(F.sum("c_r").alias("n_r"))
    ct = ft.groupBy("f").agg(F.count("*").alias("c_t"))
    tot_t = ct.agg(F.sum("c_t").alias("n_t"))
    scored = (fr
              .join(F.broadcast(cr), "f")
              .join(F.broadcast(ct), "f", "left")
              .crossJoin(F.broadcast(tot_r))
              .crossJoin(F.broadcast(tot_t))
              .withColumn(
                  "lr",
                  F.log((F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                        / (F.col("n_t") + buckets))
                  - F.log((F.col("c_r") + 1)
                          / (F.col("n_r") + buckets))))
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_feats"),
                 F.round(F.sum("lr"), 6).alias("dsir_logw"))
            .select(F.col("id").alias(id_col),
                    F.col("n_feats").cast("long").alias("n_feats"),
                    "dsir_logw"))


def dsir_stream(spark, src_dir: str, raw_reference: DataFrame,
                target: DataFrame, buckets: int = 256,
                table: str = "dsir_stream", text_col: str = "text",
                id_col: str = "doc_id", sink_dir: str | None = None,
                checkpoint_dir: str | None = None,
                timeout_s: int | None = 120) -> DataFrame:
    """Streaming twin of ``dsir_logweights``: the bucket models are
    trained ONCE from static reference corpora (raw pool + target),
    folded into a COMPLETE per-bucket log-ratio map (every bucket
    0..B−1 carries its add-one-smoothed value, so novel buckets in
    the stream hit the principled c=0 smoothing, never a missing
    key), and each streamed document's weight is one row-local array
    fold — bigram buckets via the shared rolling hash, zero
    aggregation state, plain append mode. Documents with fewer than
    two tokens are dropped, as in the batch scorer.

    Deploy posture: pass ``sink_dir`` — each micro-batch parquet-
    appends the per-doc weights there and the return value is the
    BOUNDED per-batch gauge (batch_id, n, avg/max log-weight), so
    driver state never grows with the stream (VERDICT r11 #1;
    checkpointed, at-least-once — see ``drain_to_parquet``).
    Without it: availableNow → memory sink, the test rig. File-sink
    ≡ memory-sink ≡ batch pinned by test."""
    import math as _math

    from .util import drain_to_parquet, stream_parquet

    def _counts(df):
        feat = hashed_bigram_feature(F.col("w1"), F.col("w2"),
                                     buckets)
        rows = (bigram_rows(df, text_col, id_col)
                .select(feat.alias("f"))
                .groupBy("f").agg(F.count("*").alias("c"))
                .collect())  # bounded: <= buckets rows
        return {r["f"]: r["c"] for r in rows}
    cr = _counts(raw_reference)
    ct = _counts(target)
    if not cr or not ct:
        raise ValueError(
            "dsir_stream: a reference corpus has no bigrams (need "
            ">= 2 tokens in at least one document on each side)")
    n_r, n_t = sum(cr.values()), sum(ct.values())
    lr = {b: _math.log((ct.get(b, 0) + 1) / (n_t + buckets))
          - _math.log((cr.get(b, 0) + 1) / (n_r + buckets))
          for b in range(buckets)}
    lrmap = F.create_map(*[F.lit(x) for kv in sorted(lr.items())
                           for x in kv])

    stream = stream_parquet(spark, src_dir)
    toks = tokens(F.col(text_col))
    feats = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: poly_hash(
            F.concat_ws(" ", F.lower(F.get(toks, i)),
                        F.lower(F.get(toks, i + 1)))) % buckets)
    weight = F.aggregate(feats, F.lit(0.0),
                         lambda acc, f: acc + lrmap[f])
    out = (stream.where(F.size(toks) >= 2)
           .select(F.col(id_col),
                   (F.size(toks) - 1).cast("long").alias("n_feats"),
                   F.round(weight, 6).alias("dsir_logw")))
    if sink_dir is not None:
        return drain_to_parquet(
            spark, out, sink_dir,
            [F.count("*").alias("n"),
             F.round(F.avg("dsir_logw"), 6).alias("avg_logw"),
             F.round(F.max("dsir_logw"), 6).alias("max_logw")],
            "n long, avg_logw double, max_logw double",
            checkpoint_dir=checkpoint_dir, timeout_s=timeout_s,
            what="dsir_stream")
    q = (out.writeStream.format("memory").queryName(table)
         .outputMode("append").trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(
            "dsir_stream did not finish within 120s — refusing to "
            "return a partially populated memory table")
    return spark.table(table)


def dsir_resample(raw: DataFrame, target: DataFrame, m: int = 100,
                  buckets: int = 1024, seed: int = 42,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """DSIR's selection step: sample m documents WITHOUT replacement
    with probability ∝ exp(log w) via the Gumbel-top-k trick — key =
    log w + Gumbel noise, take the m largest keys. The noise is
    DETERMINISTIC: h = poly_hash(id || '#seed') SQUARED mod 2^31−1
    (the rolling hash alone changes only ~31^k for a one-digit id
    change, so adjacent ids would get near-identical noise — the
    squaring makes the step depend on h itself and decorrelates
    neighbours; h² < 2^62 stays inside int64), then u = (h' + 1) /
    (2^31), G = −ln(−ln u) — pure column arithmetic, identical in
    the DuckDB oracle, and u ∈ (0, 1) exactly, so G is always
    finite. Keys are rounded to 6 decimals BEFORE ranking so float
    fold order never decides a selection; ties break by id.

    `orderBy().limit(m)` plans TakeOrderedAndProject (per-partition
    heaps, no global sort); the rank window runs over the m-row
    result only."""
    from pyspark.sql import Window
    w = dsir_logweights(raw, target, buckets=buckets,
                        text_col=text_col, id_col=id_col)
    h = poly_hash(F.concat(F.col(id_col).cast("string"),
                           F.lit(f"#{seed}")))
    u = ((h * h) % POLY_MOD + 1) / F.lit(float(POLY_MOD + 1))
    keyed = w.withColumn(
        "gumbel_key", F.round(F.col("dsir_logw") - F.log(-F.log(u)), 6))
    top = (keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
           .limit(m))
    rank_w = Window.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(rank_w))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full text-analysis projection over a documents table.

    Plan shape (q9, re-tuned r7):
    - spread(): a one-file local read is ONE partition — the whole
      projection would run single-threaded; no-op on well-partitioned
      input.
    - tokenize ONCE into `__toks` (CollapseProject keeps a multiply-
      referenced non-cheap expression materialized).
    - marker words extracted ONCE into `__mk` by a single JVM regexp
      pass; all ~21 per-word marker counts (lang-ID + stop-ratio)
      traverse that tiny array instead of re-traversing the full
      token array in interpreted HOFs.
    - stage the per-language SCORES as columns too: the argmax case
      chain references each score ~2× per language, and interpreted
      projections have no common-subexpression elimination — staged
      non-cheap multiply-referenced columns survive CollapseProject
      and evaluate once. Measured warm at sf0.1: 2.1 s (r6) → 1.1 s
      (markers) → 0.67 s (markers + staged scores)."""
    from .util import spread
    c = F.col(text_col)
    toks = F.col("__toks")
    mk = F.col("__mk")
    staged = spread(df).select("doc_id", c.alias("__text"),
                               tokens(c).alias("__toks"),
                               marker_tokens(c).alias("__mk"))
    ct = F.col("__text")
    # stage the per-language scores too: the argmax case-chain
    # references every score ~2× per language — inlined, each
    # size(filter(...)) would be re-evaluated ~12× per row
    # (interpreted projections have no common-subexpression
    # elimination); staged (non-cheap, multiply-referenced) columns
    # survive CollapseProject and evaluate once
    mk_scores = lang_scores_from(mk)
    scored = staged.select(
        "doc_id", "__text", "__toks",
        occurrences_in(mk, "the").alias("__n_the"),
        *(mk_scores[lang].alias(f"__s_{lang}")
          for lang in sorted(LANG_MARKERS)))
    return scored.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        bpe_token_count(ct).alias("n_bpe_tokens"),
        F.length(ct).alias("n_chars"),
        quality_score_from(ct, toks, n_the=F.col("__n_the"))
        .alias("quality"),
        _lang_id_from_scores({lang: F.col(f"__s_{lang}")
                              for lang in LANG_MARKERS})
        .alias("lang_pred"),
        poly_hash(ct).alias("fingerprint"),
    )


def bigram_rows(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2) occurrence rows, one per adjacent token pair
    (lowercased, raw whitespace-split positions — no empty-token
    filtering, so the oracle's list-comprehension replay is exact).
    Same shuffle-free sequence-explode + array-index shape as
    shingle_rows (r6: no per-document sort window); the input is
    spread across cores first (small single-file tables read as ONE
    partition)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (df.repartition(par)
            .select(F.col(id_col).alias("id"),
                    tokens(F.col(text_col)).alias("__toks"))
            .where(F.size("__toks") >= 2))
    ex = base.select(
        "id", "__toks",
        F.explode(F.sequence(F.lit(0), F.size("__toks") - 2))
        .alias("pos"))
    return ex.select(
        "id",
        F.lower(F.get("__toks", F.col("pos"))).alias("w1"),
        F.lower(F.get("__toks", F.col("pos") + 1)).alias("w2"))


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   lam: float = 0.75) -> DataFrame:
    """Perplexity filtering, one step up from unigram_logprob: per-doc
    mean log-probability under the corpus's own interpolated bigram
    model,

        P(w2 | w1) = lam * c(w1,w2)/c(w1,·)
                     + (1-lam) * (c(·,w2)+1)/(T+V)

    with T = total bigram occurrences and V = |distinct right-hand
    words| (add-one-smoothed unigram backoff).  Repetitive boilerplate
    scores HIGH (its bigrams dominate the corpus model) and incoherent
    token soup scores LOW — the cheap stand-in for KenLM-style
    perplexity gates in curation pipelines.

    Plan: bigram counts in one aggregate over the occurrence rows,
    context/backoff counts derived from that table (not a second pass
    over the corpus), totals as a broadcast 1-row aggregate, then
    narrow joins back on (w1,w2)/(w1)/(w2).  Count tables are
    vocabulary-bounded — far smaller than the corpus at scale.  All
    arithmetic is ln over exact counts, replayed verbatim by the SQL
    oracle."""
    bg = bigram_rows(df, text_col, id_col)
    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    bc = bc.localCheckpoint(eager=False)  # reused 3×: c1, c2-ish, join
    c1 = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = bg.groupBy("w2").agg(F.count("*").alias("c2"))
    totals = c2.agg(F.sum("c2").alias("t_occ"),
                    F.count("*").alias("n_vocab"))
    lp = F.log(F.lit(lam) * F.col("c12") / F.col("c1")
               + F.lit(1.0 - lam) * (F.col("c2") + 1)
               / (F.col("t_occ") + F.col("n_vocab")))
    scored = (bg.join(bc, ["w1", "w2"]).join(c1, "w1").join(c2, "w2")
              .crossJoin(F.broadcast(totals))
              .withColumn("lp", lp))
    return (scored.groupBy("id")
            .agg(F.round(F.avg("lp"), 6).alias("avg_logprob"),
                 F.count("*").alias("n_bigrams")))


def corpus_stats(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """One-row corpus profile — the Zipf/Heaps sanity numbers a
    curation run checks before and after each stage: token and
    vocabulary volume, type-token ratio, hapax fraction (vocabulary
    share occurring once — crawl noise pushes it up, heavy dedup
    pushes it down), and the corpus share of the single most frequent
    term (boilerplate pushes it up).  One groupBy(term) aggregate then
    a 1-row reduction; max-share via max(cnt), no sort."""
    tf = (term_rows(df, text_col, id_col)
          .groupBy("term").agg(F.count("*").alias("cnt")))
    docs_n = df.select(F.countDistinct(F.col(id_col)).alias("n_docs"))
    return (tf.agg(F.sum("cnt").alias("n_tokens"),
                   F.count("*").alias("n_vocab"),
                   F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
                   .alias("n_hapax"),
                   F.max("cnt").alias("top_cnt"))
            .crossJoin(F.broadcast(docs_n))
            .select("n_docs", "n_tokens", "n_vocab",
                    F.round(F.col("n_vocab") / F.col("n_tokens"), 6)
                    .alias("type_token_ratio"),
                    F.round(F.col("n_hapax") / F.col("n_vocab"), 6)
                    .alias("hapax_frac"),
                    F.round(F.col("top_cnt") / F.col("n_tokens"), 6)
                    .alias("top_term_share")))


def corpus_divergence(df_a: DataFrame, df_b: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Unigram-distribution drift between two corpora — the check an
    ingest pipeline runs on every new batch (and a training run on
    every domain) before mixing: KL(A‖M), KL(B‖M) and their mean, the
    Jensen-Shannon divergence (natural log; 0 = identical, ln 2 =
    disjoint), over add-one-smoothed distributions on the UNION
    vocabulary (smoothing gives every union term mass in both, so the
    KLs are finite and the distributions sum to exactly 1).

    Plan: one groupBy(term) per side, a full-outer join on term
    (vocabulary-bounded), broadcast 1-row totals, one final 1-row
    aggregate.  Nothing corpus-sized crosses a shuffle twice."""
    ta = (term_rows(df_a, text_col, id_col)
          .groupBy("term").agg(F.count("*").alias("ca")))
    tb = (term_rows(df_b, text_col, id_col)
          .groupBy("term").agg(F.count("*").alias("cb")))
    u = (ta.join(tb, "term", "full_outer")
         .select("term", F.coalesce("ca", F.lit(0)).alias("ca"),
                 F.coalesce("cb", F.lit(0)).alias("cb")))
    tot = u.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
                F.count("*").alias("v"))
    w = u.crossJoin(F.broadcast(tot))
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("v"))
    pb = (F.col("cb") + 1) / (F.col("nb") + F.col("v"))
    m = (pa + pb) / 2
    agg = w.agg(F.count("*").alias("n_terms_union"),
                F.sum(pa * F.log(pa / m)).alias("_ka"),
                F.sum(pb * F.log(pb / m)).alias("_kb"))
    return agg.select(
        "n_terms_union",
        F.round("_ka", 6).alias("kl_a_m"),
        F.round("_kb", 6).alias("kl_b_m"),
        F.round((F.col("_ka") + F.col("_kb")) / 2, 6)
        .alias("js_divergence"))


def classifier_score(df: DataFrame, weights: DataFrame,
                     bias: float = 0.0, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Linear bag-of-words text classifier scoring — the
    fastText-style model-based quality filter stage (cf. CCNet /
    common LLM-corpus pipelines, where a linear classifier trained on
    a reference corpus gates documents): score = sigmoid(bias +
    mean over token occurrences of weight[token]), OOV tokens
    weighted 0, mean pooling over OCCURRENCES (multiplicity counts,
    as fastText does).

    ``weights`` is a (term, weight) DataFrame — the trained model's
    dense vocabulary row; terms MUST be unique (a duplicated term
    would multiply its token rows through the join and silently skew
    the mean — the same precondition a model file format enforces). Scale shape: the weight table is
    vocabulary-sized (≪ corpus) and explicitly broadcast, so the
    token-row join is shuffle-free on the corpus side; everything
    else is one groupBy(doc). A model can arrive as data OR be
    trained in-engine (llm/train.py train_logreg_hashed — r9);
    scoring is the cluster-scale half either way.

    Returns (id_col, n_terms, raw, score)."""
    tok = df.select(F.col(id_col).alias("id"),
                    F.explode(tokens(F.col(text_col))).alias("term"))
    w = weights.select(F.col("term"),
                       F.col("weight").cast("double").alias("weight"))
    j = tok.join(F.broadcast(w), "term", "left")
    agg = (j.groupBy("id")
           .agg(F.count("*").alias("n_terms"),
                F.avg(F.coalesce(F.col("weight"),
                                 F.lit(0.0))).alias("raw")))
    score = F.lit(1.0) / (F.lit(1.0)
                          + F.exp(-(F.lit(float(bias))
                                    + F.col("raw"))))
    return (agg.select(F.col("id").alias(id_col), "n_terms",
                       F.round("raw", 6).alias("raw"),
                       F.round(score, 6).alias("score")))


# Gopher quality-gate thresholds (Rae et al. 2021, appendix A1.1) —
# the document-level heuristic gate applied before model-based
# filtering. All signals compile to codegen expressions (regexp
# counts + length arithmetic), portable to the RE2 oracle.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]


def gopher_flags(col: Column) -> dict[str, Column]:
    """Per-rule boolean columns of the Gopher gate. Word counts use
    the shared whitespace tokenizer; line-shaped rules run as (?m)
    multiline regexp counts so no explode is needed."""
    toks = tokens(col)
    n_words = F.size(toks)
    # mean chars/word = non-whitespace chars / words
    mean_wl = (F.length(F.regexp_replace(col, r"\s", ""))
               / n_words)
    n_lines = F.regexp_count(col, F.lit("\n")) + 1
    n_bullet = F.regexp_count(col, F.lit(r"(?m)^[-*•]"))
    n_ellipsis = F.regexp_count(col, F.lit(r"(?m)\.\.\.$"))
    n_hash = F.regexp_count(col, F.lit("#"))
    n_alpha_words = F.size(F.regexp_extract_all(
        col, F.lit(r"[^\s]*[A-Za-z][^\s]*"), 0))
    n_stop = F.lit(0)
    for w in GOPHER_STOPWORDS:
        n_stop = n_stop + F.least(F.lit(1), occurrences_in(toks, w))
    return {
        "words_ok": (n_words >= 50) & (n_words <= 100000),
        "mean_word_len_ok": (mean_wl >= 3) & (mean_wl <= 10),
        "hash_ratio_ok": (n_hash / n_words) <= 0.1,
        "ellipsis_ratio_ok": (n_ellipsis / n_lines) <= 0.3,
        "bullet_ratio_ok": (n_bullet / n_lines) <= 0.9,
        "alpha_ratio_ok": (n_alpha_words / n_words) >= 0.8,
        "stopwords_ok": n_stop >= 2,
    }


def gopher_gate(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document-level Gopher quality gate: the seven rule flags plus
    the conjunction. Pure projection — linear, zero shuffle; compose
    with repetition_scores for the dup-ngram rules (separate because
    those need the occurrence aggregation)."""
    flags = gopher_flags(F.col(text_col))
    passed = None
    cols = []
    for name, c in flags.items():
        cols.append(c.alias(name))
        passed = c if passed is None else (passed & c)
    return df.select(F.col(id_col), *cols,
                     passed.alias("gopher_pass"))


def c4_line_filter(df: DataFrame, min_words: int = 3,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation, have >= min_words words,
    and contain neither a curly brace, the token "javascript"
    (case-insensitive), nor "lorem ipsum"; documents reassemble from
    their surviving lines.  Relational shape identical to the
    substring scrub: posexplode lines → codegen predicates → one
    groupBy(doc) order-safe reassembly (array_sort over (pos, line)
    structs).  Documents whose every line is dropped come back with
    empty text — C4 then discards docs under 3 sentences; that
    count survives as n_lines_after for the caller's gate."""
    lines = (df.select(F.col(id_col).alias("id"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("pos", "line")))
    words = F.size(F.split(F.trim(F.col("line")), r"\s+"))
    keep = (F.col("line").rlike(r'[.!?"]\s*$')
            & (words >= min_words)
            & ~F.col("line").contains("{")
            & ~F.col("line").contains("}")
            & ~F.lower(F.col("line")).contains("javascript")
            & ~F.lower(F.col("line")).contains("lorem ipsum"))
    kept = (lines.where(keep).groupBy("id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("pos", "line"))),
                    lambda s: s["line"]), "\n").alias("_clean"),
                 F.count("*").alias("n_lines_after")))
    base = df.withColumn(
        "n_lines_before",
        F.regexp_count(F.col(text_col), F.lit("\n")) + 1)
    return (base.join(kept.withColumnRenamed("id", id_col),
                      id_col, "left")
            .withColumn(text_col, F.coalesce(F.col("_clean"),
                                             F.lit("")))
            .withColumn("n_lines_after",
                        F.coalesce(F.col("n_lines_after"),
                                   F.lit(0).cast("long")))
            .drop("_clean"))


def divergence_stream(spark, src_dir: str, reference: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      max_files_per_batch: int = 1) -> DataFrame:
    """Streaming drift monitor: as document batches arrive on a file
    stream, each micro-batch's unigram distribution is compared to
    the REFERENCE corpus (corpus_divergence — KL both ways + JS) and
    one row per batch is emitted. This is the per-ingest-batch alarm
    a continuous pipeline runs before admitting a batch into the
    mix; the reference side is cached once, so per-batch cost is the
    batch's own aggregation + the vocabulary-bounded join.

    availableNow trigger + foreachBatch; returns a DataFrame of
    (batch_id, n_docs, n_terms_union, kl_batch_m, kl_ref_m,
    js_divergence), one row per micro-batch
    (``max_files_per_batch`` controls batch granularity)."""

    from .util import stream_parquet

    ref = reference.select(id_col, text_col).cache()
    ref.count()
    stream = stream_parquet(
        spark, src_dir, max_files_per_trigger=max_files_per_batch)
    rows = []

    def on_batch(bdf, bid):
        n = bdf.count()
        if not n:
            return
        r = corpus_divergence(bdf, ref, text_col, id_col).collect()[0]
        rows.append((int(bid), n, r["n_terms_union"],
                     r["kl_a_m"], r["kl_b_m"], r["js_divergence"]))

    q = (stream.writeStream.foreachBatch(on_batch)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("divergence_stream did not finish "
                           "within 120s")
    ref.unpersist()
    # _m suffix: these are KL(batch‖M) / KL(ref‖M) against the 50/50
    # MIXTURE (bounded by ln 2), NOT the unbounded KL(batch‖ref) the
    # old kl_batch_ref name implied — alert thresholds calibrated to
    # that name would never fire (review r6)
    return spark.createDataFrame(
        rows, "batch_id long, n_docs long, n_terms_union long, "
              "kl_batch_m double, kl_ref_m double, "
              "js_divergence double")


def divergent_terms(df_a: DataFrame, df_b: DataFrame,
                    k: int | None = 20,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The WHY behind a drift alarm: per-term contributions to the
    Jensen-Shannon divergence (same add-one-smoothed union-vocabulary
    model as corpus_divergence), top-k by absolute contribution with
    the direction of the shift. js_contrib sums over the full
    vocabulary to corpus_divergence's js_divergence — a decomposition,
    not a new statistic.

    Plan: the same two groupBys + vocabulary-bounded join, then ONE
    TakeOrdered top-k on the contribution — no global sort.
    ``k=None`` returns the full unordered decomposition (NO
    TakeOrdered: a huge k would size its priority queue)."""
    ta = (term_rows(df_a, text_col, id_col)
          .groupBy("term").agg(F.count("*").alias("ca")))
    tb = (term_rows(df_b, text_col, id_col)
          .groupBy("term").agg(F.count("*").alias("cb")))
    u = (ta.join(tb, "term", "full_outer")
         .select("term", F.coalesce("ca", F.lit(0)).alias("ca"),
                 F.coalesce("cb", F.lit(0)).alias("cb")))
    tot = u.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
                F.count("*").alias("v"))
    w = u.crossJoin(F.broadcast(tot))
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("v"))
    pb = (F.col("cb") + 1) / (F.col("nb") + F.col("v"))
    m = (pa + pb) / 2
    contrib = (pa * F.log(pa / m) + pb * F.log(pb / m)) / 2
    scored = w.select(
        "term", "ca", "cb",
        F.round(contrib, 9).alias("js_contrib"),
        F.when(pa > pb, F.lit("a")).otherwise(F.lit("b"))
        .alias("heavier_in"))
    if k is None:
        return scored
    return (scored.orderBy(F.col("js_contrib").desc(), "term")
            .limit(k))
