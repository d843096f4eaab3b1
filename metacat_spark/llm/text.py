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


def word_occurrences(col: Column, word: str) -> Column:
    """Exact-token occurrence count (portable: list_filter in DuckDB)."""
    return F.size(F.filter(tokens(col), lambda x: x == F.lit(word)))


def poly_hash(col: Column) -> Column:
    """Deterministic polynomial rolling hash of a string:
    fold(chars, acc -> (acc*31 + ascii(c)) % (2^31-1)).
    DuckDB mirror: list_reduce(list_prepend(0, codes), ...)"""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * POLY_MUL + F.ascii(x)) % POLY_MOD)


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of mean word length
    (penalize <3 or >10), stopword presence, and non-alnum ratio.
    Deterministic arithmetic — same formula runs in the oracle."""
    n_chars = F.length(col)
    n_words = token_count(col)
    avg_wlen = (n_chars - (n_words - 1)) / n_words
    stop_ratio = word_occurrences(col, "the") / n_words
    alnum = F.length(F.regexp_replace(col, r"[^a-zA-Z0-9 ]", ""))
    punct_ratio = (n_chars - alnum) / n_chars
    wlen_term = F.when((avg_wlen >= 3.0) & (avg_wlen <= 10.0), F.lit(1.0)) \
                 .otherwise(F.lit(0.5))
    return F.round(
        wlen_term * 0.5
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.2,
        6)


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-stopword count per language."""
    return {lang: sum((word_occurrences(col, w) for w in words),
                      F.lit(0))
            for lang, words in LANG_MARKERS.items()}


def lang_id(col: Column) -> Column:
    """argmax over marker counts; ties/zero → 'und' (undetermined)."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # deterministic tie-break: fixed language order, strict >
    for lang in sorted(LANG_MARKERS):
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full text-analysis projection over a documents table."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.length(c).alias("n_chars"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        poly_hash(c).alias("fingerprint"),
    )
