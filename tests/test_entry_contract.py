"""Replica of the driver's t2 correctness gate: run every queries()
entry AND its oracle_sql() side by side, compare row count, column
names, and order-insensitive value multisets. Entries without an
oracle get the weaker rows-run check, exactly like the driver."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from conftest import SF_DIR  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# Entries that legitimately return ZERO rows at sf0.001 — each with
# the reason. Everything else must be non-empty: ROUND_NOTES r5
# records a funnel entry that stayed "green" for a round while both
# sides matched EMPTY sets — matching nothing proves nothing
# (VERDICT r5 #4).
EMPTY_OK: dict[str, str] = {
    # asserts the MQL law `limit N skip N` == empty when skip reaches
    # the limited window's end — zero rows IS the proposition under
    # test (oracle replays `limit 0`)
    "limit_skip_empty_law": "empty result is the law being asserted",
}

# The DECLARED in-cap certificate set (VERDICT r7 #3): the driver
# grades exactly the first 50 queries() entries, so their identity
# must be a deliberate decision, not an accident of insertion order.
# This list IS that decision — one oracle-backed entry per distinct
# operator family, matching the set the driver graded in r7. Changing
# the in-cap set now requires editing this list alongside the reorder
# (and recording the rationale in ROUND_NOTES.md).
INTENDED_IN_CAP = [
    "bfq_all", "file_list_fids", "named_query", "where_cmp",
    "where_regex", "where_present", "where_in_range_set",
    "where_array_any_all", "where_array_len_subscript",
    "where_const_in", "where_not", "where_datetime",
    "where_attributes", "set_union", "set_join", "set_minus",
    "parents_of", "files_with_subsets_rec", "files_from_having",
    "ordered_limit", "skip_limit", "summary_count",
    "summary_key_values", "file_counts_by_namespace",
    "agg_cube_namespace_datatype", "multimodal_features",
    "datasets_pattern", "query_search", "filter_sample",
    "filter_hash_adler32", "doc_text_analysis", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_cross_jaccard",
    "doc_pack_sequences", "dedup_cross_containment",
    "doc_token_budget", "dedup_substring_scrub",
    "doc_split_train_val_test", "doc_classifier_score",
    "doc_curation_v2", "dedup_clusters", "dedup_cluster_stats",
    "embed_cosine_pairs", "embed_topk_bruteforce",
    "events_windowed_agg", "events_sessionize", "events_funnel",
    "events_funnel_counts", "events_retention",
]


def test_in_cap_set_is_the_declared_one():
    """The first 50 queries() entries — the driver's graded set —
    must equal INTENDED_IN_CAP exactly, in order."""
    assert list(QUERIES)[:50] == INTENDED_IN_CAP


def test_entry_count_matches_declared():
    """len(queries()) must equal the declared TOTAL_ENTRIES constant
    (and every entry must have an oracle twin) — a drift here means
    an entry was added/removed without the deliberate-count update
    (ADVICE r8: stale '86 entries' docstrings)."""
    assert len(QUERIES) == entrymod.TOTAL_ENTRIES
    assert len(entrymod.oracle_sql()) == entrymod.TOTAL_ENTRIES


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _rows_spark(df):
    cols = sorted(df.columns)
    return cols, sorted(tuple(_norm(r[c]) for c in cols)
                        for r in df.collect())


def _rows_duck(duck, sql, cols):
    cur = duck.execute(sql)
    names = [d[0] for d in cur.description]
    assert sorted(names) == cols, f"oracle columns {names} != {cols}"
    idx = {n: i for i, n in enumerate(names)}
    return sorted(tuple(_norm(row[idx[c]]) for c in cols)
                  for row in cur.fetchall())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert rows is not None and len(df.columns) >= 1


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_entry_vs_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    cols, got = _rows_spark(df)
    if name not in EMPTY_OK:
        assert len(got) > 0, \
            f"{name}: returned 0 rows at sf0.001 — an empty match " \
            f"verifies nothing; add to EMPTY_OK with a reason if " \
            f"this is legitimate"
    if name not in ORACLES:
        # rows-only check (engine-specific hashing / stateful ops)
        assert isinstance(got, list)
        return
    want = _rows_duck(duck, ORACLES[name], cols)
    assert len(got) == len(want), \
        f"{name}: row count {len(got)} != oracle {len(want)}"
    assert got == want, f"{name}: value mismatch"


def test_documents_fixture_is_ascii(spark):
    """The multimodal_features oracle equates characters with UTF-8
    bytes (codepoint histogram vs byte histogram) — valid only for
    ASCII text. Pin the precondition so a future non-ASCII fixture
    fails HERE with the right message instead of as a confusing
    value-hash mismatch (review r6)."""
    from pyspark.sql import functions as F
    n = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
         .where(F.length("text")
                != F.octet_length(F.encode("text", "utf-8")))
         .count())
    assert n == 0, (
        f"{n} non-ASCII documents: the multimodal_features oracle's "
        f"char==byte assumption no longer holds — make the oracle "
        f"byte-exact before using this fixture")
