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
