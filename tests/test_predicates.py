"""Predicate-language tests vs the DuckDB oracle (sf0.001).

Covers every row of SURVEY.md §2.3 plus the documented metamorphic
equivalences (docs/mql.rst:104-114,227-243,529-539,563-579).
"""

import pytest

from conftest import duck_ids, ids_of

FID = ("printf('f%09d%d%07d%05d', l_orderkey, l_linenumber, "
       "l_partkey, l_suppkey)")
ACTIVE = "l_orderkey % 20 <> 0"


def check(engine, duck, mql_where, duck_where, nonempty=True):
    got = ids_of(engine.query(f"files from test:all where {mql_where}"))
    want = duck_ids(
        duck, f"select {FID} from lineitem where {ACTIVE} and ({duck_where})")
    assert got == want, f"mismatch for {mql_where!r}"
    if nonempty:
        assert got, f"empty result for {mql_where!r} (weak test)"
    return got


def test_cmp_ops(engine, duck):
    check(engine, duck, "core.run > 250", "l_orderkey % 500 > 250")
    check(engine, duck, "core.run != 42", "l_orderkey % 500 <> 42")
    check(engine, duck, "core.x <= 0.3", "l_discount * 10 <= 0.3")
    check(engine, duck, "core.data_type = mc", "l_returnflag = 'A'")
    check(engine, duck, 'core.version = "2.1"',
          "1 + l_partkey % 3 = 2 and l_suppkey % 4 = 1")


def test_bool(engine, duck):
    check(engine, duck, "core.good = true", "l_quantity > 25")
    check(engine, duck, "core.good = false", "l_quantity <= 25")


def test_regex(engine, duck):
    base = "l_suppkey % 10 < 8"
    check(engine, duck, 'prod.comment ~ "FELIX"',
          f"{base} and l_orderkey % 4 = 0")
    check(engine, duck, 'prod.comment ~* "felix"',
          f"{base} and l_orderkey % 4 in (0, 2)")
    check(engine, duck, 'prod.comment !~ "test"',
          f"{base} and l_orderkey % 4 <> 1")
    check(engine, duck, 'prod.comment !~* "felix"',
          f"{base} and l_orderkey % 4 in (1, 3)")


def test_like(engine, duck):
    """`like` — reserved in the reference grammar, implemented here
    as SQL LIKE (full-match, %/_ wildcards), missing-key ⇒ false."""
    check(engine, duck, 'core.version like "3.%"',
          "1 + l_partkey % 3 = 3")
    check(engine, duck, 'core.data_type like "c%n"',
          "l_returnflag = 'N'")


def test_present(engine, duck):
    check(engine, duck, "beam.status present", "l_partkey % 10 < 7")
    check(engine, duck, "beam.status not present", "l_partkey % 10 >= 7")
    check(engine, duck, 'beam.status = "on"',
          "l_partkey % 10 < 7 and l_suppkey % 2 = 0")


def test_in_range_set(engine, duck):
    check(engine, duck, "core.run in 100:200",
          "l_orderkey % 500 between 100 and 200")
    check(engine, duck, "core.run not in 100:200",
          "l_orderkey % 500 not between 100 and 200")
    check(engine, duck, "core.data_type in (mc, data)",
          "l_returnflag in ('A', 'R')")
    check(engine, duck, "core.data_type not in (mc, nosuch)",
          "l_returnflag <> 'A'")
    check(engine, duck, 'core.version in "1.0":"2.1"',
          "printf('%d.%d', 1 + l_partkey % 3, l_suppkey % 4) "
          "between '1.0' and '2.1'")
    check(engine, duck, "core.x in 0.2:0.5",
          "l_discount * 10 between 0.2 and 0.5")


def test_array_any_all(engine, duck):
    check(engine, duck, "core.runs[any] > 490",
          "l_orderkey % 500 > 490 or l_partkey % 500 > 490")
    check(engine, duck, "core.runs[all] < 100",
          "l_orderkey % 500 < 100 and l_partkey % 500 < 100")
    # beam missing arrays ⇒ false
    check(engine, duck, 'detector.modules[any] = "a1"',
          "l_partkey % 17 <> 0 and l_partkey % 2 = 1")
    # [all] over strings; missing array ⇒ false (NULL semantics)
    check(engine, duck, 'detector.modules[all] != "a1"',
          "l_partkey % 17 <> 0 and l_partkey % 2 = 0")


def test_documented_fib_edge(engine, duck):
    """data.sequence[any] in 6:7 is FALSE for every row (no single fib
    element in [6,7]); the and-of-anys version is TRUE for len ≥ 6
    (docs/mql.rst:563-579)."""
    got = ids_of(engine.query(
        "files from test:all where data.sequence[any] in 6:7"))
    assert got == []
    check(engine, duck,
          "data.sequence[any] >= 6 and data.sequence[any] <= 7",
          "l_orderkey % 7 >= 5")


def test_array_len_subscript(engine, duck):
    check(engine, duck, "len(data.sequence) > 5", "l_orderkey % 7 > 4")
    check(engine, duck, "len(data.sequence) in 2:3",
          "l_orderkey % 7 in (1, 2)")
    # fib[2] = 2 exists when len >= 3
    check(engine, duck, "data.sequence[2] = 2", "l_orderkey % 7 >= 2")
    # negative python-style index: last element
    check(engine, duck, "data.sequence[-1] = 13", "l_orderkey % 7 = 6")
    check(engine, duck, 'data.trigger_bits["muon"] = 1',
          "l_orderkey % 2 = 1")
    check(engine, duck, 'data.trigger_bits["electron"] = 0',
          "l_suppkey % 2 = 0")


def test_any_over_dict_values(engine, duck):
    """[any]/[all] work over dict values too (meta_evaluator.py:80-86)."""
    check(engine, duck, "data.trigger_bits[any] = 1",
          "l_orderkey % 2 = 1 or l_suppkey % 2 = 1")
    check(engine, duck, "data.trigger_bits[all] = 0",
          "l_orderkey % 2 = 0 and l_suppkey % 2 = 0")


def test_const_in(engine, duck):
    check(engine, duck, "42 in core.runs",
          "l_orderkey % 500 = 42 or l_partkey % 500 = 42")
    check(engine, duck, "42 not in core.runs",
          "l_orderkey % 500 <> 42 and l_partkey % 500 <> 42")
    check(engine, duck, '"a1" in detector.modules',
          "l_partkey % 17 <> 0 and l_partkey % 2 = 1")
    check(engine, duck, '"xyz" not in detector.modules',
          "l_partkey % 17 <> 0")
    # string const against a scalar string key → substring search
    # (mql10.py:1094-1127)
    check(engine, duck, '"FELIX" in prod.comment',
          "l_suppkey % 10 < 8 and l_orderkey % 4 = 0")


def test_const_in_equiv(engine):
    """"a1" in detector.modules ≡ detector.modules[any] = "a1"
    (docs/mql.rst:529-532)."""
    a = ids_of(engine.query(
        'files from test:all where "a1" in detector.modules'))
    b = ids_of(engine.query(
        'files from test:all where detector.modules[any] = "a1"'))
    assert a == b and a


def test_all_any_negation_equiv(engine):
    """array[all] != x ≡ !(array[any] == x) (docs/mql.rst:534-539)."""
    a = ids_of(engine.query(
        'files from test:all where detector.modules[all] != "a2"'))
    b = ids_of(engine.query(
        'files from test:all where !(detector.modules[any] = "a2")'))
    assert a == b and a


def test_not_and_or(engine, duck):
    check(engine, duck, "!(core.good = true and core.run < 250)",
          "not (l_quantity > 25 and l_orderkey % 500 < 250)")
    check(engine, duck,
          "core.run < 10 or core.run > 490 or core.data_type = calibration",
          "l_orderkey % 500 < 10 or l_orderkey % 500 > 490 "
          "or l_returnflag = 'N'")
    # NOT over a sometimes-missing key: missing ⇒ false, even negated
    check(engine, duck, '!(beam.status = "on")',
          "l_partkey % 10 < 7 and l_suppkey % 2 = 1")


def test_chained_where_merge(engine):
    """chained where ≡ single and (docs/mql.rst:104-114)."""
    a = ids_of(engine.query(
        "files from test:all where core.good = true where core.run > 100"))
    b = ids_of(engine.query(
        "files from test:all where core.good = true and core.run > 100"))
    assert a == b and a


def test_datetime(engine, duck):
    check(engine, duck,
          'core.timestamp > datetime("1996-06-01")',
          "epoch(l_shipdate) > epoch(timestamp '1996-06-01')")
    check(engine, duck,
          "core.timestamp in datetime(1995-01-01):datetime(1995-12-31)",
          "epoch(l_shipdate) between epoch(timestamp '1995-01-01') "
          "and epoch(timestamp '1995-12-31')")


def test_date_window(engine, duck):
    """date() comparisons expand to 24-hour windows
    (mql10.py:1052-1082)."""
    check(engine, duck, "core.timestamp = date(1995-06-15)",
          "l_shipdate >= timestamp '1995-06-15' "
          "and l_shipdate < timestamp '1995-06-16'")
    check(engine, duck, "core.timestamp != date(1995-06-15)",
          "l_shipdate < timestamp '1995-06-15' "
          "or l_shipdate >= timestamp '1995-06-16'")
    check(engine, duck, "core.timestamp > date(1995-06-15)",
          "l_shipdate >= timestamp '1995-06-16'")
    check(engine, duck, "core.timestamp <= date(1995-06-15)",
          "l_shipdate < timestamp '1995-06-16'")
    check(engine, duck,
          "core.timestamp in date(1995-06-01):date(1995-06-30)",
          "l_shipdate >= timestamp '1995-06-01' "
          "and l_shipdate < timestamp '1995-07-01'")
    # timezone shift: midnight -05:00 = 05:00 UTC
    check(engine, duck,
          'core.timestamp = date(1995-06-15, "-05:00")',
          "l_shipdate >= timestamp '1995-06-15 05:00:00' "
          "and l_shipdate < timestamp '1995-06-16 05:00:00'")


def test_object_attributes(engine, duck):
    check(engine, duck, "namespace = dune and size > 50000000",
          "l_orderkey % 10 < 5 and round(l_extendedprice*1000) > 50000000")
    check(engine, duck, "creator = alice", "l_suppkey % 8 = 0")
    check(engine, duck,
          'created_timestamp > datetime("1996-06-01")',
          "epoch(l_shipdate) > epoch(timestamp '1996-06-01')")
    check(engine, duck, 'name ~ "\\\\.root$"', "l_partkey % 3 = 1")


def test_retired_attribute(engine, duck):
    got = ids_of(engine.query("files from test:all where retired = true",
                              include_retired=True))
    want = duck_ids(duck,
                    f"select {FID} from lineitem where l_orderkey % 20 = 0")
    assert got == want and got


def test_json_fallback_unshredded(engine, duck, catalog):
    """Unshredded keys go through get_json_object over the JSON column
    with literal-driven casts — same results as the shredded path."""
    from metacat_spark.predicate import PredicateCompiler
    from metacat_spark.schema import FILE_ATTRIBUTES, MetaSchema

    fallback = PredicateCompiler(MetaSchema([]), FILE_ATTRIBUTES, "metadata")
    orig = engine.file_pred
    engine.file_pred = fallback
    try:
        check(engine, duck, "core.run > 250 and core.good = true",
              "l_orderkey % 500 > 250 and l_quantity > 25")
        check(engine, duck, "beam.status not present",
              "l_partkey % 10 >= 7")
        check(engine, duck, "core.runs[any] > 490",
              "l_orderkey % 500 > 490 or l_partkey % 500 > 490")
        check(engine, duck, 'core.data_type = "mc"', "l_returnflag = 'A'")
        check(engine, duck, "data.sequence[2] = 2", "l_orderkey % 7 >= 2")
    finally:
        engine.file_pred = orig


def test_const_in_scalar_equality_unshredded(spark):
    """`5 in k` on an UNSHREDDED SCALAR k=5 keeps the row — matching
    the row evaluator and the shredded path (review r6: the array
    coercion alone yielded NULL and dropped it); non-numeric strings
    under the typed compare are excluded, not an ANSI crash."""
    from metacat_spark.mql import parse
    from metacat_spark.predicate import PredicateCompiler
    from metacat_spark.schema import MetaSchema

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": [5, 6]}'), (3, '{"k": 7}'),
         (4, '{"k": "abc"}')],
        "rid int, metadata string")
    pc = PredicateCompiler(MetaSchema([]), {}, json_column="metadata")
    exp = parse("files where 5 in k").tree.exp
    got = sorted(r["rid"] for r in df.where(pc.compile(exp)).collect())
    assert got == [1, 2]
    # row evaluator agrees on every row
    from metacat_spark.evaluator import RowEvaluator
    import json as _json
    for rid, meta in [(1, {"k": 5}), (2, {"k": [5, 6]}),
                      (3, {"k": 7}), (4, {"k": "abc"})]:
        want = rid in (1, 2)
        assert bool(RowEvaluator(meta).passes(exp)) == want, rid
