"""Parser unit tests — query shapes from /root/reference/docs/mql.rst."""

import pytest

from metacat_spark.mql import parse
from metacat_spark.mql.ast import (ArrayAll, ArrayAny, ArrayLen,
                                   BasicFileQuery, ChildrenOf, Cmp, Const,
                                   ConstIn, DatasetQuery, FileList,
                                   FileQuery, FilterOp, InRange, InSet,
                                   JoinOp, LimitOp, MetaAnd, MetaAttr,
                                   MetaNot, MetaOr, MinusOp, NamedQueryRef,
                                   ObjectAttr, OrderedOp, ParentsOf, Present,
                                   QueryQuery, SkipOp, Subscript, UnionOp,
                                   WhereOp)


def fq(text, **kw):
    q = parse(text, **kw)
    assert isinstance(q, FileQuery)
    return q.tree


def test_basic():
    t = fq("files from dune:all")
    assert isinstance(t, BasicFileQuery)
    assert t.datasets[0].namespace == "dune" and t.datasets[0].name == "all"
    assert t.datasets[0].kind == "did"


def test_bare_files():
    t = fq("files where core.run > 5")
    assert isinstance(t, WhereOp)
    assert isinstance(t.child, BasicFileQuery) and t.child.datasets == []


def test_multi_dataset_and_pattern():
    t = fq("files from datasets dune:all, mc:mc*, matching test:b%")
    assert isinstance(t, BasicFileQuery)
    assert len(t.datasets) == 3
    assert t.datasets[1].kind == "pattern"
    assert t.datasets[2].kind == "pattern" and t.datasets[2].name == "b%"


def test_where_ops():
    t = fq("files from a:b where core.run = 123 and core.x < 0.5 "
           "or core.data_type != mc")
    e = t.exp
    assert isinstance(e, MetaOr)
    assert isinstance(e.children[0], MetaAnd)
    c = e.children[0].children[0]
    assert c.scalar == MetaAttr("core.run") and c.op == "=" \
        and c.const == Const("int", 123)
    assert e.children[1].const == Const("str", "mc")


def test_regex_present_not():
    t = fq('files from a:b where prod.comment ~* "felix" '
           'and beam.status present and detector.id not present '
           'and !(core.good = true)')
    ch = t.exp.children
    assert ch[0].op == "~*"
    assert ch[1] == Present("beam.status", False)
    assert ch[2] == Present("detector.id", True)
    assert isinstance(ch[3], MetaNot)


def test_ranges_sets():
    t = fq("files from a:b where core.run in 100:200 "
           "and core.x not in 0.1:0.2 "
           "and core.data_type in (mc, data) "
           'and core.version not in ("1.0", "2.1")')
    ch = t.exp.children
    assert isinstance(ch[0], InRange) and not ch[0].negated
    assert isinstance(ch[1], InRange) and ch[1].negated
    assert isinstance(ch[2], InSet) and [v.value for v in ch[2].values] == ["mc", "data"]
    assert ch[3].negated


def test_arrays():
    t = fq('files from a:b where core.runs[any] = 123 '
           "and data.sequence[all] < 9 and data.sequence[2] = 2 "
           'and data.trigger_bits["muon"] = 1 and len(core.runs) > 1 '
           "and 42 in core.runs and a1 not in detector.modules")
    ch = t.exp.children
    assert ch[0].scalar == ArrayAny("core.runs")
    assert ch[1].scalar == ArrayAll("data.sequence")
    assert ch[2].scalar == Subscript("data.sequence", 2)
    assert ch[3].scalar == Subscript("data.trigger_bits", "muon")
    assert ch[4].scalar == ArrayLen("core.runs")
    assert ch[5] == ConstIn(Const("int", 42), "core.runs", False)
    assert ch[6] == ConstIn(Const("str", "a1"), "detector.modules", True)


def test_quoted_const_in():
    t = fq('files from a:b where "a1" in detector.modules')
    assert t.exp == ConstIn(Const("str", "a1"), "detector.modules", False)


def test_datetime_date():
    t = fq('files from a:b where core.timestamp > datetime("2011-11-04 00:05:23") '
           'and core.timestamp = date(2020-04-01) '
           'and core.timestamp < date(2020-04-01, "-05:00")')
    ch = t.exp.children
    assert ch[0].const.kind == "datetime"
    assert abs(ch[0].const.value - 1320365123.0) < 1
    assert ch[1].const.kind == "date"
    assert ch[1].const.value_end == ch[1].const.value + 86400
    assert ch[2].const.value == ch[1].const.value + 5 * 3600


def test_set_algebra():
    t = fq("union(files from a:b, files from a:c) - "
           "join(files from a:d, files from a:e where core.run > 5)")
    assert isinstance(t, MinusOp)
    assert isinstance(t.left, UnionOp) and len(t.left.children) == 2
    assert isinstance(t.right, JoinOp)
    assert isinstance(t.right.children[1], WhereOp)


def test_bracket_sugar():
    t = fq("[files from a:b, {files from a:c, files from a:d}]")
    assert isinstance(t, UnionOp)
    assert isinstance(t.children[1], JoinOp)


def test_provenance():
    t = fq("parents(children(files from a:b))")
    assert isinstance(t, ParentsOf) and isinstance(t.child, ChildrenOf)


def test_skip_limit_ordered():
    t = fq("files from a:b skip 100 limit 1000 skip 10 skip 5 limit 50 ordered")
    assert isinstance(t, OrderedOp)
    assert isinstance(t.child, LimitOp) and t.child.n == 50
    assert isinstance(t.child.child, SkipOp) and t.child.child.n == 5


def test_where_after_limit():
    t = fq("files from a:b limit 10 where core.run > 5")
    assert isinstance(t, WhereOp) and isinstance(t.child, LimitOp)


def test_file_list_and_fids():
    t = fq("files a:f1.data, b:f2.data")
    assert t == FileList("did", [("a", "f1.data"), ("b", "f2.data")])
    t = fq("fids abc123, def456")
    assert t == FileList("fid", ["abc123", "def456"])


def test_named_query():
    t = fq("files selected by dune:favorite")
    assert t == NamedQueryRef("dune", "favorite")
    t = fq("files selected common", default_namespace="x")
    assert t == NamedQueryRef("x", "common")


def test_filter():
    t = fq("filter sample(0.5)(files from a:b)")
    assert isinstance(t, FilterOp) and t.name == "sample"
    assert t.params == [Const("float", 0.5)]
    t = fq('filter myf(3, "test", pi=3.14)(files from a:b, files from a:c)')
    assert t.params[0] == Const("int", 3)
    assert t.kwparams["pi"] == Const("float", 3.14)
    assert len(t.children) == 2


def test_with_namespace():
    t = fq('with namespace="s" (files from A - files from B)')
    assert isinstance(t, MinusOp)
    assert t.left.datasets[0].namespace == "s"
    assert t.right.datasets[0].namespace == "s"
    t = fq('with namespace = "x" union(files from A, with namespace = "y" '
           "join(files from B, files from C), files from y2:D)")
    assert t.children[0].datasets[0].namespace == "x"
    assert t.children[1].children[0].datasets[0].namespace == "y"
    assert t.children[2].datasets[0].namespace == "y2"


def test_dataset_query():
    q = parse("datasets matching dune:urgent_*")
    assert isinstance(q, DatasetQuery)
    assert q.selectors[0].kind == "pattern"
    q = parse('datasets matching regexp test:"^b[0-9]+$" having data.type = mc')
    s = q.selectors[0]
    assert s.kind == "regexp" and s.having is not None
    q = parse("datasets test:all with subsets recursively")
    assert q.selectors[0].with_subsets and q.selectors[0].recursively


def test_files_from_with_subsets():
    t = fq("files from test:all with subsets recursively where core.run > 1")
    assert isinstance(t, WhereOp)
    assert t.child.datasets[0].recursively


def test_query_query():
    q = parse('queries matching test:* where file.quality > 2')
    assert isinstance(q, QueryQuery)
    assert q.pattern.kind == "pattern"
    assert q.where is not None


def test_object_attr():
    t = fq("files from a:b where namespace = dune and size > 1000")
    ch = t.exp.children
    assert ch[0].scalar == ObjectAttr("namespace")
    assert ch[1].scalar == ObjectAttr("size")


def test_comments():
    t = fq("files from a:b # trailing comment\n where core.run > 5")
    assert isinstance(t, WhereOp)


def test_negative_numbers():
    t = fq("files from a:b where core.x > -0.5 and core.run in (-1, 2)")
    assert t.exp.children[0].const == Const("float", -0.5)
    assert t.exp.children[1].values[0] == Const("int", -1)


def test_union_of_datasets_comma_disambiguation():
    t = fq("union(files from a:b, files from c:d, fids x1)")
    assert isinstance(t, UnionOp) and len(t.children) == 3


def test_trailing_garbage_raises():
    with pytest.raises(Exception):
        parse("files from a:b extra stuff ~")


def test_with_namespace_dataset_query():
    # top-level scope header applies to dataset queries
    # (docs/mql.rst:405-472; old grammar attached `with param_def_list`
    # to the whole query)
    q = parse('with namespace = "dune" datasets matching urgent_*')
    assert isinstance(q, DatasetQuery)
    assert q.selectors[0].namespace == "dune"
    assert q.selectors[0].name == "urgent_*"
    # explicit namespace overrides the scope header
    q = parse('with namespace = "dune" datasets mc:flag_r, low_1')
    assert q.selectors[0].namespace == "mc"
    assert q.selectors[1].namespace == "dune"
    # header also scopes query-queries
    q = parse('with namespace = "dune" queries matching fav*')
    assert isinstance(q, QueryQuery)
    assert q.pattern.namespace == "dune"


def test_with_namespace_query_param_still_wins_locally():
    # the API-level default_namespace fills unscoped names only
    q = parse("datasets matching urgent_*", default_namespace="x")
    assert q.selectors[0].namespace == "x"
    q = parse('with namespace = "y" datasets matching urgent_*',
              default_namespace="x")
    assert q.selectors[0].namespace == "y"


def test_dataset_ancestors():
    q = parse("datasets dune:urgent_0 with ancestors")
    s = q.selectors[0]
    assert s.with_ancestors and not s.with_subsets and not s.recursively
    q = parse("datasets dune:urgent_0 with ancestors recursively")
    assert q.selectors[0].with_ancestors and q.selectors[0].recursively
    q = parse("datasets test:all with subsets recursively")
    assert q.selectors[0].with_subsets and not q.selectors[0].with_ancestors


# ----------------------------------------------------------- fuzzing
def test_parser_never_crashes_on_garbage():
    """The HTTP server hands raw client text to the parser: arbitrary
    input must produce a clean MQLSyntaxError (the 400 contract),
    never an internal exception (IndexError/AttributeError/...)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from metacat_spark.mql.lexer import MQLSyntaxError

    tokens = st.sampled_from(
        ["files", "from", "where", "union", "join", "(", ")", "[", "]",
         "{", "}", "-", ",", ":", "datasets", "matching", "regexp",
         "limit", "skip", "ordered", "filter", "present", "not", "in",
         "and", "or", "!", "~", "=", "<", ">", "<=", "core.run", "42",
         '"str"', "a:b", "len", "exists", "like", "datetime", "fids",
         "selected", "by", "with", "subsets", "recursively", "having",
         "queries", "summary", "'", '"', "\\", "%", "*", "?", ".",
         "..", "0.5", "-3", "true", "x[any]", "x[3]", ""])

    @settings(max_examples=400, deadline=None)
    @given(st.lists(tokens, min_size=0, max_size=12).map(" ".join))
    def fuzz(text):
        try:
            parse(text)
        except MQLSyntaxError:
            pass  # the contract: clean syntax error

    fuzz()


def test_quoted_point_lookup():
    """Quoted namespaces/names are legal in `files ns:name` point
    lookups (review r6: the peek guard rejected string tokens with a
    misleading trailing-input error)."""
    from metacat_spark.mql import parse
    from metacat_spark.mql.ast import FileList
    q = parse('files "my ns":f1, plain:f2')
    t = q.tree
    assert isinstance(t, FileList)
    assert t.items == [("my ns", "f1"), ("plain", "f2")]


def test_string_escapes_preserve_regex_backslashes():
    """String literals keep backslash escapes (the reference strips
    only the enclosing quotes) — review r6: \\d was corrupted to a
    literal d, silently changing every regex predicate."""
    from metacat_spark.mql.lexer import tokenize
    ts = tokenize(r'core.version ~ "^\d+\.\d+$"')
    assert ts[-1].value == r"^\d+\.\d+$"
    # quote escapes still unescape so quotes are embeddable
    assert tokenize(r'"say \"hi\""')[0].value == 'say "hi"'


def test_having_negative_constant_parses():
    """'-5' after `having` lexes as a signed number, not a minus
    operator (review r6)."""
    from metacat_spark.mql import parse
    parse("datasets dune:d1 having -5 in core.runs")   # must not raise


def test_dangling_exponent_is_syntax_error():
    """'1e+' must be a clean MQLSyntaxError, not a raw ValueError
    escaping the parser (review r6)."""
    import pytest as _pt
    from metacat_spark.mql import parse
    from metacat_spark.mql.lexer import MQLSyntaxError
    with _pt.raises(MQLSyntaxError):
        parse("files where core.x = 1e+")
