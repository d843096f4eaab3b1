"""Recursive-descent parser for MQL → AST.

Productions follow the reference Lark grammar
(/root/reference/metacat/mql/grammar/{common,file_query,dataset_query,
query_query}.py) with the documented `with namespace="ns"` scoping rule
(/root/reference/docs/mql.rst:405-472). The output is our own AST
(metacat_spark.mql.ast), not the reference's Node tree.

Parse-time rewrites performed here, mirroring the reference converter
(mql10.py):
- datetime()/date() constants folded to epoch floats (mql10.py:848-893)
- default-namespace application from `with namespace=` scopes
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Optional

from .ast import (ArrayAll, ArrayAny, ArrayLen, BasicFileQuery, ChildrenOf,
                  Cmp, Const, ConstIn, DatasetQuery, DatasetSelector,
                  FileList, FileQuery, FilterOp, InRange, InSet,
                  JsonPathExists, JoinOp, LimitOp, MetaAnd, MetaAttr,
                  MetaNot, MetaOr, MinusOp, NamedQueryRef, ObjectAttr,
                  OrderedOp, ParentsOf, Present, QueryQuery, SkipOp,
                  Subscript, UnionOp, WhereOp)
from .lexer import MQLSyntaxError, Token, tokenize

_CMPOPS = {"<", "<=", ">", ">=", "=", "==", "!=", "~", "~*", "!~", "!~*"}

# words that begin a file-query term (used for comma disambiguation
# between dataset lists and file-query lists)
_FQ_START_WORDS = {"files", "file", "fids", "fid", "union", "join", "filter",
                   "parents", "children", "with"}


def _parse_datetime(text: str) -> float:
    """ISO-8601 subset → epoch seconds (mirrors mql10.py:848-869)."""
    t = text.strip().replace("T", " ")
    m = re.match(
        r"^(\d{4})-(\d{2})-(\d{2})"
        r"(?:[ ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?)?"
        r"(?:\s*([+-])(\d{2}):(\d{2}))?$", t)
    if not m:
        raise MQLSyntaxError(f"unparseable datetime: {text!r}")
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh = int(m.group(4) or 0)
    mm = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    frac = float("0." + m.group(7)) if m.group(7) else 0.0
    dt = _dt.datetime(y, mo, d, hh, mm, ss, tzinfo=_dt.timezone.utc)
    epoch = dt.timestamp() + frac
    if m.group(8):
        sign = 1 if m.group(8) == "+" else -1
        offs = sign * (int(m.group(9)) * 3600 + int(m.group(10)) * 60)
        epoch -= offs
    return epoch


def _parse_date(text: str, tz: Optional[str]) -> tuple[float, float]:
    """YYYY-MM-DD [+/-hh:mm] → (midnight_epoch, midnight_epoch+86400)."""
    m = re.match(r"^(\d{4})-(\d{2})-(\d{2})$", text.strip())
    if not m:
        raise MQLSyntaxError(f"unparseable date: {text!r}")
    dt = _dt.datetime(int(m.group(1)), int(m.group(2)), int(m.group(3)),
                      tzinfo=_dt.timezone.utc)
    epoch = dt.timestamp()
    if tz:
        tm = re.match(r"^([+-])(\d{2}):(\d{2})$", tz.strip())
        if not tm:
            raise MQLSyntaxError(f"unparseable timezone: {tz!r}")
        sign = 1 if tm.group(1) == "+" else -1
        epoch -= sign * (int(tm.group(2)) * 3600 + int(tm.group(3)) * 60)
    return epoch, epoch + 86400.0


class Parser:
    def __init__(self, text: str, default_namespace: Optional[str] = None):
        self.toks = tokenize(text)
        self.pos = 0
        self.ns_stack: list[Optional[str]] = [default_namespace]

    # ------------------------------------------------------------ plumbing
    def peek(self, ahead: int = 0) -> Optional[Token]:
        i = self.pos + ahead
        return self.toks[i] if i < len(self.toks) else None

    def next(self) -> Token:
        if self.pos >= len(self.toks):
            raise MQLSyntaxError("unexpected end of query")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def at_word(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "word" and t.value in words

    def at_punct(self, p: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "punct" and t.value == p

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "op" and t.value == op

    def expect_word(self, word: str) -> Token:
        t = self.next()
        if t.kind != "word" or t.value != word:
            raise MQLSyntaxError(f"expected {word!r}, got {t.value!r} at {t.pos}")
        return t

    def expect_punct(self, p: str) -> Token:
        t = self.next()
        if t.kind != "punct" or t.value != p:
            raise MQLSyntaxError(f"expected {p!r}, got {t.value!r} at {t.pos}")
        return t

    @property
    def default_namespace(self) -> Optional[str]:
        return self.ns_stack[-1]

    # --------------------------------------------------------------- entry
    def parse_top(self):
        # A top-level `with namespace = "ns"` scope header may precede
        # any query kind (docs/mql.rst:405-472; the reference's old
        # grammar attached `with param_def_list` to the whole query,
        # grammar/old/grammar10.py:2, and BasicDatasetQuery.apply_params
        # consumes the namespace param, mql10.py:559-562). For file
        # queries the header is handled inside parse_fq_primary so that
        # nested per-term scopes keep working; here we only hoist it for
        # dataset and query queries.
        if self.at_word("with") and self.peek(1) is not None \
                and self.peek(1).value == "namespace":
            save = self.pos
            ns = self.parse_namespace_header()
            if self.at_word("datasets", "queries"):
                self.ns_stack.append(ns)
                try:
                    return self.parse_top()
                finally:
                    self.ns_stack.pop()
            self.pos = save  # file query: let parse_fq_primary scope it
        if self.at_word("datasets"):
            self.next()
            q = DatasetQuery(self.parse_dataset_query_list())
        elif self.at_word("queries"):
            q = self.parse_query_query()
        else:
            q = FileQuery(self.parse_file_query())
        if self.pos != len(self.toks):
            t = self.peek()
            raise MQLSyntaxError(f"trailing input at {t.pos}: {t.value!r}")
        return q

    def parse_namespace_header(self) -> str:
        """Consume `with namespace = <name>` and return the namespace."""
        self.expect_word("with")
        self.expect_word("namespace")
        t = self.next()
        if not (t.kind == "op" and t.value in ("=", "==")):
            raise MQLSyntaxError("expected '=' after 'with namespace'")
        ns_tok = self.next()
        if ns_tok.kind not in ("string", "word"):
            raise MQLSyntaxError("expected namespace name")
        return ns_tok.value

    # --------------------------------------------------------- file queries
    def parse_file_query(self):
        node = self.parse_fq_postfix()
        while self.at_op("-"):
            self.next()
            rhs = self.parse_fq_postfix()
            node = MinusOp(node, rhs)
        return node

    def parse_fq_postfix(self):
        node = self.parse_fq_primary()
        while True:
            if self.at_word("where"):
                self.next()
                node = WhereOp(node, self.parse_meta_or())
            elif self.at_word("limit"):
                self.next()
                t = self.next()
                if t.kind != "int":
                    raise MQLSyntaxError(f"limit expects int, got {t.value!r}")
                node = LimitOp(node, int(t.value))
            elif self.at_word("skip"):
                self.next()
                t = self.next()
                if t.kind != "int":
                    raise MQLSyntaxError(f"skip expects int, got {t.value!r}")
                node = SkipOp(node, int(t.value))
            elif self.at_word("ordered"):
                self.next()
                node = OrderedOp(node)
            else:
                break
        return node

    def parse_fq_primary(self):
        if self.at_word("with"):
            # with namespace = "ns" <query term>
            self.ns_stack.append(self.parse_namespace_header())
            try:
                return self.parse_fq_postfix()
            finally:
                self.ns_stack.pop()
        if self.at_punct("("):
            self.next()
            node = self.parse_file_query()
            self.expect_punct(")")
            return node
        if self.at_word("union"):
            self.next()
            self.expect_punct("(")
            children = self.parse_file_query_list()
            self.expect_punct(")")
            return UnionOp(children)
        if self.at_punct("["):
            self.next()
            children = self.parse_file_query_list()
            self.expect_punct("]")
            return UnionOp(children)
        if self.at_word("join"):
            self.next()
            self.expect_punct("(")
            children = self.parse_file_query_list()
            self.expect_punct(")")
            return JoinOp(children)
        if self.at_punct("{"):
            self.next()
            children = self.parse_file_query_list()
            self.expect_punct("}")
            return JoinOp(children)
        if self.at_word("parents"):
            self.next()
            self.expect_punct("(")
            node = self.parse_file_query()
            self.expect_punct(")")
            return ParentsOf(node)
        if self.at_word("children"):
            self.next()
            self.expect_punct("(")
            node = self.parse_file_query()
            self.expect_punct(")")
            return ChildrenOf(node)
        if self.at_word("filter"):
            return self.parse_filter()
        if self.at_word("fids", "fid"):
            self.next()
            items = [self.parse_fid()]
            while self.at_punct(","):
                self.next()
                items.append(self.parse_fid())
            return FileList("fid", items)
        if self.at_word("files", "file"):
            self.next()
            if self.at_word("selected"):
                self.next()
                if self.at_word("by"):
                    self.next()
                ns, name = self.parse_qualified_name()
                return NamedQueryRef(ns, name)
            if self.at_word("from"):
                self.next()
                if self.at_word("datasets"):
                    self.next()
                return BasicFileQuery(self.parse_dataset_query_list())
            # `files ns:a, ns:b` point lookup vs bare `files`
            t = self.peek()
            # string tokens too: quoted namespaces/names ("my ns":f1)
            # are legal qualified names (review r6)
            if t is not None and t.kind in ("word", "pattern", "string") \
                    and not self.at_word(
                    "where", "limit", "skip", "ordered"):
                items = [self.parse_qualified_name()]
                while self.at_punct(","):
                    self.next()
                    items.append(self.parse_qualified_name())
                return FileList("did", items)
            return BasicFileQuery([])
        t = self.peek()
        raise MQLSyntaxError(
            f"unexpected token {t.value!r} at {t.pos}" if t else "empty query")

    def parse_file_query_list(self) -> list:
        out = [self.parse_file_query()]
        while self.at_punct(","):
            self.next()
            out.append(self.parse_file_query())
        return out

    def parse_fid(self) -> str:
        t = self.next()
        if t.kind not in ("word", "int", "string", "pattern"):
            raise MQLSyntaxError(f"bad fid {t.value!r}")
        return t.value

    def parse_qualified_name(self):
        t = self.next()
        if t.kind not in ("word", "string"):
            raise MQLSyntaxError(f"bad name {t.value!r}")
        if self.at_punct(":"):
            self.next()
            t2 = self.next()
            return (t.value, t2.value)
        return (self.default_namespace, t.value)

    # -------------------------------------------------------------- filters
    def parse_filter(self):
        self.expect_word("filter")
        name_tok = self.next()
        if name_tok.kind != "word":
            raise MQLSyntaxError(f"bad filter name {name_tok.value!r}")
        self.expect_punct("(")
        params, kwparams = [], {}
        while not self.at_punct(")"):
            # param_def: FNAME "=" constant; else positional constant
            t = self.peek()
            t1 = self.peek(1)
            if (t is not None and t.kind == "word" and t1 is not None
                    and t1.kind == "op" and t1.value == "="):
                self.next()
                self.next()
                kwparams[t.value] = self.parse_constant()
            else:
                params.append(self.parse_constant())
            if self.at_punct(","):
                self.next()
        self.expect_punct(")")
        self.expect_punct("(")
        children = self.parse_file_query_list()
        self.expect_punct(")")
        return FilterOp(name_tok.value, params, kwparams, children)

    # ------------------------------------------------------ dataset queries
    def parse_dataset_query_list(self) -> list:
        out = [self.parse_dataset_query()]
        while self.at_punct(","):
            # disambiguate: a comma may belong to an enclosing
            # file_query_list (e.g. union(files from a:b, files from c:d))
            nxt = self.peek(1)
            if nxt is not None and nxt.kind == "word" and nxt.value in _FQ_START_WORDS:
                break
            if nxt is not None and nxt.kind == "punct" and nxt.value in "([{":
                break
            self.next()
            out.append(self.parse_dataset_query())
        return out

    def parse_dataset_query(self) -> DatasetSelector:
        sel = self.parse_dataset_spec()
        if self.at_word("with"):
            # lookahead: 'with subsets'/'with ancestors' vs
            # 'with namespace' (not valid here)
            nxt = self.peek(1)
            if nxt is not None and nxt.value in ("subsets", "ancestors"):
                self.next()
                which = self.next().value
                if which == "subsets":
                    sel.with_subsets = True
                else:
                    sel.with_ancestors = True
                if self.at_word("recursively"):
                    self.next()
                    sel.recursively = True
        if self.at_word("having"):
            self.next()
            sel.having = self.parse_meta_or()
        return sel

    def parse_dataset_spec(self) -> DatasetSelector:
        if self.at_word("matching"):
            self.next()
            if self.at_word("regexp"):
                self.next()
                ns_tok = self.next()
                ns = ns_tok.value
                name = None
                if self.at_punct(":"):
                    self.next()
                    t = self.next()
                    name = t.value
                else:
                    ns, name = self.default_namespace, ns
                return DatasetSelector("regexp", ns, name)
            t = self.next()
            if t.kind not in ("word", "pattern", "string"):
                raise MQLSyntaxError(f"bad pattern {t.value!r}")
            ns = t.value
            if self.at_punct(":"):
                self.next()
                p = self.next()
                return DatasetSelector("pattern", ns, p.value)
            return DatasetSelector("pattern", self.default_namespace, ns)
        t = self.next()
        if t.kind not in ("word", "pattern"):
            raise MQLSyntaxError(f"bad dataset spec {t.value!r}")
        if self.at_punct(":"):
            self.next()
            t2 = self.next()
            kind = "pattern" if (t2.kind == "pattern"
                                 or any(ch in t2.value for ch in "*?%")) else "did"
            return DatasetSelector(kind, t.value, t2.value)
        kind = "pattern" if t.kind == "pattern" else "did"
        return DatasetSelector(kind, self.default_namespace, t.value)

    # -------------------------------------------------------- query queries
    def parse_query_query(self) -> QueryQuery:
        self.expect_word("queries")
        pattern = None
        where = None
        if self.at_word("matching"):
            self.next()
            if self.at_word("regexp"):
                self.next()
                ns_tok = self.next()
                self.expect_punct(":")
                name_tok = self.next()
                pattern = DatasetSelector("regexp", ns_tok.value, name_tok.value)
            else:
                ns_tok = self.next()
                if self.at_punct(":"):
                    self.next()
                    p = self.next()
                    pattern = DatasetSelector("pattern", ns_tok.value, p.value)
                else:
                    pattern = DatasetSelector("pattern", self.default_namespace,
                                              ns_tok.value)
        if self.at_word("where"):
            self.next()
            where = self.parse_meta_or()
        return QueryQuery(pattern, where)

    # ------------------------------------------------------ meta expressions
    def parse_meta_or(self):
        terms = [self.parse_meta_and()]
        while self.at_word("or"):
            self.next()
            terms.append(self.parse_meta_and())
        return terms[0] if len(terms) == 1 else MetaOr(terms)

    def parse_meta_and(self):
        terms = [self.parse_meta_term()]
        while self.at_word("and"):
            self.next()
            terms.append(self.parse_meta_term())
        return terms[0] if len(terms) == 1 else MetaAnd(terms)

    def parse_meta_term(self):
        if self.at_punct("!"):
            self.next()
            return MetaNot(self.parse_meta_term())
        if self.at_punct("("):
            self.next()
            e = self.parse_meta_or()
            self.expect_punct(")")
            return e
        if self.at_word("exists"):
            nxt = self.peek(1)
            if nxt is not None and nxt.kind == "string":
                self.next()
                return JsonPathExists(self.next().value)
        return self.parse_meta_atom()

    def parse_meta_atom(self):
        """cmp / range / set / present / const-in, sharing a parsed lhs."""
        # scalar forms starting with len(
        if self.at_word("len") and self.peek(1) is not None \
                and self.peek(1).kind == "punct" and self.peek(1).value == "(":
            self.next()
            self.next()
            key_tok = self.next()
            self.expect_punct(")")
            scalar = ArrayLen(key_tok.value)
            return self.parse_meta_relop(scalar)

        t = self.next()
        # A constant lhs (number/bool/quoted string/datetime/date) can only
        # begin `const [not] in META_NAME`
        if t.kind in ("int", "float", "string") or (
                t.kind == "word" and t.value in ("true", "false")) or (
                t.kind == "word" and t.value in ("datetime", "date")
                and self.at_punct("(")):
            const = self._constant_from_token(t)
            negated = False
            if self.at_word("not"):
                self.next()
                negated = True
            self.expect_word("in")
            key_tok = self.next()
            return ConstIn(const, key_tok.value, negated)

        if t.kind != "word":
            raise MQLSyntaxError(f"unexpected {t.value!r} at {t.pos}")

        name = t.value
        # subscript forms: name[any] name[all] name[int] name["key"]
        scalar = None
        if self.at_punct("["):
            self.next()
            idx = self.next()
            self.expect_punct("]")
            if idx.kind == "word" and idx.value == "any":
                scalar = ArrayAny(name)
            elif idx.kind == "word" and idx.value == "all":
                scalar = ArrayAll(name)
            elif idx.kind == "int":
                scalar = Subscript(name, int(idx.value))
            elif idx.kind == "string":
                scalar = Subscript(name, idx.value)
            else:
                raise MQLSyntaxError(f"bad subscript {idx.value!r}")
            return self.parse_meta_relop(scalar)

        # present / not present
        if self.at_word("present"):
            self.next()
            return Present(name, False)
        if self.at_word("not") and self.peek(1) is not None \
                and self.peek(1).value == "present":
            self.next()
            self.next()
            return Present(name, True)

        scalar = MetaAttr(name) if "." in name else ObjectAttr(name)
        return self.parse_meta_relop(scalar)

    def parse_meta_relop(self, scalar):
        t = self.peek()
        if t is not None and t.kind == "op" and t.value in _CMPOPS:
            self.next()
            const = self.parse_constant()
            op = "=" if t.value == "==" else t.value
            return Cmp(scalar, op, const)
        # `like` is reserved-but-unimplemented in the reference grammar
        # (grammar/common.py CMPOP comment); we expose it as a working
        # SQL-LIKE comparison, same spirit as the `exists` escape hatch
        if self.at_word("like"):
            self.next()
            const = self.parse_constant()
            if const.kind != "str":
                raise MQLSyntaxError("like requires a string pattern")
            return Cmp(scalar, "like", const)
        negated = False
        if self.at_word("not"):
            nxt = self.peek(1)
            if nxt is not None and nxt.value == "in":
                self.next()
                negated = True
        if self.at_word("in"):
            self.next()
            if self.at_punct("("):
                self.next()
                values = [self.parse_constant()]
                while self.at_punct(","):
                    self.next()
                    values.append(self.parse_constant())
                self.expect_punct(")")
                return InSet(scalar, values, negated)
            lo = self.parse_constant()
            if self.at_punct(":"):
                self.next()
                hi = self.parse_constant()
                return InRange(scalar, lo, hi, negated)
            # `const in meta.key`: lhs was actually a constant (safe string)
            if isinstance(scalar, MetaAttr):
                lhs_const = Const("str", scalar.key)
            elif isinstance(scalar, ObjectAttr):
                lhs_const = Const("str", scalar.name)
            else:
                raise MQLSyntaxError("bad 'in' expression")
            if lo.kind != "str":
                raise MQLSyntaxError("expected metadata name after 'in'")
            return ConstIn(lhs_const, str(lo.value), negated)
        raise MQLSyntaxError(
            f"expected comparison or 'in' after {scalar!r}")

    # ------------------------------------------------------------ constants
    def parse_constant(self) -> Const:
        return self._constant_from_token(self.next())

    def _constant_from_token(self, t: Token) -> Const:
        if t.kind == "int":
            return Const("int", int(t.value))
        if t.kind == "float":
            return Const("float", float(t.value))
        if t.kind == "string":
            return Const("str", t.value)
        if t.kind == "word":
            if t.value == "true":
                return Const("bool", True)
            if t.value == "false":
                return Const("bool", False)
            if t.value == "datetime" and self.at_punct("("):
                self.next()
                arg = self.next()
                self.expect_punct(")")
                return Const("datetime", _parse_datetime(arg.value))
            if t.value == "date" and self.at_punct("("):
                self.next()
                arg = self.next()
                tz = None
                if self.at_punct(","):
                    self.next()
                    tz = self.next().value
                self.expect_punct(")")
                lo, hi = _parse_date(arg.value, tz)
                return Const("date", lo, hi)
            # unquoted safe string
            return Const("str", t.value)
        if t.kind == "pattern":
            return Const("str", t.value)
        raise MQLSyntaxError(f"bad constant {t.value!r} at {t.pos}")


def parse(text: str, default_namespace: Optional[str] = None):
    """Parse MQL text → TopQuery AST."""
    return Parser(text, default_namespace).parse_top()
