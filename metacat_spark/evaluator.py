"""Row-level Python twin of the predicate compiler.

Role-equivalent to the reference's MetaEvaluator
(metacat/mql/meta_evaluator.py:17-238), which evaluates the same
predicate language the SQL compiler does — the two implementations are
a built-in differential-testing oracle (SURVEY.md §5). Ours evaluates
with Spark's THREE-VALUED logic (True/False/None) so it matches the
DataFrame compiler bit-for-bit, including `missing key ⇒ NULL ⇒ row
dropped, even under negation`.
"""

from __future__ import annotations

import re
from typing import Optional

from .mql.ast import (ArrayAll, ArrayAny, ArrayLen, Cmp, Const, ConstIn,
                      JsonPathExists,
                      InRange, InSet, MetaAnd, MetaAttr, MetaNot, MetaOr,
                      ObjectAttr, Present, Subscript)

Tri = Optional[bool]  # None = SQL NULL


def _and(a: Tri, b: Tri) -> Tri:
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _or(a: Tri, b: Tri) -> Tri:
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _not(a: Tri) -> Tri:
    return None if a is None else (not a)


def _spark_str(v) -> str:
    """Render a value the way Spark's CAST(x AS STRING) does, so the
    row evaluator's like/regex paths agree with the compiled
    Column.like/rlike paths on non-string metadata (Python str() says
    'True'; Spark says 'true')."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _cmp_value(v, op: str, const: Const) -> Tri:
    if v is None:
        return None
    if const.kind == "date":
        lo, hi = const.value, const.value_end
        try:
            if op == "=":
                return lo <= v < hi
            if op == "!=":
                return v < lo or v >= hi
            if op == ">":
                return v >= hi
            if op == ">=":
                return v >= lo
            if op == "<":
                return v < lo
            if op == "<=":
                return v < hi
        except TypeError:
            return None
    c = const.value
    if op in ("~", "~*", "!~", "!~*"):
        flags = re.IGNORECASE if op.endswith("*") else 0
        m = re.search(str(c), _spark_str(v), flags) is not None
        return (not m) if op.startswith("!") else m
    if op == "like":
        # SQL LIKE: full match, % = any run, _ = any single char
        pat = "".join(".*" if ch == "%" else "." if ch == "_"
                      else re.escape(ch) for ch in str(c))
        return re.fullmatch(pat, _spark_str(v)) is not None
    try:
        if op in ("=", "=="):
            return v == c
        if op == "!=":
            return v != c
        if op == "<":
            return v < c
        if op == "<=":
            return v <= c
        if op == ">":
            return v > c
        if op == ">=":
            return v >= c
    except TypeError:
        return None
    return None


class RowEvaluator:
    """Evaluates a meta expression against one row's metadata dict and
    attribute dict; returns True iff the row passes (NULL ⇒ False at
    the filter boundary, like Spark)."""

    def __init__(self, metadata: dict, attributes: Optional[dict] = None):
        self.meta = metadata or {}
        self.attrs = attributes or {}

    def passes(self, exp) -> bool:
        return self.eval(exp) is True

    # ------------------------------------------------------------- eval
    def eval(self, exp) -> Tri:
        if isinstance(exp, MetaOr):
            out: Tri = False
            for ch in exp.children:
                out = _or(out, self.eval(ch))
            return out
        if isinstance(exp, MetaAnd):
            out = True
            for ch in exp.children:
                out = _and(out, self.eval(ch))
            return out
        if isinstance(exp, MetaNot):
            return _not(self.eval(exp.child))
        if isinstance(exp, Present):
            present = self.meta.get(exp.key) is not None
            return (not present) if exp.negated else present
        if isinstance(exp, Cmp):
            return self._eval_scalar(exp.scalar,
                                     lambda v: _cmp_value(v, exp.op,
                                                          exp.const))
        if isinstance(exp, InRange):
            return self._apply_neg(
                self._eval_scalar(exp.scalar,
                                  lambda v: self._in_range(v, exp)),
                exp.negated)
        if isinstance(exp, InSet):
            vals = [c.value for c in exp.values]
            return self._apply_neg(
                self._eval_scalar(exp.scalar,
                                  lambda v: None if v is None
                                  else v in vals),
                exp.negated)
        if isinstance(exp, ConstIn):
            return self._apply_neg(self._const_in(exp), exp.negated)
        if isinstance(exp, JsonPathExists):
            return self._json_path(exp.path) is not None
        raise NotImplementedError(f"cannot evaluate {exp!r}")

    @staticmethod
    def _apply_neg(v: Tri, negated: bool) -> Tri:
        return _not(v) if negated else v

    def _in_range(self, v, exp: InRange) -> Tri:
        if v is None:
            return None
        lo = exp.lo.value
        hi = exp.hi.value_end if exp.hi.kind == "date" else exp.hi.value
        try:
            ge = v >= lo
            le = (v < hi) if exp.hi.kind == "date" else (v <= hi)
            return ge and le
        except TypeError:
            return None

    def _json_path(self, path: str):
        """Minimal jsonpath over the flat metadata dict, matching
        get_json_object's step semantics for the paths the parser
        accepts: $['key'] / $.seg / [idx] chains. A dotted metadata
        key like core.run is ONE flat key — reachable via the bracket
        form only, exactly as in the compiled plan (review r6: the
        evaluator previously raised NotImplementedError on
        exists())."""
        if not path.startswith("$"):
            return None
        cur: object = self.meta
        steps = re.findall(
            r"\['([^']*)'\]|\[\"([^\"]*)\"\]|\[(-?\d+)\]|\.([^.\[]+)",
            path[1:])
        if not steps and path != "$":
            return None
        for sq, dq, idx, seg in steps:
            key = sq or dq or seg
            if idx != "":
                if not isinstance(cur, list):
                    return None
                i = int(idx)
                if not 0 <= i < len(cur):
                    return None
                cur = cur[i]
            else:
                if not isinstance(cur, dict):
                    return None
                cur = cur.get(key)
            if cur is None:
                return None
        return cur

    def _const_in(self, exp: ConstIn) -> Tri:
        val = self.meta.get(exp.key)
        if val is None:
            return None
        c = exp.const.value
        if isinstance(val, dict):
            # documented divergence: the compiled JSON fallback yields
            # NULL for object-valued keys (no map coercion); shredded
            # map keys agree with this values-membership
            return c in list(val.values())
        if isinstance(val, list):
            return c in val
        if isinstance(val, str) and exp.const.kind == "str":
            return re.search(str(c), val) is not None
        return val == c

    # ----------------------------------------------------------- scalars
    def _eval_scalar(self, scalar, fn) -> Tri:
        if isinstance(scalar, MetaAttr):
            return fn(self.meta.get(scalar.key))
        if isinstance(scalar, ObjectAttr):
            return fn(self.attrs.get(scalar.name))
        if isinstance(scalar, ArrayLen):
            v = self.meta.get(scalar.key)
            # len() applies to arrays/maps only — on a scalar the
            # compiled plan's from_json(... as array) yields NULL, so
            # mirror that instead of crashing on len(int) (review r6)
            return fn(len(v) if isinstance(v, (list, dict)) else None)
        if isinstance(scalar, Subscript):
            v = self.meta.get(scalar.key)
            if v is None:
                return fn(None)
            try:
                if isinstance(scalar.index, int):
                    if isinstance(v, list):
                        # element_at semantics: out of bounds → NULL.
                        # Strings are NOT indexable (the compiled JSON
                        # path $[i] over a string yields NULL)
                        n = len(v)
                        i = scalar.index
                        if -n <= i < n:
                            return fn(v[i])
                        return fn(None)
                    return fn(None)
                return fn(v.get(scalar.index)
                          if isinstance(v, dict) else None)
            except (TypeError, KeyError):
                return fn(None)
        if isinstance(scalar, (ArrayAny, ArrayAll)):
            v = self.meta.get(scalar.key)
            # non-collections (incl. strings) are NULL in the compiled
            # plan's array coercion — never iterate characters or
            # crash on list(int) (review r6)
            if not isinstance(v, (list, dict)):
                return None
            items = list(v.values()) if isinstance(v, dict) else list(v)
            results = [fn(x) for x in items]
            if isinstance(scalar, ArrayAny):
                out: Tri = False
                for r in results:
                    out = _or(out, r)
                return out
            out = True
            for r in results:
                out = _and(out, r)
            return out
        raise NotImplementedError(f"bad scalar {scalar!r}")
