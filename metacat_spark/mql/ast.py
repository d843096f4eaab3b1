"""AST node definitions for MQL (Metadata Query Language).

The node inventory mirrors the reference grammar
(/root/reference/metacat/mql/grammar/common.py, file_query.py,
dataset_query.py, query_query.py) but is our own representation,
designed to translate directly into PySpark DataFrame plans.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union


# ---------------------------------------------------------------- constants

@dataclass(frozen=True)
class Const:
    """A typed MQL constant.

    kind: one of 'int', 'float', 'str', 'bool', 'datetime', 'date'.
    For 'datetime', value is an epoch float (reference: mql10.py:848-869).
    For 'date', value is the epoch float of midnight in the given tz and
    value_end is value + 86400 (the 24-hour window, mql10.py:871-893).
    """

    kind: str
    value: object
    value_end: Optional[float] = None  # only for kind == 'date'

    @property
    def is_date(self) -> bool:
        return self.kind == "date"


# ------------------------------------------------------------------ scalars

@dataclass(frozen=True)
class MetaAttr:
    """Dotted metadata key, e.g. core.run (grammar: META_NAME)."""

    key: str


@dataclass(frozen=True)
class ObjectAttr:
    """Plain file/dataset attribute column, e.g. namespace, size."""

    name: str


@dataclass(frozen=True)
class ArrayAny:
    key: str


@dataclass(frozen=True)
class ArrayAll:
    key: str


@dataclass(frozen=True)
class Subscript:
    """k[3] or k["member"]."""

    key: str
    index: Union[int, str]


@dataclass(frozen=True)
class ArrayLen:
    key: str


Scalar = Union[MetaAttr, ObjectAttr, ArrayAny, ArrayAll, Subscript, ArrayLen]


# --------------------------------------------------------------- meta exprs

@dataclass
class MetaOr:
    children: list

@dataclass
class MetaAnd:
    children: list

@dataclass
class MetaNot:
    child: object

@dataclass
class Cmp:
    """scalar CMPOP const; ops: < <= > >= = == != ~ ~* !~ !~*."""

    scalar: Scalar
    op: str
    const: Const

@dataclass
class InRange:
    scalar: Scalar
    lo: Const
    hi: Const
    negated: bool = False

@dataclass
class InSet:
    scalar: Scalar
    values: list  # list[Const]
    negated: bool = False

@dataclass
class Present:
    key: str
    negated: bool = False

@dataclass
class ConstIn:
    """const in meta.key / const not in meta.key (element-of-array;
    for string consts also scalar substring match — mql10.py:1094-1127)."""

    const: Const
    key: str
    negated: bool = False

@dataclass
class JsonPathExists:
    """exists "jsonpath" — vestigial in the reference (mql10.py:1049);
    we expose it as a get_json_object IS NOT NULL escape hatch."""

    path: str


MetaExp = Union[MetaOr, MetaAnd, MetaNot, Cmp, InRange, InSet, Present,
                ConstIn, JsonPathExists]


# ----------------------------------------------------------- dataset select

@dataclass
class DatasetSelector:
    """One element of a dataset_query_list.

    kind: 'did' (exact), 'pattern' (SQL-LIKE, translated from *?%_ per
    mql10.py:1279-1314), 'regexp' (POSIX regex on name).
    """

    kind: str
    namespace: Optional[str]
    name: str
    with_subsets: bool = False
    with_ancestors: bool = False
    recursively: bool = False
    having: Optional[MetaExp] = None


# -------------------------------------------------------------- file query

@dataclass
class BasicFileQuery:
    datasets: list = field(default_factory=list)  # list[DatasetSelector]; empty = all files
    where: Optional[MetaExp] = None

@dataclass
class FileList:
    """files ns:a, ns:b (spec kind 'did') or fids 1,2,3 (kind 'fid')."""

    kind: str
    items: list  # dids: list[(ns, name)]; fids: list[str]

@dataclass
class NamedQueryRef:
    namespace: Optional[str]
    name: str

@dataclass
class UnionOp:
    children: list

@dataclass
class JoinOp:
    children: list

@dataclass
class MinusOp:
    left: object
    right: object

@dataclass
class ParentsOf:
    child: object

@dataclass
class ChildrenOf:
    child: object

@dataclass
class WhereOp:
    child: object
    exp: MetaExp

@dataclass
class LimitOp:
    child: object
    n: int

@dataclass
class SkipOp:
    child: object
    n: int

@dataclass
class OrderedOp:
    child: object

@dataclass
class FilterOp:
    """filter NAME(params, kw=v)(q1, q2, ...) — MQL's UDF surface."""

    name: str
    params: list = field(default_factory=list)       # list[Const] positional
    kwparams: dict = field(default_factory=dict)     # name -> Const
    children: list = field(default_factory=list)


FileQueryNode = Union[BasicFileQuery, FileList, NamedQueryRef, UnionOp,
                      JoinOp, MinusOp, ParentsOf, ChildrenOf, WhereOp,
                      LimitOp, SkipOp, OrderedOp, FilterOp]


# --------------------------------------------------------------- top levels

@dataclass
class FileQuery:
    tree: FileQueryNode

@dataclass
class DatasetQuery:
    selectors: list  # list[DatasetSelector]

@dataclass
class QueryQuery:
    """queries [matching <pattern>] [where meta]."""

    pattern: Optional[DatasetSelector] = None  # reuse kinds pattern/regexp
    where: Optional[MetaExp] = None


TopQuery = Union[FileQuery, DatasetQuery, QueryQuery]
