"""Fixture adapter: TPC-H-ish driver testdata → metacat-shaped tables.

Single source of truth for the deterministic mapping described in
FIXTURES.md. Every table is defined as a SQL template rendered for TWO
dialects — Spark SQL (to build the engine's DataFrames) and DuckDB (to
build the correctness-oracle CTEs) — so the two sides can never drift.

Mapping summary (all pure functions of TPC-H columns, no randomness):

- ``files``            ← lineitem (one file per line item)
- ``files_datasets``   ← 3 memberships per file:
      dune:{priority}_{okey%4} (via orders), mc:flag_{returnflag}, test:all
- ``parent_child``     ← line item 1 of each order is the parent of
                          line items 2..N of the same order
- ``datasets``         ← static 24-row literal (matches membership names)
- ``datasets_parent_child`` ← static DAG + one deliberate cycle
                          (cycle-guard parity: dbobjects2.py:1068-1078)
- ``namespaces``, ``queries_tbl`` ← static literals
"""

from __future__ import annotations

SPARK, DUCK = "spark", "duck"

_USERS = "('alice','bob','carol','dave','eve','frank','grace','henry')"


def _epoch(d: str, col: str) -> str:
    return (f"cast(unix_timestamp({col}) as double)" if d == SPARK
            else f"cast(epoch({col}) as double)")


def _arr(d: str, *items: str) -> str:
    inner = ", ".join(items)
    return f"array({inner})" if d == SPARK else f"list_value({inner})"


def _slice(d: str, arr: str, start: str, length: str) -> str:
    fn = "slice" if d == SPARK else "list_slice"
    if d == SPARK:
        return f"slice({arr}, {start}, {length})"
    # DuckDB list_slice(list, begin, end) is begin/end, not begin/length
    return f"list_slice({arr}, {start}, {start} + {length} - 1)"


def _filt(d: str, arr: str, lam: str) -> str:
    fn = "filter" if d == SPARK else "list_filter"
    return f"{fn}({arr}, {lam})"


def _map2(d: str, k1: str, v1: str, k2: str, v2: str) -> str:
    if d == SPARK:
        return f"map({k1}, {v1}, {k2}, {v2})"
    return f"map([{k1}, {k2}], [{v1}, {v2}])"


# The synthetic lineitem has no single unique key (duplicate
# (orderkey, linenumber) pairs exist; sf0.001 even has one fully
# duplicated row) — the file id therefore encodes the full natural key.
# Sortable by construction (fixed-width zero-padded).
FILE_ID = ("printf('f%09d%d%07d%05d', l_orderkey, l_linenumber, "
           "l_partkey, l_suppkey)")


def files_sql(d: str, lineitem: str = "lineitem") -> str:
    """The files table as a projection of lineitem (lazy; Catalyst folds
    these expressions into the parquet scan)."""
    users = _USERS[1:-1].split(",")
    creator = ("case cast(l_suppkey % 8 as int) "
               + " ".join(f"when {i} then {u}" for i, u in enumerate(users[:-1]))
               + f" else {users[-1]} end")
    modules_cand = _arr(
        d,
        "case when l_partkey % 2 = 1 then 'a1' end",
        "case when l_partkey % 3 = 0 then 'a2' end",
        "case when l_partkey % 5 = 0 then 'a3' end",
        "case when l_partkey % 7 = 0 then 'ssp07' end",
        "case when l_partkey % 11 = 0 then 'rce10' end",
        "case when l_partkey % 13 = 0 then 'rce14' end",
    )
    modules = _filt(d, modules_cand, "x -> x is not null")
    fib = _arr(d, *"1 1 2 3 5 8 13".split())
    seq = _slice(d, fib, "1", "cast(1 + l_orderkey % 7 as int)")
    return f"""
select
  {FILE_ID} as id,
  case when l_orderkey % 10 < 5 then 'dune'
       when l_orderkey % 10 < 8 then 'mc' else 'test' end as namespace,
  printf('run_%09d%d%07d%05d.%s', l_orderkey, l_linenumber, l_partkey,
         l_suppkey,
         case cast(l_partkey % 3 as int) when 0 then 'data'
              when 1 then 'root' else 'hdf5' end) as name,
  cast(round(l_extendedprice * 1000) as bigint) as size,
  {creator} as creator,
  l_shipdate as created_timestamp,
  (l_orderkey % 20 = 0) as retired,
  cast(l_orderkey % 500 as int) as m_core_run,
  l_discount * 10 as m_core_x,
  case l_returnflag when 'R' then 'data' when 'A' then 'mc'
       else 'calibration' end as m_core_data_type,
  printf('%d.%d', 1 + l_partkey % 3, l_suppkey % 4) as m_core_version,
  {_epoch(d, 'l_shipdate')} as m_core_timestamp,
  (l_quantity > 25) as m_core_good,
  {_arr(d, 'cast(l_orderkey % 500 as int)', 'cast(l_partkey % 500 as int)')} as m_core_runs,
  case when l_partkey % 17 = 0 then null else {modules} end as m_detector_modules,
  {_map2(d, "'muon'", 'cast(l_orderkey % 2 as int)',
         "'electron'", 'cast(l_suppkey % 2 as int)')} as m_data_trigger_bits,
  {seq} as m_data_sequence,
  case when l_partkey % 10 < 7 then
       (case when l_suppkey % 2 = 0 then 'on' else 'off' end)
       else null end as m_beam_status,
  case when l_suppkey % 10 < 8 then
       (case cast(l_orderkey % 4 as int) when 0 then 'FELIX readout ok'
             when 1 then 'test run' when 2 then 'Felix calib'
             else 'nominal run' end)
       else null end as m_prod_comment
from {lineitem}
"""


def files_datasets_sql(d: str, lineitem: str = "lineitem",
                       orders: str = "orders") -> str:
    prio = ("case substr(o_orderpriority, 1, 1) "
            "when '1' then 'urgent' when '2' then 'high' "
            "when '3' then 'medium' when '4' then 'notspec' "
            "else 'low' end")
    return f"""
select {FILE_ID} as file_id, 'dune' as dataset_namespace,
       printf('%s_%d', {prio}, o_orderkey % 4) as dataset_name
  from {lineitem} join {orders} on l_orderkey = o_orderkey
union all
select {FILE_ID} as file_id, 'mc' as dataset_namespace,
       printf('flag_%s', lower(l_returnflag)) as dataset_name
  from {lineitem}
union all
select {FILE_ID} as file_id, 'test' as dataset_namespace,
       'all' as dataset_name
  from {lineitem}
"""


def parent_child_sql(d: str, lineitem: str = "lineitem") -> str:
    """Provenance DAG: within each order, the min-id file is the parent
    of every other file of that order (a 2-level DAG; min-id roots are
    childless parents, the rest are leaf children)."""
    return f"""
select parent_id, child_id from (
  select min({FILE_ID}) over (partition by l_orderkey) as parent_id,
         {FILE_ID} as child_id
    from {lineitem}
) t where parent_id <> child_id
"""


# --------------------------------------------------------- static literals

_PRIO_WORDS = ["urgent", "high", "medium", "notspec", "low"]

def _dataset_rows():
    rows = []
    for w in _PRIO_WORDS:
        for b in range(4):
            name = f"{w}_{b}"
            rows.append(("dune", name))
    for f in ("r", "a", "n"):
        rows.append(("mc", f"flag_{f}"))
    rows.append(("test", "all"))
    out = []
    for ns, name in rows:
        frozen = name.endswith("_0")
        monotonic = name.endswith("_1")
        dtype = "mc" if (ns == "mc" or name.startswith("medium")) else "data"
        det = "near" if (name[-1] in "01" or name in ("flag_r", "all")) else "far"
        out.append((ns, name, frozen, monotonic, "admin",
                    f"dataset {ns}:{name}", dtype, det, 3.14))
    return out


DATASET_ROWS = _dataset_rows()
DATASET_COLUMNS = ["namespace", "name", "frozen", "monotonic", "creator",
                   "description", "m_data_type", "m_detector_id", "m_math_pi"]

# dataset DAG + one deliberate cycle (low_0 <-> low_1)
DS_EDGE_ROWS = [
    ("test", "all", "mc", "flag_r"),
    ("test", "all", "mc", "flag_a"),
    ("test", "all", "mc", "flag_n"),
    ("mc", "flag_r", "dune", "urgent_0"),
    ("mc", "flag_r", "dune", "urgent_1"),
    ("mc", "flag_a", "dune", "high_0"),
    ("mc", "flag_a", "dune", "high_1"),
    ("mc", "flag_n", "dune", "low_0"),
    ("dune", "low_0", "dune", "low_1"),
    ("dune", "low_1", "dune", "low_0"),
]
DS_EDGE_COLUMNS = ["parent_namespace", "parent_name",
                   "child_namespace", "child_name"]

NAMESPACE_ROWS = [("dune", "admin"), ("mc", "prod"), ("test", "qa")]
NAMESPACE_COLUMNS = ["name", "owner_user"]

QUERY_ROWS = [
    ("dune", "favorite_x", "files from dune:urgent_0 where core.x > 0.5",
     5, "mql", "admin", "favorite x query"),
    ("mc", "prod_2023", "files from mc:flag_r where core.run in 100:200",
     3, "mql", "bob", "production 2023"),
    ("test", "nested",
     "files selected by dune:favorite_x where core.good = true",
     1, "mql", "carol", "nested named query"),
    ("dune", "recent",
     "files from dune:urgent_1 where core.timestamp > datetime(1996-01-01)",
     2, "csv", "dave", "recent files"),
]
QUERY_COLUMNS = ["namespace", "name", "source", "m_file_quality",
                 "m_file_type", "creator", "description"]


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_sql(rows, columns) -> str:
    """Portable VALUES table: select ... from (values ...) t(cols)."""
    vals = ",\n  ".join("(" + ", ".join(_sql_lit(v) for v in r) + ")"
                        for r in rows)
    cols = ", ".join(columns)
    return f"select * from (values\n  {vals}\n) as t({cols})"


# ------------------------------------------------------------ DuckDB side

def oracle_prelude(sf_tables_are_views: bool = True) -> str:
    """WITH-clause CTE definitions for the DuckDB oracle. The driver
    pre-registers the raw parquet tables as views named region/nation/
    .../lineitem/events/documents/embeddings; these CTEs lift them to
    the metacat shape. Unused CTEs cost nothing."""
    return (
        "WITH files AS (" + files_sql(DUCK) + "),\n"
        "files_datasets AS (" + files_datasets_sql(DUCK) + "),\n"
        "parent_child AS (" + parent_child_sql(DUCK) + "),\n"
        "datasets AS (" + values_sql(DATASET_ROWS, DATASET_COLUMNS) + "),\n"
        "datasets_parent_child AS ("
        + values_sql(DS_EDGE_ROWS, DS_EDGE_COLUMNS) + "),\n"
        "namespaces AS (" + values_sql(NAMESPACE_ROWS, NAMESPACE_COLUMNS) + "),\n"
        "queries_tbl AS (" + values_sql(QUERY_ROWS, QUERY_COLUMNS) + ")\n"
    )


def oracle_query(body: str) -> str:
    """Wrap a SELECT body with the metacat-shape CTE prelude."""
    return oracle_prelude() + body
