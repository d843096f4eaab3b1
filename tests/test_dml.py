"""DML / catalog-operation tests: validation engine, declare/update/
retire, membership with frozen/monotonic enforcement, save_as/add_to
sinks (SURVEY.md §2.10)."""

import pytest
from pyspark.sql import functions as F

from metacat_spark.catalog import from_tpch
from metacat_spark.dml import DML, DMLError, ValidationFailed
from metacat_spark.engine import Engine
from metacat_spark.validation import category_of, validate_metadata

from conftest import SF_DIR


@pytest.fixture(params=["memory", "durable"])
def fresh(spark, request, tmp_path):
    """Isolated catalog per test — DML mutates session state. Runs
    every scenario in BOTH persistence modes (r8): "durable" journals
    each mutation to a DurableStore commit log, so the whole DML
    surface exercises the write-behind path, and the paired
    restart-equivalence checks live in test_durable.py."""
    cat = from_tpch(spark, SF_DIR)
    if request.param == "durable":
        from metacat_spark.durable import DurableStore
        store = DurableStore(spark, str(tmp_path / "durable"))
        return Engine(cat), DML(cat, store=store)
    return Engine(cat), DML(cat)


# ------------------------------------------------------------- validation

def test_validate_types():
    defs = {"core.run": {"type": "int"},
            "core.x": {"type": "float"},
            "core.name": {"type": "text"},
            "core.flags": {"type": "boolean[]"}}
    assert validate_metadata(defs, False, {"core.run": 5}) == []
    assert validate_metadata(defs, False, {"core.run": "5"})
    assert validate_metadata(defs, False, {"core.x": 1.5}) == []
    assert validate_metadata(defs, False, {"core.x": 1})  # int is not float
    assert validate_metadata(defs, False, {"core.flags": [True, False]}) == []
    assert validate_metadata(defs, False, {"core.flags": [1, 0]})


def test_validate_enum_supersedes_range():
    """values enum supersedes pattern/min/max (reference puts them in
    its else branch — validation.py:112-142)."""
    defs = {"k.v": {"type": "int", "values": [1, 2, 99], "min": 10}}
    assert validate_metadata(defs, False, {"k.v": 1}) == []  # min ignored
    assert validate_metadata(defs, False, {"k.v": 50})       # not in enum


def test_validate_pattern_min_max_required_restricted():
    defs = {"c.v": {"type": "text", "pattern": r"^v\d+$"},
            "c.n": {"type": "int", "min": 0, "max": 10,
                    "required": True}}
    assert validate_metadata(defs, False, {"c.v": "v12", "c.n": 5}) == []
    assert validate_metadata(defs, False, {"c.v": "x12", "c.n": 5})
    assert validate_metadata(defs, False, {"c.n": 11})
    assert validate_metadata(defs, False, {"c.v": "v1"})  # c.n missing
    assert validate_metadata(defs, True, {"c.other": 1, "c.n": 0})


def test_category_of():
    assert category_of("core.run") == "core"
    assert category_of("a.b.c") == "a.b"
    with pytest.raises(ValueError):
        category_of("plain")


# ------------------------------------------------------------------- DML

def test_declare_and_query(fresh):
    eng, dml = fresh
    n = dml.declare_files([
        {"id": "znew0001", "namespace": "test", "name": "new_1.data",
         "size": 100, "metadata": {"core.run": 1, "core.x": 0.5}},
        {"id": "znew0002", "namespace": "test", "name": "new_2.data",
         "size": 200, "metadata": {"core.run": 2}},
    ], dataset=("test", "all"))
    assert n == 2
    got = [r["id"] for r in
           eng.query("files from test:all where core.run in 1:2 "
                     "and namespace = test").select("id").collect()
           if r["id"].startswith("znew")]
    assert sorted(got) == ["znew0001", "znew0002"]


def test_declare_validation_rejects(fresh):
    _, dml = fresh
    with pytest.raises(ValidationFailed):
        dml.declare_files([{"id": "x", "namespace": "t", "name": "n",
                            "metadata": {"core.run": "not-an-int"}}])
    with pytest.raises(ValidationFailed):
        dml.declare_files([{"id": "x", "namespace": "t", "name": "n",
                            "metadata": {"core.x": 99.0,
                                         "core.run": 1}}])  # max 20
    with pytest.raises(ValidationFailed):  # restricted category
        dml.declare_files([{"id": "x", "namespace": "t", "name": "n",
                            "metadata": {"data.unknown": 1}}])
    with pytest.raises(ValidationFailed):  # core.run required
        dml.declare_files([{"id": "x", "namespace": "t", "name": "n",
                            "metadata": {"core.x": 1.0}}])


def test_frozen_monotonic_enforcement(fresh):
    eng, dml = fresh
    fid = eng.query("files from test:all ordered limit 1") \
        .collect()[0]["id"]
    with pytest.raises(DMLError, match="frozen"):
        dml.add_files_to_dataset([fid], "dune", "urgent_0")
    # monotonic: adds ok, removals refused
    dml.add_files_to_dataset([fid], "dune", "urgent_1")
    with pytest.raises(DMLError, match="monotonic"):
        dml.remove_files_from_dataset([fid], "dune", "urgent_1")
    # plain dataset: both fine
    dml.add_files_to_dataset([fid], "dune", "urgent_2")
    dml.remove_files_from_dataset([fid], "dune", "urgent_2")


def test_retire_file(fresh):
    eng, dml = fresh
    fid = eng.query("files from test:all ordered limit 1").collect()[0]["id"]
    before = eng.query("files from test:all", summary="count") \
        .collect()[0]["count"]
    dml.retire_file(fid)
    eng2 = Engine(dml.cat)
    after = eng2.query("files from test:all", summary="count") \
        .collect()[0]["count"]
    assert after == before - 1


def test_update_metadata_modes(fresh):
    eng, dml = fresh
    fid = eng.query("files from test:all ordered limit 1").collect()[0]["id"]
    dml.update_file_metadata(fid, {"core.run": 77}, mode="update")
    row = dml.cat.files.where(F.col("id") == fid) \
        .select(F.get_json_object("metadata", "$['core.run']").alias("v"),
                F.get_json_object("metadata", "$['core.x']").alias("x")) \
        .collect()[0]
    assert row["v"] == "77" and row["x"] is not None  # merged, not replaced
    dml.update_file_metadata(fid, {"core.run": 78}, mode="replace")
    row = dml.cat.files.where(F.col("id") == fid) \
        .select(F.get_json_object("metadata", "$['core.x']").alias("x")) \
        .collect()[0]
    assert row["x"] is None  # replaced wholesale


def test_update_reshreds_shredded_columns(fresh):
    """Regression (ADVICE r1, high): shredded columns must track metadata
    updates or predicate queries on the updated key return stale
    results."""
    eng, dml = fresh
    fid = eng.query("files from test:all ordered limit 1") \
        .collect()[0]["id"]
    dml.update_file_metadata(fid, {"core.run": 777777}, mode="update")
    eng2 = Engine(dml.cat)
    got = [r["id"] for r in
           eng2.query("files where core.run = 777777").collect()]
    assert got == [fid]
    # replace mode drops absent shredded keys: core.x no longer matches
    dml.update_file_metadata(fid, {"core.run": 777777}, mode="replace")
    eng3 = Engine(dml.cat)
    assert eng3.query("files where core.run = 777777 and core.x >= 0") \
        .count() == 0
    assert eng3.query("files where core.run = 777777").count() == 1


def test_update_merge_preserves_value_types(fresh):
    """Regression (ADVICE r1, medium): merge must not stringify values —
    reference merge is a Python dict update (data_handler.py:1186)."""
    import json as _json
    eng, dml = fresh
    fid = eng.query("files from test:all ordered limit 1") \
        .collect()[0]["id"]
    dml.update_file_metadata(
        fid, {"core.x": 0.2, "core.runs": [1, 172],
              "data.trigger_bits": {"muon": 3}, "core.run": 5},
        mode="update")
    raw = dml.cat.files.where(F.col("id") == fid) \
        .select("metadata").collect()[0]["metadata"]
    meta = _json.loads(raw)
    assert meta["core.x"] == 0.2                   # float, not "0.2"
    assert meta["core.runs"] == [1, 172]           # array, not "[1, 172]"
    assert meta["data.trigger_bits"] == {"muon": 3}
    # untouched keys from before the update keep their types too
    assert not isinstance(meta.get("core.run"), str)
    # nested-path access works after the update
    eng2 = Engine(dml.cat)
    hits = eng2.query(
        'files where data.trigger_bits["muon"] = 3 and core.run = 5')
    assert fid in {r["id"] for r in hits.collect()}


def test_declare_redeclare_raises(fresh):
    from metacat_spark.dml import AlreadyExists
    eng, dml = fresh
    fid = eng.query("files from test:all ordered limit 1") \
        .collect()[0]["id"]
    with pytest.raises(AlreadyExists):
        dml.declare_files([{"id": fid, "namespace": "t", "name": "n",
                            "metadata": {"core.run": 1}}])
    with pytest.raises(AlreadyExists):  # dup inside the batch
        dml.declare_files([
            {"id": "zdup", "namespace": "t", "name": "a",
             "metadata": {"core.run": 1}},
            {"id": "zdup", "namespace": "t", "name": "b",
             "metadata": {"core.run": 1}}])


def test_membership_dedup_and_existence(fresh):
    eng, dml = fresh
    fid = eng.query("files from test:all ordered limit 1") \
        .collect()[0]["id"]
    before = dml.cat.files_datasets.count()
    assert dml.add_files_to_dataset([fid], "dune", "urgent_2") == 1
    # idempotent: re-add is a no-op, membership table does not grow
    assert dml.add_files_to_dataset([fid, fid], "dune", "urgent_2") == 0
    assert dml.cat.files_datasets.count() == before + 1
    with pytest.raises(DMLError, match="not found"):
        dml.add_files_to_dataset([fid], "dune", "no_such_dataset")
    with pytest.raises(DMLError, match="not found"):
        dml.add_files_to_dataset(["zmissing"], "dune", "urgent_2")
    # add_to sink is idempotent against existing membership too
    result = eng.file_set("files from dune:urgent_3")
    n1 = dml.add_to(result, "dune", "urgent_2")
    n2 = dml.add_to(result, "dune", "urgent_2")
    assert n1 > 0 and n2 == 0


def test_save_as_and_add_to(fresh):
    eng, dml = fresh
    result = eng.file_set("files from dune:urgent_2 where core.good = true")
    n = dml.save_as(result, "test", "saved_run")
    assert n == result.select("id").distinct().count()
    eng2 = Engine(dml.cat)
    # compare id SETS: the fixture's one fully-duplicated source row can
    # make row counts differ by one across the membership semi-join
    saved_ids = {r["id"] for r in
                 eng2.query("files from test:saved_run").collect()}
    want_ids = {r["id"] for r in result.select("id").collect()}
    assert saved_ids == want_ids
    with pytest.raises(DMLError):
        dml.save_as(result, "test", "saved_run")  # already exists
    n2 = dml.add_to(eng.file_set("files from dune:urgent_3"),
                    "test", "saved_run")
    assert n2 > 0


# ------------------------------------------------------------------ stats

def test_stats_counts(fresh):
    from metacat_spark.stats import CatalogStats
    eng, dml = fresh
    stats = CatalogStats(dml.cat)
    exact = stats.nfiles("dune", "urgent_0", exact=True)
    cached = stats.nfiles("dune", "urgent_0")
    assert exact == cached > 0
    direct = eng.query("files from dune:urgent_0", summary="count") \
        .collect()[0]["count"]
    assert exact == direct
    # counts drop when a member file is retired and stats refresh
    fid = eng.query("files from dune:urgent_0 ordered limit 1") \
        .collect()[0]["id"]
    dml.retire_file(fid)
    stats2 = CatalogStats(dml.cat)
    assert stats2.nfiles("dune", "urgent_0", exact=True) == exact - 1


def test_move_files(fresh):
    eng, dml = fresh
    fid = eng.query("files from dune:urgent_2 ordered limit 1") \
        .collect()[0]["id"]
    dml.move_files([fid], "test", by="mover")
    row = dml.cat.files.where(F.col("id") == fid) \
        .select("namespace", "updated_by").collect()[0]
    assert row["namespace"] == "test" and row["updated_by"] == "mover"
    # membership (keyed by id) still holds: the file remains in its
    # datasets after the move
    eng2 = Engine(dml.cat)
    ids = {r["id"] for r in eng2.query("files from dune:urgent_2")
           .collect()}
    assert fid in ids


def test_update_dataset(fresh):
    eng, dml = fresh
    fid = eng.query("files from test:all ordered limit 1") \
        .collect()[0]["id"]
    dml.update_dataset("dune", "urgent_2", metadata={"data.type": "mc"},
                       frozen=True, description="frozen now")
    row = dml.cat.datasets.where(
        (F.col("namespace") == "dune") & (F.col("name") == "urgent_2")) \
        .select("frozen", "description", "metadata").collect()[0]
    assert row["frozen"] and row["description"] == "frozen now"
    assert '"data.type": "mc"' in row["metadata"].replace('":"', '": "')
    with pytest.raises(DMLError, match="frozen"):
        dml.add_files_to_dataset([fid], "dune", "urgent_2")
    dml.update_dataset("dune", "urgent_2", frozen=False)
    dml.add_files_to_dataset([fid], "dune", "urgent_2")  # unfrozen


def test_create_namespace(fresh):
    _, dml = fresh
    dml.create_namespace("newns", owner="me")
    assert dml.cat.namespaces.where(F.col("name") == "newns").count() == 1
    with pytest.raises(DMLError, match="exists"):
        dml.create_namespace("newns")


def test_declare_with_checksums_and_parents(fresh):
    eng, dml = fresh
    parent = eng.cat.files.select("id").first()["id"]
    dml.declare_files([dict(
        id="fx1", namespace="dune", name="fx1.dat", size=10,
        metadata={"core.run": 1},
        checksums={"adler32": "0a0b0c0d", "md5": "ff"},
        parents=[parent])])
    row = (eng.cat.files.where(F.col("id") == "fx1")
           .select("checksums").first())
    assert dict(row["checksums"]) == {"adler32": "0a0b0c0d", "md5": "ff"}
    edges = (eng.cat.parent_child
             .where(F.col("child_id") == "fx1").collect())
    assert [(e["parent_id"], e["child_id"]) for e in edges] \
        == [(parent, "fx1")]


def test_declare_unknown_parent_rejected(fresh):
    _, dml = fresh
    with pytest.raises(DMLError, match="parent"):
        dml.declare_files([dict(
            id="fx2", namespace="dune", name="fx2.dat",
            metadata={"core.run": 1}, parents=["no-such-fid"])])


def test_update_file_attributes(fresh):
    eng, dml = fresh
    fid = eng.cat.files.select("id").first()["id"]
    dml.update_file(fid, size=777, checksums={"sha256": "aa"})
    row = (eng.cat.files.where(F.col("id") == fid)
           .select("size", "checksums", "updated_by").first())
    assert row["size"] == 777 and row["updated_by"] == "cli" \
        or row["updated_by"] == "admin"
    assert row["checksums"]["sha256"] == "aa"
    assert "adler32" in row["checksums"]        # merge keeps existing
    # replace mode drops the old keys
    dml.update_file(fid, checksums={"crc": "1"}, replace=True)
    row = (eng.cat.files.where(F.col("id") == fid)
           .select("checksums").first())
    assert dict(row["checksums"]) == {"crc": "1"}


def test_update_file_provenance_edges(fresh):
    eng, dml = fresh
    ids = [r["id"] for r in eng.cat.files.select("id").limit(4).collect()]
    target, p1, p2, c1 = ids
    before = eng.cat.parent_child.count()
    dml.update_file(target, parents=[p1, p2], children=[c1])
    pc = eng.cat.parent_child
    assert pc.where((F.col("child_id") == target)
                    & F.col("parent_id").isin([p1, p2])).count() == 2
    assert pc.where((F.col("parent_id") == target)
                    & (F.col("child_id") == c1)).count() == 1
    # re-adding is a no-op (PK semantics)
    n = pc.count()
    dml.update_file(target, parents=[p1])
    assert eng.cat.parent_child.count() == n
    # replace with '-' (empty list) removes all parents of target
    dml.update_file(target, parents=[], replace=True)
    assert eng.cat.parent_child.where(
        F.col("child_id") == target).count() == 0
    assert eng.cat.parent_child.where(
        F.col("parent_id") == target).count() >= 1
    with pytest.raises(DMLError, match="not found"):
        dml.update_file("no-such-fid", size=1)


def test_dml_404s_and_atomicity(fresh):
    """Review-r6 hardening: mutations of nonexistent targets raise
    instead of silently no-opping; declaring into a missing/frozen
    dataset fails BEFORE any rows were appended."""
    eng, dml = fresh
    cat = dml.cat
    with pytest.raises(DMLError):
        dml.update_file_metadata("no-such-fid", {"core.run": 1},
                                 mode="replace")
    with pytest.raises(DMLError):
        dml.retire_file("no-such-fid")
    with pytest.raises(DMLError):
        dml.move_files(["no-such-fid"], "elsewhere")
    with pytest.raises(DMLError):
        dml.update_dataset("nope", "nope", frozen=True)
    assert ("nope", "nope") not in dml.frozen   # cache not poisoned
    n_before = cat.files.count()
    with pytest.raises(DMLError):
        dml.declare_files(
            [{"id": "atomic-1", "namespace": "test", "name": "a.dat"}],
            dataset=("nope", "nope"))
    assert cat.files.count() == n_before        # nothing appended


def test_save_as_frozen_updates_cache(fresh):
    """save_as(frozen=True) receives its own files but freezes the
    flag cache for later mutations (review r6: the cache lagged until
    refresh())."""
    eng, dml = fresh
    res = eng.query("files from dune:urgent_0 limit 3")
    n = dml.save_as(res, "test", "saved_frozen_r6", frozen=True)
    assert n == 3
    with pytest.raises(DMLError):
        dml.add_files_to_dataset(
            [r["id"] for r in res.select("id").collect()][:1],
            "test", "saved_frozen_r6")


def test_dataset_metadata_requirements_enforced(fresh):
    """Per-dataset file_meta_requirements (dbobjects2.py:1577-1597):
    files joining the dataset must satisfy them — both on
    add_files_to_dataset and on declare-into-dataset (review r6: the
    cache existed but nothing ever populated it)."""
    eng, dml = fresh
    dml.create_dataset(
        "test", "reqs_r6",
        file_meta_requirements={"core.run": {"type": "int",
                                             "required": True}})
    dml.declare_files([
        {"id": "rq-ok", "namespace": "test", "name": "ok.dat",
         "metadata": {"core.run": 7}},
        {"id": "rq-bad", "namespace": "test", "name": "bad.dat",
         "metadata": {}}])
    dml.add_files_to_dataset(["rq-ok"], "test", "reqs_r6")
    with pytest.raises(ValidationFailed):
        dml.add_files_to_dataset(["rq-bad"], "test", "reqs_r6")
    with pytest.raises(ValidationFailed):
        dml.declare_files(
            [{"id": "rq-bad2", "namespace": "test", "name": "b2.dat",
              "metadata": {}}], dataset=("test", "reqs_r6"))


def test_declared_files_get_created_timestamp(fresh):
    """Newly declared files carry a created_timestamp (reference
    schema DEFAULT now()) — NULL would drop them from every
    created_timestamp predicate (review r6)."""
    eng, dml = fresh
    dml.declare_files([{"id": "ts-r6", "namespace": "test",
                        "name": "ts.dat"}])
    row = dml.cat.files.where(F.col("id") == "ts-r6") \
        .select("created_timestamp").first()
    assert row["created_timestamp"] is not None
