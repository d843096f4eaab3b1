"""Durable catalog mode (r8): DML writes survive a restart.

The reference persists every write in PostgreSQL
(/root/reference/metacat/db/schema.sql:51-66; COPY-declare
dbobjects2.py:525-557) — a declare outlives the server process. These
tests pin the Spark equivalent (metacat_spark/durable.py): a
"restart" is a FRESH catalog built from the fixtures plus
DurableStore.attach() replaying the commit log; the restored state
must answer queries identically to the mutated session it replaces.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from metacat_spark.catalog import from_tpch
from metacat_spark.dml import DML, DMLError
from metacat_spark.durable import ALL_TABLES, DurableStore
from metacat_spark.engine import Engine

from conftest import SF_DIR


def _restart(spark, root):
    """Simulated process restart: brand-new catalog from the fixture
    base, overlay the committed log, fresh DML instance."""
    cat = from_tpch(spark, SF_DIR)
    store = DurableStore(spark, root)
    store.attach(cat)
    return cat, DML(cat, store=store), store


def _state(cat):
    """Order-independent full-state fingerprint of every catalog
    table (rows as sorted JSON) — timestamps stringified, so the
    in-memory session and the restored session compare exactly."""
    out = {}
    for t in ALL_TABLES:
        df = getattr(cat, t)
        if "metadata_v" in df.columns:
            df = df.drop("metadata_v")  # variant renders via metadata
        rows = sorted(json.dumps(r.asDict(recursive=True), sort_keys=True,
                                 default=str) for r in df.collect())
        out[t] = rows
    return out


def test_restart_finds_declared_files(spark, tmp_path):
    """The VERDICT r7 done-criterion: declare → restart → the MQL
    query finds the file; retire/update/move/named-query survive
    too, and the restored full state matches the mutated session
    byte-for-byte."""
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    dml1 = DML(cat1, store=DurableStore(spark, root))
    dml1.create_dataset("dune", "durable_ds",
                        file_meta_requirements={
                            "core.runs": {"type": "int[]"}})
    dml1.declare_files(
        [{"id": "dur-001", "namespace": "dune", "name": "d1.dat",
          "size": 100, "metadata": {"core.run": 1, "core.runs": [1]}},
         {"id": "dur-002", "namespace": "dune", "name": "d2.dat",
          "size": 200, "metadata": {"core.run": 2, "core.runs": [2]},
          "parents": ["dur-001"]}],
        dataset=("dune", "durable_ds"))
    dml1.retire_file("dur-002")
    dml1.update_file_metadata("dur-001", {"core.run": 1,
                                          "core.data_type": "mc"})
    dml1.move_files(["dur-001"], "mc")
    dml1.create_named_query("dune", "dq", "files from dune:durable_ds")
    dml1.create_namespace("durable_ns")
    want = _state(cat1)

    cat2, dml2, store2 = _restart(spark, root)
    assert _state(cat2) == want
    eng = Engine(cat2)
    ids = sorted(r["id"] for r in
                 eng.query("files from dune:durable_ds",
                           include_retired=True).collect())
    assert ids == ["dur-001", "dur-002"]
    # retire survived: default query excludes dur-002
    assert [r["id"] for r in
            eng.query("files from dune:durable_ds").collect()] \
        == ["dur-001"]
    # metadata update + move survived (shredded predicate + namespace)
    assert [r["id"] for r in eng.query(
        'files from dune:durable_ds where core.data_type="mc"'
        ).collect()] == ["dur-001"]
    assert cat2.files.where(F.col("id") == "dur-001") \
        .first()["namespace"] == "mc"
    # provenance edge survived
    assert cat2.parent_child.where(
        (F.col("parent_id") == "dur-001")
        & (F.col("child_id") == "dur-002")).count() == 1
    # named query + dataset requirements + namespace survived
    assert [r["id"] for r in
            eng.query("files selected by dune:dq").collect()] \
        == ["dur-001"]
    assert dml2.dataset_requirements[("dune", "durable_ds")] \
        == {"core.runs": {"type": "int[]"}}
    assert cat2.namespaces.where(
        F.col("name") == "durable_ns").count() == 1


def test_restart_after_deletes_and_membership_changes(spark, tmp_path):
    """Delete cascades (file row + membership + provenance edges) and
    membership removals replay as journal DELETE segments."""
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    dml1 = DML(cat1, store=DurableStore(spark, root))
    dml1.create_dataset("dune", "dds")
    rows = [{"id": f"dd-{i}", "namespace": "dune", "name": f"f{i}.dat",
             "metadata": {"core.run": i, "core.runs": [i]}}
            for i in range(4)]
    rows[2]["parents"] = ["dd-0"]
    dml1.declare_files(rows, dataset=("dune", "dds"))
    dml1.remove_files_from_dataset(["dd-1"], "dune", "dds")
    dml1.delete_file("dd-2")
    want = _state(cat1)

    cat2, dml2, _ = _restart(spark, root)
    assert _state(cat2) == want
    member = sorted(r["file_id"] for r in cat2.files_datasets.where(
        F.col("dataset_name") == "dds").collect())
    assert member == ["dd-0", "dd-3"]
    assert cat2.files.where(F.col("id") == "dd-2").count() == 0
    assert cat2.parent_child.where(
        F.col("child_id") == "dd-2").count() == 0
    # a deleted id can be re-declared after restart (delete-then-
    # upsert ordering in the log)
    dml2.declare_files([{"id": "dd-2", "namespace": "dune",
                         "name": "f2b.dat",
                         "metadata": {"core.run": 9,
                                      "core.runs": [9]}}])
    cat3, _, _ = _restart(spark, root)
    assert cat3.files.where(F.col("id") == "dd-2") \
        .first()["name"] == "f2b.dat"


def test_restart_edge_replace_and_dataset_flags(spark, tmp_path):
    """update_file(parents=…, replace=True) journals delete+upsert in
    order; frozen/monotonic flags and dataset removal snapshot."""
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    dml1 = DML(cat1, store=DurableStore(spark, root))
    base = {"core.run": 1, "core.runs": [1]}
    dml1.declare_files(
        [{"id": f"pe-{i}", "namespace": "dune", "name": f"p{i}",
          "metadata": base} for i in range(3)])
    dml1.update_file("pe-2", parents=["pe-0"])
    dml1.update_file("pe-2", parents=["pe-1"], replace=True)
    dml1.create_dataset("dune", "gone_ds")
    dml1.create_dataset("dune", "frozen_ds")
    dml1.add_subset("dune", "frozen_ds", "dune", "gone_ds")
    dml1.update_dataset("dune", "frozen_ds", frozen=True)
    dml1.remove_dataset("dune", "gone_ds")
    want = _state(cat1)

    cat2, dml2, _ = _restart(spark, root)
    assert _state(cat2) == want
    parents = [r["parent_id"] for r in cat2.parent_child.where(
        F.col("child_id") == "pe-2").collect()]
    assert parents == ["pe-1"]
    assert ("dune", "frozen_ds") in dml2.frozen
    with pytest.raises(DMLError):
        dml2.add_files_to_dataset(["pe-0"], "dune", "frozen_ds")
    assert cat2.datasets.where(F.col("name") == "gone_ds").count() == 0
    assert cat2.datasets_parent_child.where(
        F.col("child_name") == "gone_ds").count() == 0


def test_compact_folds_log_and_preserves_state(spark, tmp_path):
    """compact() = snapshot + truncated journal: state identical
    before/after, across a restart, and the old segment dirs are
    gone (bounded restore cost)."""
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    store1 = DurableStore(spark, root)
    dml1 = DML(cat1, store=store1)
    dml1.create_dataset("dune", "cds")
    dml1.declare_files(
        [{"id": f"cp-{i}", "namespace": "dune", "name": f"c{i}",
          "metadata": {"core.run": i, "core.runs": [i]}}
         for i in range(5)], dataset=("dune", "cds"))
    dml1.retire_file("cp-3")
    want = _state(cat1)
    n_segs_before = sum(
        len(e.get("segments") or [])
        for e in store1.manifest["tables"].values())
    assert n_segs_before > 0
    store1.compact(cat1)
    assert all(not e.get("segments")
               for e in store1.manifest["tables"].values())
    assert _state(cat1) == want          # live catalog re-pointed
    cat2, _, store2 = _restart(spark, root)
    assert _state(cat2) == want
    # mutations continue journaling on top of the snapshot
    DML(cat2, store=store2).retire_file("cp-1")
    cat3, _, _ = _restart(spark, root)
    assert cat3.files.where(F.col("id") == "cp-1").first()["retired"]


def test_variant_mode_durable_roundtrip(spark, tmp_path):
    """Cross-feature: the VARIANT warehouse mode journals its native
    VariantType column through the parquet commit log — declare,
    metadata update, and delete (whose delete segments must align a
    NULL variant column) all replay into a fresh variant catalog,
    and variant-path predicates see the restored values."""
    from metacat_spark.catalog import from_materialized

    root = str(tmp_path / "cat")
    cat1 = from_materialized(spark, SF_DIR, variant=True)
    dml1 = DML(cat1, store=DurableStore(spark, root))
    dml1.declare_files(
        [{"id": "var-1", "namespace": "dune", "name": "v1.dat",
          "metadata": {"core.run": 41, "core.runs": [41]}},
         {"id": "var-2", "namespace": "dune", "name": "v2.dat",
          "metadata": {"core.run": 42, "core.runs": [42]}}])
    dml1.update_file_metadata("var-1", {"core.run": 987654,
                                        "core.runs": [987654]})
    dml1.delete_file("var-2")

    cat2 = from_materialized(spark, SF_DIR, variant=True)
    DurableStore(spark, root).attach(cat2)
    eng = Engine(cat2)
    assert [r["id"] for r in
            eng.query("files where core.run = 987654").collect()] \
        == ["var-1"]
    assert cat2.files.where(F.col("id") == "var-2").count() == 0
    # the restored variant column itself serves the value
    got = cat2.files.where(F.col("id") == "var-1").select(
        F.try_variant_get("metadata_v", "$['core.run']", "int")
        .alias("run")).first()
    assert got["run"] == 987654


def test_torn_manifest_falls_back_to_previous_commit(spark, tmp_path):
    """Crash contract: the highest PARSEABLE manifest wins — a torn
    write degrades to the previous commit; segment dirs without a
    manifest are never read."""
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    dml1 = DML(cat1, store=DurableStore(spark, root))
    dml1.declare_files([{"id": "t-1", "namespace": "dune", "name": "t1",
                         "metadata": {"core.run": 1,
                                      "core.runs": [1]}}])
    good = DurableStore(spark, root).manifest["commit"]
    # torn write of the NEXT commit
    with open(f"{root}/_commits/{good + 1:012d}.json", "w") as f:
        f.write('{"commit": ')         # truncated JSON
    store = DurableStore(spark, root)
    assert store.manifest["commit"] == good
    cat2 = from_tpch(spark, SF_DIR)
    store.attach(cat2)
    assert cat2.files.where(F.col("id") == "t-1").count() == 1
    os.remove(f"{root}/_commits/{good + 1:012d}.json")


def test_failed_mutation_journals_nothing(spark, tmp_path):
    """A raising mutation discards its pending journal ops: the log
    only ever records mutations that succeeded in session state."""
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    store1 = DurableStore(spark, root)
    dml1 = DML(cat1, store=store1)
    before = store1.manifest["commit"]
    with pytest.raises(DMLError):
        dml1.declare_files(
            [{"id": "x-1", "namespace": "dune", "name": "x",
              "metadata": {"core.run": 1, "core.runs": [1]}}],
            dataset=("dune", "no_such_dataset"))
    assert store1.manifest["commit"] == before
    assert dml1._pending == []
    # and the store still accepts the next good mutation
    dml1.declare_files([{"id": "x-1", "namespace": "dune", "name": "x",
                         "metadata": {"core.run": 1,
                                      "core.runs": [1]}}])
    assert store1.manifest["commit"] == before + 1


def test_partial_mutation_flushes_applied_ops(spark, tmp_path):
    """Review r8: when a composite mutation fails PARTWAY (here:
    save_as journals its dataset row, then add_to's execution raises
    under ANSI), the applied ops still flush — the commit log must
    equal session state, not silently roll back what the session
    kept. And check-before-mutate means update_file with invalid
    metadata after a size arg applies NOTHING."""
    from pyspark.sql import functions as F

    from metacat_spark.dml import ValidationFailed
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    store1 = DurableStore(spark, root)
    dml1 = DML(cat1, store=store1)
    # a result whose execution raises (ANSI cast) AFTER save_as
    # already created + journaled the dataset row; the throwing
    # expression rides the id column so projection pruning can't
    # skip it
    bad = cat1.files.limit(3).select(
        F.concat(F.col("id"),
                 F.expr("cast('zz' as int)").cast("string"))
        .alias("id"))
    with pytest.raises(Exception):
        dml1.save_as(bad, "dune", "half_ds")
    assert cat1.datasets.where(
        (F.col("namespace") == "dune")
        & (F.col("name") == "half_ds")).count() == 1
    want = _state(cat1)
    cat2, _, _ = _restart(spark, root)
    assert _state(cat2) == want          # log == session, exactly
    # update_file: validations run BEFORE any patch
    fid = cat1.files.select("id").first()["id"]
    size0 = cat1.files.where(F.col("id") == fid).first()["size"]
    with pytest.raises(ValidationFailed):
        dml1.update_file(fid, size=size0 + 999,
                         metadata={"core.run": "not-an-int"})
    assert cat1.files.where(F.col("id") == fid).first()["size"] \
        == size0
    with pytest.raises(DMLError):
        dml1.update_file(fid, size=size0 + 999,
                         parents=["no-such-fid"])
    assert cat1.files.where(F.col("id") == fid).first()["size"] \
        == size0
    # declare with a missing out-of-batch parent appends NOTHING
    with pytest.raises(DMLError):
        dml1.declare_files([{"id": "pm-1", "namespace": "dune",
                             "name": "p1", "parents": ["ghost"],
                             "metadata": {"core.run": 1,
                                          "core.runs": [1]}}])
    assert cat1.files.where(F.col("id") == "pm-1").count() == 0
    cat3, _, _ = _restart(spark, root)
    assert _state(cat3) == _state(cat1)


def test_remove_files_empty_list_is_noop(spark, tmp_path):
    """Review r8: an empty removal batch is a no-op in both modes
    (createDataFrame([]) cannot infer a schema and used to crash),
    but the frozen-policy check still fires first."""
    cat = from_tpch(spark, SF_DIR)
    for dml in (DML(cat),
                DML(cat, store=DurableStore(spark,
                                            str(tmp_path / "d")))):
        before = dml.cat.files_datasets.count()
        dml.remove_files_from_dataset([], "dune", "urgent_2")
        assert dml.cat.files_datasets.count() == before
        dml.update_dataset("dune", "urgent_2", frozen=True)
        with pytest.raises(DMLError):
            dml.remove_files_from_dataset([], "dune", "urgent_2")
        dml.update_dataset("dune", "urgent_2", frozen=False)


def test_time_travel_reads_historical_commits(spark, tmp_path):
    """Every numbered manifest is a complete catalog description, so
    `at=N` attaches the catalog AS OF commit N (the Delta VERSION AS
    OF analogue): commit 1 shows the file unretired, commit 2 shows
    it retired, a missing commit raises, and history() lists the
    log."""
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    dml1 = DML(cat1, store=DurableStore(spark, root))
    dml1.declare_files([{"id": "tt-1", "namespace": "dune",
                         "name": "tt1.dat",
                         "metadata": {"core.run": 1,
                                      "core.runs": [1]}}])
    dml1.retire_file("tt-1")

    def as_of(n):
        cat = from_tpch(spark, SF_DIR)
        DurableStore(spark, root, at=n).attach(cat)
        return cat.files.where(F.col("id") == "tt-1") \
            .select("retired").collect()

    assert [r["retired"] for r in as_of(1)] == [False]
    assert [r["retired"] for r in as_of(2)] == [True]
    with pytest.raises(ValueError, match="no commit 99"):
        DurableStore(spark, root, at=99)
    hist = DurableStore(spark, root).history()
    assert [h["commit"] for h in hist] == [1, 2]
    assert hist[0]["tables"]["files"]["segments"] == 1
    assert hist[1]["tables"]["files"]["segments"] == 2
    # a historical view is read-only: committing from it conflicts —
    # including at == LATEST, where no commit-number collision would
    # fire naturally (review r8)
    from metacat_spark.durable import CommitConflict
    for n in (1, 2):
        cat_old = from_tpch(spark, SF_DIR)
        store_old = DurableStore(spark, root, at=n)
        store_old.attach(cat_old)
        with pytest.raises(CommitConflict):
            DML(cat_old, store=store_old).retire_file(
                "tt-1", unretire=True)
    assert DurableStore(spark, root).manifest["commit"] == 2
    # compact() truncates history (like Delta VACUUM): attaching a
    # pre-compaction commit fails with a CLEAR error, not a mid-query
    # PATH_NOT_FOUND
    live = DurableStore(spark, root)
    cat_live = from_tpch(spark, SF_DIR)
    live.attach(cat_live)
    # a view OPENED before the compaction still holds commit 1's
    # manifest in memory — its attach must preflight-fail on the
    # deleted segment data, not die mid-query
    old = DurableStore(spark, root, at=1)
    live.compact(cat_live)
    with pytest.raises(ValueError, match="removed by a later compact"):
        old.attach(from_tpch(spark, SF_DIR))
    # opening AFTER the compaction fails even earlier: the manifest
    # itself was retired with the checkpoint (r9)
    with pytest.raises(ValueError, match="no commit 1"):
        DurableStore(spark, root, at=1)


def test_commit_conflict_single_winner(spark, tmp_path):
    """Two stores on ONE root racing the same commit number: exactly
    one publishes; the loser raises CommitConflict and the log holds
    only the winner's mutation (optimistic concurrency on manifest
    creation — the Delta/Iceberg log protocol's conflict point)."""
    from metacat_spark.durable import CommitConflict
    root = str(tmp_path / "cat")
    cat_a = from_tpch(spark, SF_DIR)
    cat_b = from_tpch(spark, SF_DIR)
    dml_a = DML(cat_a, store=DurableStore(spark, root))
    dml_b = DML(cat_b, store=DurableStore(spark, root))
    row = {"namespace": "dune", "name": "x",
           "metadata": {"core.run": 1, "core.runs": [1]}}
    dml_a.declare_files([dict(row, id="win-1")])
    # B's store still believes commit 0 → its next commit collides
    with pytest.raises(CommitConflict):
        dml_b.declare_files([dict(row, id="lose-1")])
    cat2, _, _ = _restart(spark, root)
    assert cat2.files.where(F.col("id") == "win-1").count() == 1
    assert cat2.files.where(F.col("id") == "lose-1").count() == 0


def test_commit_conflict_single_winner_through_hook(spark, tmp_path):
    """The r10 create-if-absent backend hook: a local conditional-
    create implementation (O_CREAT|O_EXCL — the same promise a
    conditional PUT gives on S3-class stores) carries the whole
    single-winner protocol. Publishes flow through the hook, the
    racer loses with CommitConflict, a restart holds only the
    winner, and a hook answering False (the HTTP-412 path) is the
    same loss."""
    from metacat_spark.durable import CommitConflict, DurableStore
    calls = []

    def cond_create(dest, data):
        calls.append(dest)
        try:
            fd = os.open(dest, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return True

    root = str(tmp_path / "cat")
    cat_a = from_tpch(spark, SF_DIR)
    cat_b = from_tpch(spark, SF_DIR)
    dml_a = DML(cat_a, store=DurableStore(
        spark, root, create_if_absent=cond_create))
    dml_b = DML(cat_b, store=DurableStore(
        spark, root, create_if_absent=cond_create))
    row = {"namespace": "dune", "name": "x",
           "metadata": {"core.run": 1, "core.runs": [1]}}
    dml_a.declare_files([dict(row, id="win-1")])
    assert calls and calls[0].endswith("000000000001.json")
    with pytest.raises(CommitConflict):
        dml_b.declare_files([dict(row, id="lose-1")])
    # the loser really raced THROUGH the hook (>= 2: DML's flush
    # deliberately re-attempts once on a raising mutation), and
    # every losing attempt targeted the contested slot
    assert len(calls) >= 2
    assert all(c.endswith("000000000001.json") for c in calls)
    # the published log is byte-compatible: a plain (hook-less)
    # restart replays it
    cat2, _, _ = _restart(spark, root)
    assert cat2.files.where(F.col("id") == "win-1").count() == 1
    assert cat2.files.where(F.col("id") == "lose-1").count() == 0
    # a hook that reports "exists" by returning False (conditional
    # PUT precondition failure) is the same CommitConflict
    dml_c = DML(from_tpch(spark, SF_DIR), store=DurableStore(
        spark, root, create_if_absent=lambda d, b: False))
    with pytest.raises(CommitConflict):
        dml_c.declare_files([dict(row, id="lose-2")])


def test_concurrent_declares_all_reach_the_log(spark, tmp_path):
    """The threaded HTTP server mutates through one DML instance from
    many threads; the RLock serializes and the commit boundary must
    give every mutation its own durable commit — nothing lost,
    restart state == session state."""
    import threading

    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    store1 = DurableStore(spark, root)
    dml1 = DML(cat1, store=store1)
    base_commit = store1.manifest["commit"]
    errs = []

    def declare(i):
        try:
            dml1.declare_files(
                [{"id": f"cc-{i}", "namespace": "dune",
                  "name": f"cc{i}.dat",
                  "metadata": {"core.run": i, "core.runs": [i]}}])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=declare, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert store1.manifest["commit"] == base_commit + 6
    cat2, _, _ = _restart(spark, root)
    got = sorted(r["id"] for r in cat2.files.where(
        F.col("id").startswith("cc-")).collect())
    assert got == [f"cc-{i}" for i in range(6)]
    assert _state(cat2) == _state(cat1)


def test_durable_composite_is_one_commit(spark, tmp_path):
    """declare_files(dataset=…) nests add_files_to_dataset; the
    outermost lock boundary flushes ONE durable commit (atomicity of
    composite mutations in the log)."""
    root = str(tmp_path / "cat")
    cat1 = from_tpch(spark, SF_DIR)
    store1 = DurableStore(spark, root)
    dml1 = DML(cat1, store=store1)
    dml1.create_dataset("dune", "one_ds")
    at_create = store1.manifest["commit"]
    dml1.declare_files(
        [{"id": "oc-1", "namespace": "dune", "name": "o1",
          "metadata": {"core.run": 1, "core.runs": [1]}}],
        dataset=("dune", "one_ds"))
    assert store1.manifest["commit"] == at_create + 1


def test_compact_checkpoints_and_retires_manifests(spark, tmp_path):
    """compact() writes _last_checkpoint and retires the manifests
    below it (VERDICT r8 #4): the _commits listing — what attach
    walks — is O(commits-since-compact), history() lists only the
    live window, and a writer stale by more than one compaction
    cannot fork history into a vacated manifest slot."""
    from metacat_spark.durable import CommitConflict
    root = str(tmp_path / "cat")
    cat = from_tpch(spark, SF_DIR)
    store = DurableStore(spark, root)
    dml = DML(cat, store=store)
    dml.create_dataset("dune", "ckd")
    dml.declare_files(
        [{"id": f"ck-{i}", "namespace": "dune", "name": f"k{i}",
          "metadata": {"core.run": i, "core.runs": [i]}}
         for i in range(4)], dataset=("dune", "ckd"))
    dml.retire_file("ck-2")
    pre_ids = store._list_commit_ids()
    assert len(pre_ids) >= 3
    # a second, stale store attached BEFORE the compactions
    stale = DurableStore(spark, root)

    store.compact(cat)
    c1 = store.manifest["commit"]
    assert store._read_checkpoint() == c1
    assert store._list_commit_ids() == [c1]   # older manifests retired
    assert [h["commit"] for h in store.history()] == [c1]

    # keep mutating + compact AGAIN so the stale writer's next commit
    # number lands on a retired (vacated) manifest slot
    dml.retire_file("ck-0")
    store.compact(cat)
    c2 = store.manifest["commit"]
    assert c2 > c1 and store._read_checkpoint() == c2
    assert os.path.exists(
        os.path.join(root, "_commits", "_last_checkpoint"))
    # stale writer would publish commit <= c2 into a vacated slot —
    # the checkpoint guard must refuse instead of forking history
    with pytest.raises(CommitConflict):
        DML(cat, store=stale).retire_file("ck-1")

    # the surviving log keeps working: fresh mutation + restart
    DML(cat, store=store).retire_file("ck-3")
    cat2, _, _ = _restart(spark, root)
    got = {r["id"]: r["retired"]
           for r in cat2.files.where(
               F.col("id").startswith("ck-")).collect()}
    assert got == {"ck-0": True, "ck-1": False,
                   "ck-2": True, "ck-3": True}
