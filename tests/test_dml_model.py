"""Model-based DML testing: random mutation sequences applied both to
the Spark catalog (DML) and to a plain-Python dict model; final states
must agree. Catches interaction bugs single-op tests miss
(update-after-retire, repeated edge adds, replace-vs-merge chains,
lineage-truncation correctness across many mutations)."""

import random

import pytest
from pyspark.sql import functions as F

from metacat_spark.catalog import from_tpch
from metacat_spark.dml import DML, DMLError
from metacat_spark.engine import Engine

from conftest import SF_DIR


class Model:
    """Reference-semantics catalog model over plain dicts."""

    def __init__(self):
        self.files = {}          # id -> dict(size, retired, checksums, namespace)
        self.membership = set()  # (file_id, ns, name)
        self.edges = set()       # (parent_id, child_id)

    def declare(self, fid, ns, name, size):
        self.files[fid] = dict(size=size, retired=False,
                               checksums={}, namespace=ns)

    def update(self, fid, size=None, checksums=None, replace=False):
        f = self.files[fid]
        if size is not None:
            f["size"] = size
        if checksums is not None:
            base = {} if replace else dict(f["checksums"])
            base.update({k: str(v) for k, v in checksums.items()})
            f["checksums"] = base

    def retire(self, fid, unretire=False):
        self.files[fid]["retired"] = not unretire

    def move(self, fid, ns):
        self.files[fid]["namespace"] = ns

    def add_edges(self, fid, parents, replace=False):
        if replace:
            self.edges = {(p, c) for p, c in self.edges if c != fid}
        self.edges |= {(p, fid) for p in parents}


OPS = ["declare", "update_size", "update_checksums",
       "retire", "unretire", "move", "edges_add", "edges_replace"]


@pytest.mark.parametrize("seed,durable", [(11, False), (23, False),
                                          (47, True)])
def test_random_mutation_sequence_matches_model(spark, seed, durable,
                                                tmp_path):
    """``durable=True`` additionally journals every mutation to a
    DurableStore and compares the RESTORED (fresh catalog + attach)
    state against the model too — random-sequence coverage of the
    r8 commit-log replay, beyond test_durable.py's scripted cases."""
    rng = random.Random(seed)
    cat = from_tpch(spark, SF_DIR)
    store = None
    if durable:
        from metacat_spark.durable import DurableStore
        store = DurableStore(spark, str(tmp_path / "dur"))
    eng, dml = Engine(cat), DML(cat, store=store)
    model = Model()

    # seed pool: 3 declared files to mutate
    for i in range(3):
        fid = f"mdl-{seed}-{i}"
        dml.declare_files([dict(id=fid, namespace="dune",
                                name=f"mdl_{seed}_{i}.dat", size=i,
                                metadata={"core.run": 1})])
        model.declare(fid, "dune", f"mdl_{seed}_{i}.dat", i)
    pool = sorted(model.files)

    for step in range(12):
        op = rng.choice(OPS)
        fid = rng.choice(pool)
        if op == "declare":
            nid = f"mdl-{seed}-n{step}"
            dml.declare_files([dict(id=nid, namespace="mc",
                                    name=f"mdl_{seed}_n{step}.dat",
                                    size=step,
                                    metadata={"core.run": 2})])
            model.declare(nid, "mc", f"mdl_{seed}_n{step}.dat", step)
            pool = sorted(model.files)
        elif op == "update_size":
            sz = rng.randrange(10_000)
            dml.update_file(fid, size=sz)
            model.update(fid, size=sz)
        elif op == "update_checksums":
            ck = {rng.choice(["adler32", "md5", "sha1"]):
                  format(rng.randrange(2**32), "08x")}
            rep = rng.random() < 0.3
            dml.update_file(fid, checksums=ck, replace=rep)
            model.update(fid, checksums=ck, replace=rep)
        elif op == "retire":
            dml.retire_file(fid)
            model.retire(fid)
        elif op == "unretire":
            dml.retire_file(fid, unretire=True)
            model.retire(fid, unretire=True)
        elif op == "move":
            ns = rng.choice(["dune", "mc", "test"])
            dml.move_files([fid], ns)
            model.move(fid, ns)
        elif op in ("edges_add", "edges_replace"):
            parents = rng.sample([p for p in pool if p != fid],
                                 k=min(2, len(pool) - 1))
            rep = op == "edges_replace"
            dml.update_file(fid, parents=parents, replace=rep)
            model.add_edges(fid, parents, replace=rep)

    # ---- compare final states (and, in durable mode, the restored
    #      state after a simulated restart)
    def check(c):
        ids = sorted(model.files)
        rows = (c.files.where(F.col("id").isin(ids))
                .select("id", "namespace", "size", "retired",
                        "checksums")
                .collect())
        assert len(rows) == len(ids)
        for r in rows:
            m = model.files[r["id"]]
            assert r["size"] == m["size"], r["id"]
            assert r["retired"] == m["retired"], r["id"]
            assert r["namespace"] == m["namespace"], r["id"]
            assert dict(r["checksums"] or {}) == m["checksums"], r["id"]
        got_edges = {(e["parent_id"], e["child_id"])
                     for e in c.parent_child
                     .where(F.col("child_id").isin(ids)).collect()}
        assert got_edges == model.edges

    check(cat)
    if durable:
        from metacat_spark.durable import DurableStore
        cat2 = from_tpch(spark, SF_DIR)
        DurableStore(spark, str(tmp_path / "dur")).attach(cat2)
        check(cat2)
