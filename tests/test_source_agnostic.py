"""Source-agnostic catalog: back the engine with a JSON-line source and
an empty shredding schema — every predicate runs through the
schema-on-read fallback, proving any Spark-readable source works."""

import json

import pytest
from pyspark.sql import functions as F

from metacat_spark.catalog import from_dataframes
from metacat_spark.engine import Engine
from metacat_spark.schema import MetaSchema


@pytest.fixture(scope="module")
def json_engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonsrc")
    files_rows = []
    members = []
    for i in range(200):
        meta = {"core.run": i % 50, "core.x": round(i * 0.01, 2)}
        if i % 3 == 0:
            meta["beam.status"] = "on" if i % 2 == 0 else "off"
        files_rows.append({
            "id": f"j{i:06d}", "namespace": "jns",
            "name": f"file_{i}.json", "size": 1000 + i,
            "retired": i % 20 == 0, "metadata": json.dumps(meta)})
        members.append({"file_id": f"j{i:06d}",
                        "dataset_namespace": "jns",
                        "dataset_name": "all" if i % 2 == 0 else "odd"})
    fp = d / "files.jsonl"
    fp.write_text("\n".join(json.dumps(r) for r in files_rows))
    mp = d / "members.jsonl"
    mp.write_text("\n".join(json.dumps(r) for r in members))

    files = spark.read.json(str(fp))
    fd = spark.read.json(str(mp))
    cat = from_dataframes(spark, files, fd, file_meta=MetaSchema([]))
    return Engine(cat)


def test_json_source_bfq(json_engine):
    got = json_engine.query("files from jns:all where core.run > 25")
    ids = [r["id"] for r in got.select("id").collect()]
    want = [f"j{i:06d}" for i in range(200)
            if i % 2 == 0 and i % 20 != 0 and i % 50 > 25]
    assert sorted(ids) == sorted(want) and ids


def test_json_source_present_and_sets(json_engine):
    got = json_engine.query(
        'files where beam.status present and beam.status = "on"')
    ids = {r["id"] for r in got.select("id").collect()}
    want = {f"j{i:06d}" for i in range(200)
            if i % 3 == 0 and i % 2 == 0 and i % 20 != 0}
    assert ids == want


def test_json_source_set_ops_and_summary(json_engine):
    n = json_engine.query(
        "files from jns:all - files from jns:odd",
        summary="count").collect()[0]["count"]
    want = len([i for i in range(200) if i % 2 == 0 and i % 20 != 0])
    assert n == want


def test_default_datasets_derived(json_engine):
    ds = {(r["namespace"], r["name"]) for r in
          json_engine.query("datasets matching jns:*").collect()}
    assert ds == {("jns", "all"), ("jns", "odd")}
