"""CLI parity round-trips (reference metacat/ui/: file, dataset,
namespace, named-query subcommand families). Each test drives
`cli.main()` in-process; the module-level session cache makes
successive invocations share catalog state, like successive `metacat`
calls against one server."""

import json

import pytest
from pyspark.sql import functions as F

from metacat_spark import cli
from tests.conftest import SF_DIR


def run(capsys, *argv):
    rc = cli.main([*argv, "--sf-dir", SF_DIR])
    out = capsys.readouterr().out
    return rc, out


@pytest.fixture(scope="module", autouse=True)
def _warm(spark):
    # bind the CLI session to the shared test SparkSession
    cli._session(SF_DIR)
    yield


def test_query_basic(capsys):
    rc, out = run(capsys, "query",
                  "files from dune:urgent_0 ordered limit 5", "-j")
    assert rc == 0
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert len(rows) == 5 and all("id" in r for r in rows)


def test_query_summary_count(capsys):
    rc, out = run(capsys, "query", "files from dune:urgent_0",
                  "-s", "count", "-j")
    row = json.loads(out.splitlines()[0])
    assert row["count"] > 0 and row["total_size"] > 0


def test_query_explain(capsys):
    rc, out = run(capsys, "query", "files from dune:urgent_0", "-x")
    assert rc == 0 and "FileQuery" in out


def test_query_export_sink(capsys, tmp_path, spark):
    dest = str(tmp_path / "export_pq")
    rc, out = run(capsys, "query",
                  "files from dune:urgent_0 where core.run > 250",
                  "-o", dest)
    assert rc == 0 and "exported" in out
    back = spark.read.parquet(dest)
    assert back.count() > 0 and "id" in back.columns
    dest_j = str(tmp_path / "export_json")
    rc, _ = run(capsys, "query", "files from dune:urgent_0 limit 7",
                "-o", dest_j, "-F", "json")
    assert rc == 0 and spark.read.json(dest_j).count() == 7


def test_file_declare_show_id_name_datasets(capsys):
    rc, out = run(capsys, "file", "declare", "cli_ns:f1.dat",
                  "dune:urgent_2", "--id", "cli-f1", "--size", "123",
                  "--meta", '{"core.run": 5, "core.x": 1.5}')
    assert rc == 0 and "declared 1" in out
    _, out = run(capsys, "file", "show", "cli_ns:f1.dat", "-m", "-j")
    row = json.loads(out.splitlines()[0])
    assert row["id"] == "cli-f1" and row["size"] == 123
    assert row["metadata"]["core.run"] == 5
    _, out = run(capsys, "file", "id", "cli_ns:f1.dat")
    assert out.strip() == "cli-f1"
    _, out = run(capsys, "file", "name", "cli-f1")
    assert out.strip() == "cli_ns:f1.dat"
    _, out = run(capsys, "file", "datasets", "cli-f1", "-i")
    assert "dune\turgent_2" in out
    # declared metadata is immediately queryable (shredded + JSON)
    _, out = run(capsys, "query",
                 "files from dune:urgent_2 where core.x = 1.5", "-j")
    assert any(json.loads(ln)["id"] == "cli-f1"
               for ln in out.splitlines())


def test_file_redeclare_rejected(capsys):
    from metacat_spark.dml import AlreadyExists
    with pytest.raises(AlreadyExists):
        run(capsys, "file", "declare", "cli_ns:f1.dat",
            "--id", "cli-f1")


def test_file_retire_unretire(capsys):
    run(capsys, "file", "declare", "cli_ns:f2.dat", "--id", "cli-f2")
    run(capsys, "dataset", "add-files", "dune:urgent_1",
        "--ids", "cli-f2")
    q = ("query", "files from dune:urgent_1 "
         "where namespace = 'cli_ns'", "-j")
    _, out = run(capsys, *q)
    assert "cli-f2" in out
    run(capsys, "file", "retire", "cli-f2", "-i")
    _, out = run(capsys, *q)
    assert "cli-f2" not in out
    run(capsys, "file", "retire", "cli-f2", "-i", "-u")
    _, out = run(capsys, *q)
    assert "cli-f2" in out


def test_file_update_meta_and_move(capsys):
    run(capsys, "file", "declare", "cli_ns:f3.dat", "--id", "cli-f3",
        "--meta", '{"core.run": 7}')
    run(capsys, "file", "update-meta", '{"core.run": 4242}',
        "cli-f3", "-i")
    _, out = run(capsys, "file", "show", "cli_ns:f3.dat", "-m", "-j")
    assert json.loads(out.splitlines()[0])["metadata"]["core.run"] \
        == 4242
    run(capsys, "file", "move", "-n", "cli_ns2", "cli-f3")
    _, out = run(capsys, "file", "name", "cli-f3")
    assert out.strip() == "cli_ns2:f3.dat"


def test_dataset_lifecycle(capsys):
    rc, out = run(capsys, "dataset", "create", "cli_ns:dset1",
                  "a cli dataset", "--meta", '{"detector_id": 9}')
    assert rc == 0
    _, out = run(capsys, "dataset", "show", "cli_ns:dset1", "-j")
    row = json.loads(out.splitlines()[0])
    assert row["description"] == "a cli dataset" \
        and not row["frozen"]
    _, out = run(capsys, "dataset", "list", "cli_%:%")
    assert "dset1" in out
    run(capsys, "dataset", "add-files", "cli_ns:dset1",
        "--ids", "cli-f1")
    _, out = run(capsys, "dataset", "files", "cli_ns:dset1", "-j")
    assert any(json.loads(ln)["id"] == "cli-f1"
               for ln in out.splitlines())
    run(capsys, "dataset", "remove-files", "cli_ns:dset1",
        "--ids", "cli-f1")
    _, out = run(capsys, "dataset", "files", "cli_ns:dset1", "-j")
    assert out.strip() == ""
    run(capsys, "dataset", "remove", "cli_ns:dset1")
    with pytest.raises(SystemExit):
        run(capsys, "dataset", "show", "cli_ns:dset1")


def test_dataset_update_freeze(capsys):
    run(capsys, "dataset", "create", "cli_ns:dset2")
    run(capsys, "dataset", "update", "cli_ns:dset2",
        "--frozen", "yes")
    from metacat_spark.dml import DMLError
    with pytest.raises(DMLError):
        run(capsys, "dataset", "add-files", "cli_ns:dset2",
            "--ids", "cli-f1")
    run(capsys, "dataset", "update", "cli_ns:dset2", "--frozen", "no")
    run(capsys, "dataset", "add-files", "cli_ns:dset2",
        "--ids", "cli-f1")
    _, out = run(capsys, "dataset", "files", "cli_ns:dset2", "-j")
    assert "cli-f1" in out


def test_dataset_add_subset(capsys):
    run(capsys, "dataset", "create", "cli_ns:parent")
    run(capsys, "dataset", "create", "cli_ns:child")
    run(capsys, "dataset", "add-files", "cli_ns:child",
        "--ids", "cli-f1")
    run(capsys, "dataset", "add-subset", "cli_ns:parent",
        "cli_ns:child")
    _, out = run(capsys, "query",
                 "files from cli_ns:parent with subsets", "-j")
    assert any(json.loads(ln)["id"] == "cli-f1"
               for ln in out.splitlines())


def test_dataset_addfiles_by_query(capsys):
    run(capsys, "dataset", "create", "cli_ns:byquery")
    rc, out = run(capsys, "dataset", "add-files", "cli_ns:byquery",
                  "--query",
                  "files from dune:urgent_0 ordered limit 7")
    assert "added 7" in out
    _, out = run(capsys, "dataset", "files", "cli_ns:byquery", "-j")
    assert len(out.splitlines()) == 7


def test_query_save_as_and_add_to(capsys):
    rc, out = run(capsys, "query",
                  "files from dune:urgent_0 ordered limit 4",
                  "-S", "cli_ns:saved1")
    assert "saved 4" in out
    rc, out = run(capsys, "query",
                  "files from dune:urgent_1 ordered limit 3",
                  "-A", "cli_ns:saved1")
    assert "added 3" in out
    _, out = run(capsys, "dataset", "files", "cli_ns:saved1", "-j")
    assert len(out.splitlines()) == 7


def test_namespace_roundtrip(capsys):
    run(capsys, "namespace", "create", "cli_new_ns", "-o", "alice")
    _, out = run(capsys, "namespace", "show", "cli_new_ns", "-j")
    row = json.loads(out.splitlines()[0])
    assert row["owner_user"] == "alice"
    _, out = run(capsys, "namespace", "list", "cli_%")
    assert "cli_new_ns" in out


def test_named_query_roundtrip(capsys):
    run(capsys, "named-query", "create", "cli_ns:myq",
        "files from dune:urgent_0 where core.run > 0 limit 6")
    _, out = run(capsys, "named-query", "show", "cli_ns:myq")
    assert "core.run > 0" in out
    _, out = run(capsys, "named-query", "search", "core.run > 0")
    assert "myq" in out
    # the engine inlines the saved query
    _, out = run(capsys, "query", "files selected by cli_ns:myq", "-j")
    assert len(out.splitlines()) == 6
    _, out = run(capsys, "named-query", "list")
    assert "myq" in out


def test_file_declare_sample(capsys):
    rc, out = run(capsys, "file", "declare-sample")
    assert rc == 0
    sample = json.loads(out)
    assert sample[0]["checksums"] and sample[0]["parents"]


def test_file_update_attributes_and_add(capsys):
    rc, out = run(capsys, "file", "declare", "dune:upd_a.dat",
                  "--id", "upd-a", "--meta", '{"core.run": 987653}')
    assert rc == 0
    rc, out = run(capsys, "file", "declare", "dune:upd_b.dat",
                  "--id", "upd-b", "--meta", '{"core.run": 987654}',
                  "-k", "adler32:cafe", "-p", "upd-a")
    assert rc == 0
    # checksum + size update, then provenance replace
    rc, out = run(capsys, "file", "update", "dune:upd_b.dat",
                  "-s", "4242", "-k", "sha256:beef")
    assert rc == 0 and "updated" in out
    rc, out = run(capsys, "query",
                  "parents(files where core.run = 987654)", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert [r["id"] for r in rows] == ["upd-a"]
    rc, out = run(capsys, "file", "update", "dune:upd_b.dat",
                  "-p", "-", "-r")
    assert rc == 0
    rc, out = run(capsys, "query",
                  "parents(files where core.run = 987654)", "-j")
    assert out.strip() == ""
    # file add: put upd-a into a fresh dataset by DID
    rc, out = run(capsys, "dataset", "create", "dune:upd_ds")
    assert rc == 0
    rc, out = run(capsys, "file", "add", "dune:upd_a.dat",
                  "dune:upd_ds")
    assert rc == 0 and "added 1" in out
    rc, out = run(capsys, "query", "files from dune:upd_ds", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert [r["id"] for r in rows] == ["upd-a"]


def test_query_ids_keys_and_file(capsys, tmp_path):
    rc, out = run(capsys, "query",
                  "files from dune:urgent_0 ordered limit 3", "-i")
    assert rc == 0 and all(ln.startswith("f") for ln in out.splitlines())
    rc, out = run(capsys, "query",
                  "files from dune:urgent_0 ordered limit 2",
                  "-m", "core.run,core.data_type", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert all("core.run" in r and "core.data_type" in r for r in rows)
    assert all("metadata" not in r for r in rows)
    qf = tmp_path / "q.mql"
    qf.write_text("files from dune:urgent_0 ordered limit 4")
    rc, out = run(capsys, "query", "-q", str(qf), "-j")
    assert rc == 0 and len(out.splitlines()) == 4


def test_corpus_quality_and_pack(capsys):
    rc, out = run(capsys, "corpus", "quality", "-j", "-l", "5")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert {"doc_id", "quality", "n_ngrams", "dup_ngram_frac",
            "top_ngram_frac"} <= set(rows[0])
    rc, out = run(capsys, "corpus", "pack", "--max-tokens", "64",
                  "-j", "-l", "4")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows and all(r["n_tok"] <= 64 for r in rows)


def test_corpus_search_hybrid_dsir(capsys):
    rc, out = run(capsys, "corpus", "search",
                  "--query", "spark window merge", "-k", "5", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0]["score"] >= rows[-1]["score"] > 0
    rc, out = run(capsys, "corpus", "hybrid",
                  "--query", "spark window merge", "--vec", "0",
                  "-k", "5", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert {"doc_id", "kw_rank", "vec_rank", "rrf"} <= set(rows[0])
    # dsir vs itself: all weights exactly 0, selection pure noise
    rc, out = run(capsys, "corpus", "dsir",
                  "--target", f"{SF_DIR}/documents.parquet",
                  "--m", "5", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert all(r["dsir_logw"] == 0.0 for r in rows)
    # missing --query is a loud rc-2 (r11: the registry's require()
    # took over from argparse's required=True when --build-index
    # made the flag optional — the same message now serves HTTP too)
    rc, _ = run(capsys, "corpus", "search")
    assert rc == 2
    # whitespace-only query / absent vec_id: library ValueError →
    # OpError → clean rc 2, not a traceback (review r9)
    rc, _ = run(capsys, "corpus", "search", "--query", "   ")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "hybrid", "--query", "spark",
                "--vec", "99999")
    assert rc == 2


def test_corpus_hybrid_stream(capsys):
    rc, out = run(capsys, "corpus", "hybrid-stream",
                  "--query", "spark window merge", "--vec", "0",
                  "--src", f"{SF_DIR}/documents.parquet",
                  "--vecsrc", f"{SF_DIR}/embeddings.parquet",
                  "-n", "20", "-k", "5", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert {"doc_id", "kw_rank", "vec_rank", "rrf",
            "rank"} <= set(rows[0])
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    # the two uuid-named memory sinks are dropped after the fused
    # result is materialized — a long-running server must not leak
    # one pair of intermediate-leaderboard tables per request
    # (ADVICE r10)
    engine, _ = cli._session(SF_DIR)
    leaked = [t.name for t in engine.spark.catalog.listTables()
              if t.name.startswith("hybrid_stream_")]
    assert leaked == []
    # absent query vector: library ValueError → OpError → clean rc 2
    rc, _ = run(capsys, "corpus", "hybrid-stream", "--query", "spark",
                "--vec", "99999",
                "--src", f"{SF_DIR}/documents.parquet",
                "--vecsrc", f"{SF_DIR}/embeddings.parquet")
    assert rc == 2


def test_corpus_hybrid_stream_sink(capsys, tmp_path, spark):
    """--sink (r12 deploy posture): identical fused result, both
    leaderboard emission histories parquet-appended under
    <sink>/kw and <sink>/vec, no memory sinks created."""
    sink = str(tmp_path / "hs_sink")
    rc, out = run(capsys, "corpus", "hybrid-stream",
                  "--query", "spark window merge", "--vec", "0",
                  "--src", f"{SF_DIR}/documents.parquet",
                  "--vecsrc", f"{SF_DIR}/embeddings.parquet",
                  "-n", "20", "-k", "5", "--sink", sink, "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    rc, out = run(capsys, "corpus", "hybrid-stream",
                  "--query", "spark window merge", "--vec", "0",
                  "--src", f"{SF_DIR}/documents.parquet",
                  "--vecsrc", f"{SF_DIR}/embeddings.parquet",
                  "-n", "20", "-k", "5", "-j")
    assert rc == 0 and [json.loads(ln)
                        for ln in out.splitlines()] == rows
    kw = spark.read.parquet(f"{sink}/kw")
    vec = spark.read.parquet(f"{sink}/vec")
    assert kw.count() > 0 and vec.count() > 0
    assert "seq" in kw.columns and "rank" in kw.columns
    engine, _ = cli._session(SF_DIR)
    assert not [t.name for t in engine.spark.catalog.listTables()
                if t.name.startswith("hybrid_stream_")]
    # reusing the drained --sink with a DIFFERENT query is a clean
    # rc 2, not the previous run's leaderboard relabeled (ADVICE r12)
    rc, _ = run(capsys, "corpus", "hybrid-stream",
                "--query", "window", "--vec", "0",
                "--src", f"{SF_DIR}/documents.parquet",
                "--vecsrc", f"{SF_DIR}/embeddings.parquet",
                "-n", "20", "-k", "5", "--sink", sink)
    assert rc == 2


def test_corpus_diff_self(capsys):
    # a corpus diffed against itself is all 'unchanged'
    rc, out = run(capsys, "corpus", "diff",
                  "--new", f"{SF_DIR}/documents.parquet",
                  "-j", "-l", "10")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 10
    assert all(r["status"] == "unchanged" for r in rows)


def test_corpus_unigram(capsys):
    """Unigram-LM tokenizer over the CLI: vocabulary table, encode
    mode, and loud parameter misuse."""
    rc, out = run(capsys, "corpus", "unigram", "--vocab-size", "300",
                  "--vocab-cap", "1000", "-j", "-l", "500")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert {"piece", "logp"} <= set(rows[0])
    assert all(r["logp"] < 0 for r in rows)
    assert any(len(r["piece"]) > 1 for r in rows)  # learned pieces
    rc, out = run(capsys, "corpus", "unigram", "--vocab-size", "300",
                  "--vocab-cap", "1000", "--encode", "-j", "-l", "5")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert {"doc_id", "pieces", "n_pieces"} <= set(rows[0])
    assert all(r["n_pieces"] == len(r["pieces"]) for r in rows)
    rc, _ = run(capsys, "corpus", "unigram", "--vocab-size", "0")
    assert rc == 2


def test_corpus_train_and_bpe(capsys):
    rc, out = run(capsys, "corpus", "train", "--label", "source",
                  "--pos", "src0", "--steps", "2", "--buckets", "32",
                  "-j", "-l", "40")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert {"f", "weight"} <= set(rows[0])
    assert any(r["f"] == 32 for r in rows)  # bias bucket present
    rc, out = run(capsys, "corpus", "train", "--label", "source",
                  "--pos", "src0", "--steps", "2", "--buckets", "32",
                  "--score", "-j", "-l", "5")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows and all(0 <= r["prob"] <= 1 for r in rows)
    rc, out = run(capsys, "corpus", "bpe", "--merges", "8", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 8
    assert [r["step"] for r in rows] == list(range(1, 9))
    rc, out = run(capsys, "corpus", "bpe", "--merges", "8",
                  "--encode", "-j", "-l", "3")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all(r["n_bpe_tokens"] == len(r["bpe_tokens"])
               for r in rows)


def test_corpus_mixture_and_contamination(capsys):
    rc, out = run(capsys, "corpus", "mixture",
                  "--target", "en=0.6,de=0.2,fr=0.2", "-j", "-l", "3")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all(r["lang"] in ("en", "de", "fr") for r in rows)
    # a corpus checked against itself is fully contaminated
    rc, out = run(capsys, "corpus", "contamination",
                  "--test", f"{SF_DIR}/documents.parquet",
                  "--method", "exact", "-j", "-l", "3")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all(r["test_id"] == r["train_id"] for r in rows)


def test_corpus_ann_index_roundtrip(capsys, tmp_path, spark):
    """Build the IVF index via the CLI, write it, serve from it —
    results must equal inline training exactly (r9)."""
    idx = str(tmp_path / "ivf_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivf",
                "--build-index", "-o", idx)
    assert rc == 0
    stored = spark.read.parquet(idx)
    assert stored.count() == 16 and set(stored.columns) == \
        {"list_id", "centroid"}
    rc, out = run(capsys, "corpus", "ann", "--method", "ivf",
                  "--index", idx, "-k", "3", "-j", "-l", "5000")
    served = sorted(out.splitlines())
    rc, out = run(capsys, "corpus", "ann", "--method", "ivf",
                  "-k", "3", "-j", "-l", "5000")
    inline = sorted(out.splitlines())
    assert served == inline and served
    # same round-trip through the ivfpq artifact (m/n_codes derived
    # from the stored table)
    pq_idx = str(tmp_path / "ivfpq_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", pq_idx)
    assert rc == 0
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--index", pq_idx, "-k", "3", "-j", "-l", "5000")
    pq_served = sorted(out.splitlines())
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "-k", "3", "-j", "-l", "5000")
    assert pq_served == sorted(out.splitlines()) and pq_served
    # a malformed index table is a clean rc-2 OpError, not a traceback
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--index", f"{SF_DIR}/embeddings.parquet")
    assert rc == 2
    # text-only corpora get the billion-scale path end-to-end:
    # hashed doc vectors + ivfpq + stored index (r9)
    hidx = str(tmp_path / "hashed_pq_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--hashed", "--build-index", "-o", hidx)
    assert rc == 0
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--hashed", "--index", hidx, "-k", "3", "-j",
                  "-l", "5000")
    h_served = sorted(out.splitlines())
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--hashed", "-k", "3", "-j", "-l", "5000")
    assert h_served == sorted(out.splitlines()) and h_served


def test_corpus_ann_encode_postings_distortion(capsys, tmp_path,
                                               spark):
    """The r10 index production verbs over the CLI: --encode emits
    postings (the incremental add), --postings serves from them
    (equal to --index serving), --distortion reports the staleness
    gauge; flag misuse is a clean rc 2."""
    idx = str(tmp_path / "pq_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", idx)
    assert rc == 0
    post = str(tmp_path / "postings")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--index", idx, "-o", post)
    assert rc == 0
    stored = spark.read.parquet(post)
    assert set(stored.columns) == {"lst", "id", "codes", "vec"}
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--index", idx, "--postings", post, "-k", "3",
                  "-j", "-l", "5000")
    assert rc == 0
    from_postings = sorted(out.splitlines())
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--index", idx, "-k", "3", "-j", "-l", "5000")
    assert from_postings == sorted(out.splitlines()) and from_postings
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--distortion", "--index", idx, "-j")
    row = json.loads(out.splitlines()[0])
    assert rc == 0 and row["build_distortion"] is not None
    assert row["distortion_ratio"] is not None
    # the incremental ADD: a second --encode batch appended with
    # -o --append GROWS the postings table (plain -o would silently
    # replace it — review r10)
    n_before = stored.count()
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--index", idx, "-o", post, "--append")
    assert rc == 0
    assert spark.read.parquet(post).count() == 2 * n_before
    # verb misuse: wrong method, missing --index, conflicting verbs
    rc, _ = run(capsys, "corpus", "ann", "--method", "gemm",
                "--encode")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--distortion")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--postings", post)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "--encode", "--index", idx)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--distortion", "--index", idx)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "--index", idx)
    assert rc == 2


def test_corpus_ann_codes_only_and_rerank(capsys, tmp_path, spark):
    """--encode --codes-only stores postings without member vectors
    (the storage-optimal posture); serving them needs --rerank 0 —
    with the default rerank the in-task ValueError is translated to
    a CLEAN rc-2 error at the execution boundary, not a Py4J
    traceback (ADVICE r10)."""
    idx = str(tmp_path / "co_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", idx)
    assert rc == 0
    post = str(tmp_path / "co_postings")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--codes-only", "--index", idx,
                "-o", post)
    assert rc == 0
    stored = spark.read.parquet(post)
    assert stored.where("vec is not null").count() == 0
    assert stored.count() > 0
    # default rerank=1 over codes-only postings: clean rc 2, with
    # the library's message (not a remote traceback) on stderr
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--index", idx, "--postings", post, "-k", "3", "-j")
    assert rc == 2
    # --rerank 0 serves pure-ADC scores from the same table
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--index", idx, "--postings", post, "-k", "3",
                  "--rerank", "0", "-j", "-l", "50")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert {"id", "neighbor_id", "cosine", "rank"} <= set(rows[0])


def test_corpus_ann_retire_compact(capsys, tmp_path, spark):
    """Index-lifecycle CRUD over the CLI (VERDICT r10 #5): --retire
    appends tombstones, served results exclude them, --compact
    rewrites the table physically; verb misuse is a clean rc 2."""
    idx = str(tmp_path / "rc_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", idx)
    assert rc == 0
    post = str(tmp_path / "rc_postings")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--index", idx, "-o", post)
    assert rc == 0
    n0 = spark.read.parquet(post).count()
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", "0,1,2", "--postings", post,
                "-o", post, "--append")
    assert rc == 0
    assert spark.read.parquet(post).where("codes is null").count() == 3
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--index", idx, "--postings", post, "-k", "3",
                  "-j", "-l", "5000")
    assert rc == 0
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rows and not ({r["neighbor_id"] for r in rows} & {0, 1, 2})
    compacted = str(tmp_path / "rc_compacted")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--compact", "--postings", post, "-o", compacted)
    assert rc == 0
    got = spark.read.parquet(compacted)
    assert got.count() == n0 - 3
    assert got.where("codes is null").count() == 0
    rc, out2 = run(capsys, "corpus", "ann", "--method", "ivfpq",
                   "--index", idx, "--postings", compacted, "-k",
                   "3", "-j", "-l", "5000")
    assert rc == 0 and sorted(out2.splitlines()) == \
        sorted(out.splitlines())
    # misuse: retire/compact need --postings; conflicts and wrong
    # methods are loud
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", "1")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--compact")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", "1", "--encode", "--postings", post)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", "1", "--compact", "--postings", post)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "gemm",
                "--retire", "1", "--postings", post)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", " , ", "--postings", post)
    assert rc == 2
    # a non-numeric id against a numeric-id postings table is a
    # clean OpError, not a PySparkTypeError traceback (review r11)
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", "abc", "--postings", post)
    assert rc == 2
    # verb-scoped options are loud without their verb (review r11)
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "--codes-only")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", "1", "--min-ratio", "0.5",
                "--postings", post)
    assert rc == 2


def test_corpus_ann_ingest_stream(capsys, tmp_path, spark):
    """Streaming postings ingest over the CLI: --ingest stream-
    encodes an embeddings dir against the stored index, appends
    postings to --postings, and prints the per-micro-batch
    distortion gauge; serving from the streamed postings equals the
    inline index serve. Misuse is loud."""
    from tests.conftest import SF_DIR
    idx = str(tmp_path / "ing_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", idx)
    assert rc == 0
    src = str(tmp_path / "ing_src")
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .repartition(3).write.parquet(src)
    dest = str(tmp_path / "ing_postings")
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--ingest", src, "--index", idx,
                  "--postings", dest, "-j")
    assert rc == 0
    gauge = [json.loads(ln) for ln in out.splitlines()]
    assert gauge and all(r["distortion_ratio"] is not None
                         for r in gauge)
    n_embs = spark.read.parquet(
        f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n"] for r in gauge) == n_embs
    assert spark.read.parquet(dest).count() == n_embs
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--index", idx, "--postings", dest, "-k", "3",
                  "-j", "-l", "5000")
    assert rc == 0
    rc, out2 = run(capsys, "corpus", "ann", "--method", "ivfpq",
                   "--index", idx, "-k", "3", "-j", "-l", "5000")
    assert sorted(out.splitlines()) == sorted(out2.splitlines())
    # misuse: missing operands, wrong companions, orphan --timeout
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--ingest", src)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--ingest", src, "--index", idx, "--postings", dest,
                "--hashed")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--timeout", "60", "-k", "3")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--ingest", src, "--encode", "--index", idx,
                "--postings", dest)
    assert rc == 2
    # r14 tombstone guard: retire an ingested id, drop its row back
    # into the SAME streamed source (the checkpoint binds --ingest
    # to one source dir; new files there are the incremental feed) —
    # the resumed ingest refuses with a clean rc 2 (the library
    # ValueError points at --upsert), destination unchanged
    some = spark.read.parquet(dest).select("id").first()["id"]
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", str(some), "--postings", dest,
                "-o", dest, "--append")
    assert rc == 0
    n_before = spark.read.parquet(dest).count()
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .where(F.col("vec_id") == some) \
        .write.mode("append").parquet(src)
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--ingest", src, "--index", idx,
                "--postings", dest)
    assert rc == 2
    assert spark.read.parquet(dest).count() == n_before


def test_op_error_from_task_translation():
    """Known in-task ValueErrors (wrapped by Spark in an opaque
    PythonException at execution time) map back to OpError; unknown
    exceptions pass through as None."""
    from metacat_spark.llm.registry import OpError, op_error_from_task
    wrapped = RuntimeError(
        "An exception was thrown from the Python worker...\n"
        "Traceback (most recent call last):\n  ...\n"
        "ValueError: rerank=True but a postings row has no stored "
        "member vector — re-encode with keep_vectors=True or pass "
        "rerank=False\n\tat org.apache.spark...")
    err = op_error_from_task(wrapped)
    assert isinstance(err, OpError) and err.status == 400
    assert "rerank=True" in str(err) and "Traceback" not in str(err)
    assert op_error_from_task(RuntimeError("boom")) is None


def test_corpus_output_parquet(capsys, tmp_path, spark):
    dest = str(tmp_path / "packed")
    rc, _ = run(capsys, "corpus", "pack", "-o", dest)
    assert rc == 0
    packed = spark.read.parquet(dest)
    assert packed.count() > 0
    assert set(packed.columns) == {"doc_id", "chunk", "n_tok",
                                   "pack_id"}


def test_corpus_split_and_scrub(capsys):
    rc, out = run(capsys, "corpus", "split", "-j", "-l", "6")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 6
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    rc, out = run(capsys, "corpus", "dedup", "--method", "substring",
                  "-j", "-l", "3")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all(r["span_end"] - r["span_start"] == r["span_tokens"]
               for r in rows)
    rc, out = run(capsys, "corpus", "scrub", "-j", "-l", "3")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all(r["n_tok_after"] <= r["n_tok_before"] for r in rows)


def test_corpus_gate_and_c4(capsys):
    rc, out = run(capsys, "corpus", "gate", "-j", "-l", "4")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 4
    assert all("gopher_pass" in r for r in rows)
    rc, out = run(capsys, "corpus", "c4", "-j", "-l", "4")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all(r["n_lines_after"] <= r["n_lines_before"]
               for r in rows)


def test_corpus_ann_hashed(capsys):
    rc, out = run(capsys, "corpus", "ann", "--method", "gemm",
                  "--hashed", "-k", "2", "-j", "-l", "4")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 4
    assert all(r["rank"] <= 2 and "neighbor_id" in r for r in rows)


def test_corpus_curate(capsys):
    rc, out = run(capsys, "corpus", "curate", "--v2", "-j", "-l", "3")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all(r["n_tok_after"] > 0 for r in rows)
    rc, out = run(capsys, "corpus", "curate", "-j", "-l", "3")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows and all("quality" in r for r in rows)


def test_corpus_publish_and_verify(capsys, tmp_path):
    dest = str(tmp_path / "pub")
    rc, out = run(capsys, "corpus", "publish", "--dest", dest,
                  "--shards", "3")
    man = json.loads(out.strip())
    assert rc == 0 and man["rows"] > 0 and len(man["shards"]) <= 3
    rc, out = run(capsys, "corpus", "verify-manifest",
                  "--dest", dest)
    assert rc == 0 and json.loads(out.strip())["ok"] is True
    wdest = str(tmp_path / "wds")
    rc, _ = run(capsys, "corpus", "publish", "--dest", wdest,
                "--format", "webdataset", "--shards", "2")
    import glob
    assert rc == 0 and len(glob.glob(f"{wdest}/*.tar")) == 2


def test_corpus_input_jsonl(capsys, tmp_path, spark):
    src = str(tmp_path / "docs.jsonl")
    with open(src, "w") as f:
        f.write('{"doc_id": 1, "text": "alpha beta gamma delta"}\n')
        f.write('{"doc_id": 2, "text": "epsilon zeta eta theta"}\n')
    rc, out = run(capsys, "corpus", "stats", "--input", src, "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows[0]["n_docs"] == 2
    assert rows[0]["n_tokens"] == 8


def test_corpus_curate_ledger(capsys):
    rc, out = run(capsys, "corpus", "curate", "--ledger",
                  "-j", "-l", "5")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert all(r["fate"] in ("kept", "dropped_gate",
                             "dropped_exact_dup", "scrubbed_empty",
                             "dropped_near_dup") for r in rows)


def test_events_group(capsys):
    rc, out = run(capsys, "events", "funnel", "--counts",
                  "--horizon", "86400", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 3
    assert rows[0]["n_users"] >= rows[1]["n_users"] >= rows[2]["n_users"]
    rc, out = run(capsys, "events", "retention", "-j", "-l", "4")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows and all("week_offset" in r for r in rows)
    rc, out = run(capsys, "events", "sessionize", "-j", "-l", "3")
    assert rc == 0 and len(out.splitlines()) == 3
    rc, out = run(capsys, "events", "anomalies", "-j", "-l", "5")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows and all("z_score" in r for r in rows)
    rc, out = run(capsys, "events", "paths", "-j", "-l", "5")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all(r["path"].count(">") == 2 for r in rows)
    rc, out = run(capsys, "events", "attribution", "--model",
                  "linear", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert all({"touch_type", "n_conversions", "credit"}
               <= set(r) for r in rows)


def test_admin_init_and_tables(capsys):
    """`admin init` builds the bucketed warehouse; `admin tables`
    lists the mcw_* tables with row counts (reference parity:
    metacat_admin.py schema init — docs/DIVERGENCES.md §10 maps the
    schema half onto materialize_tables)."""
    rc, out = run(capsys, "admin", "init")
    assert rc == 0
    names = {ln.split("\t")[0] for ln in out.strip().splitlines()}
    assert any(n.startswith("mcw_files") for n in names)
    assert any(n.startswith("mcw_fd") for n in names)
    rc, out = run(capsys, "admin", "tables")
    assert rc == 0
    rows = dict(ln.split("\t") for ln in out.strip().splitlines())
    assert all(int(v) > 0 for v in rows.values())


def test_corpus_dedup_simhash(capsys):
    """CLI simhash dedup surfaces the banded Hamming pairs (band
    count derived from --max-hamming)."""
    rc, out = run(capsys, "corpus", "dedup", "--method", "simhash",
                  "--max-hamming", "6", "--limit", "5")
    assert rc == 0


def test_corpus_input_orc(capsys, tmp_path, spark):
    """load_corpus sniffs .orc — Spark's built-in ORC reader, no
    extra packages."""
    src = str(tmp_path / "docs.orc")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string").coalesce(1).write.orc(src)
    rc, out = run(capsys, "corpus", "stats", "--input", src, "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows[0]["n_docs"] == 2
    assert rows[0]["n_tokens"] == 8


def test_dataset_create_with_requirements(capsys):
    """`dataset create --requirements` wires per-dataset file
    metadata requirements (reference webapi create_dataset
    metadata_requirements); a non-satisfying file is rejected at
    add time."""
    rc, _ = run(capsys, "dataset", "create", "test:reqcli_r6",
                "--requirements",
                '{"core.run": {"type": "int", "required": true}}')
    assert rc == 0
    rc, _ = run(capsys, "file", "declare",
                "test:reqfile_r6.dat", "--id", "reqfile-r6",
                "--meta", '{"core.run": 5}')
    assert rc == 0
    rc, out = run(capsys, "dataset", "add-files", "test:reqcli_r6",
                  "--ids", "reqfile-r6")
    assert rc == 0


def test_print_limit_zero(capsys):
    """-l 0 prints zero rows (the CLI twin of the server's limit=0
    emptiness probe — review r6 printed one)."""
    rc, out = run(capsys, "query", "files from dune:urgent_0",
                  "-l", "0")
    assert rc == 0
    assert out.strip() == ""


def test_corpus_ann_hashed_without_embeddings(capsys, tmp_path, spark):
    """`corpus ann --hashed` must work with NO embeddings table, as
    its help promises (review r6: the eager default-table read failed
    first)."""
    import os
    import shutil
    sf = tmp_path / "sfdocs"
    sf.mkdir()
    src = f"{SF_DIR}/documents.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, sf / "documents.parquet")
    else:
        shutil.copy(src, sf / "documents.parquet")
    rc = cli.main(["corpus", "ann", "--hashed", "-k", "2",
                   "--limit", "3", "--sf-dir", str(sf)])
    out = capsys.readouterr().out
    assert rc == 0 and out.strip()


def test_registry_op_sets_match_across_surfaces():
    """CLI and HTTP must expose the SAME analytic op sets — both
    dispatch through llm.registry, and this pins the argparse
    subcommand lists to the registry keys so a new op (or a rename)
    on one surface without the other is a test failure, not drift
    (VERDICT r6 #3). publish/verify-manifest are CLI-only filesystem
    actions, deliberately outside the registry (a GET endpoint that
    writes server-side files would be a mutating GET)."""
    import argparse

    from metacat_spark.llm.registry import CORPUS_OPS, EVENT_OPS

    p = cli.build_parser()
    top = next(a for a in p._actions
               if isinstance(a, argparse._SubParsersAction))

    def subcommands(group):
        gp = top.choices[group]
        sub = next(a for a in gp._actions
                   if isinstance(a, argparse._SubParsersAction))
        return set(sub.choices)

    assert subcommands("corpus") == (
        set(CORPUS_OPS) | {"publish", "verify-manifest"})
    assert subcommands("events") == set(EVENT_OPS)
    # the server dispatches by `op in CORPUS_OPS` / `op in EVENT_OPS`
    # directly — no server-side op list exists to drift; pin that the
    # handler source references the registry tables, not literals
    import inspect

    import metacat_spark.server as srv
    src = inspect.getsource(srv)
    assert "CORPUS_OPS" in src and "EVENT_OPS" in src


def test_registry_param_defaults_match_across_surfaces():
    """Shared-op parameter DEFAULTS must not drift between the CLI
    and HTTP surfaces (review r7: decontaminate ran containment@0.8
    from the CLI but exact@0.5 over HTTP — op-NAME parity alone
    missed it). HTTP always gets the registry defaults; the CLI gets
    whatever argparse injects through _registry_params, which WINS
    over the registry default. So for every parameter a builder
    reads with a default, the argparse default for that dest must be
    None (registry default applies) or literally equal."""
    import argparse
    import inspect
    import re

    from metacat_spark.llm.registry import CORPUS_OPS, EVENT_OPS

    get_re = re.compile(
        r"ctx\.(?:int_param|float_param|param)\(\s*\"(\w+)\",\s*"
        r"([0-9.eE+-]+|\"[^\"]*\"|'[^']*')\s*\)")
    choice_re = re.compile(
        r"ctx\.choice\(\s*\"(\w+)\",\s*\([^)]*\)\s*,\s*"
        r"(\"[^\"]*\"|'[^']*')\s*\)", re.S)

    def registry_defaults(fn):
        src = inspect.getsource(fn)
        out = {}
        for name, d in (get_re.findall(src)
                        + choice_re.findall(src)):
            out[name] = eval(d)  # noqa: S307 — literals from source
        return out

    p = cli.build_parser()
    top = next(a for a in p._actions
               if isinstance(a, argparse._SubParsersAction))

    def sub(group, op):
        gp = top.choices[group]
        s = next(a for a in gp._actions
                 if isinstance(a, argparse._SubParsersAction))
        return s.choices.get(op)

    rename = {"gap": "gap_minutes", "test": "against"}
    checked = 0
    for group, ops in (("corpus", CORPUS_OPS), ("events", EVENT_OPS)):
        for op, fn in ops.items():
            sp = sub(group, op)
            if sp is None:
                continue
            argdef = {a.dest: a.default for a in sp._actions}
            for name, rdef in registry_defaults(fn).items():
                dest = rename.get(name, name)
                if dest not in argdef:
                    continue
                checked += 1
                assert argdef[dest] is None or argdef[dest] == rdef, (
                    f"{group}/{op} --{dest}: argparse default "
                    f"{argdef[dest]!r} != registry default {rdef!r}")
    # vacuous-test guard: the regexes must actually extract defaults
    # (a registry refactor that breaks the introspection should fail
    # loudly, not silently check nothing)
    assert checked >= 15, f"only {checked} defaults introspected"


def test_corpus_wordpiece(capsys):
    """WordPiece over the CLI: vocabulary table (alphabet + merge
    rows), encode mode, and loud parameter misuse."""
    rc, out = run(capsys, "corpus", "wordpiece", "--vocab-size",
                  "300", "--vocab-cap", "1000", "-j", "-l", "500")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and rows
    assert {"step", "piece", "score"} <= set(rows[0])
    assert any(r["step"] == 0 for r in rows)       # alphabet rows
    assert any(r["step"] > 0 for r in rows)        # learned merges
    assert any(r["piece"].startswith("##") for r in rows)
    rc, out = run(capsys, "corpus", "wordpiece", "--vocab-size",
                  "300", "--vocab-cap", "1000", "--encode", "-j",
                  "-l", "5")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert {"doc_id", "pieces", "n_pieces"} <= set(rows[0])
    assert all(r["n_pieces"] == len(r["pieces"]) for r in rows)
    rc, _ = run(capsys, "corpus", "wordpiece", "--vocab-size", "0")
    assert rc == 2


def test_corpus_ann_opq(capsys, tmp_path, spark):
    """--opq N trains the OPQ rotation into the artifact (kind=
    'rotation' rows, one per dim) and every served verb reads it
    back transparently; --opq outside --build-index is a loud rc-2
    misuse, not a silent no-op (r11)."""
    idx = str(tmp_path / "opq_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "--opq", "3", "-o", idx)
    assert rc == 0
    stored = spark.read.parquet(idx)
    dim = len(stored.where("kind = 'centroid'")
              .first()["vector"])
    assert stored.where("kind = 'rotation'").count() == dim
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--index", idx, "-k", "3", "-j", "-l", "5000")
    assert rc == 0 and out.splitlines()
    # staleness gauge over the rotated artifact
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--distortion", "--index", idx, "-j")
    row = json.loads(out.splitlines()[0])
    assert rc == 0 and row["distortion_ratio"] is not None
    # loud misuse: --opq without --build-index
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--opq", "3", "--index", idx)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "--opq", "-1")
    assert rc == 2


def test_corpus_ann_recall(capsys, tmp_path):
    """--recall wraps any search with the recall gauge (one row);
    gemm-vs-itself is exactly 1.0; loud misuse on non-search verbs."""
    rc, out = run(capsys, "corpus", "ann", "--method", "gemm",
                  "--recall", "-k", "3", "-j")
    row = json.loads(out.splitlines()[0])
    assert rc == 0 and row["recall"] == 1.0
    assert row["n_queries"] > 0 and row["n_hits"] == row["n_pairs"]
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--recall", "-k", "3", "-j")
    row = json.loads(out.splitlines()[0])
    assert rc == 0 and 0.0 < row["recall"] <= 1.0
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--recall", "--build-index")
    assert rc == 2


def test_corpus_ann_health(capsys, tmp_path, spark):
    """--health: one-row rebuild-decision gauge over a stored index
    + postings; loud misuse without the artifacts / on non-ivfpq /
    with --recall."""
    idx = str(tmp_path / "h_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", idx)
    assert rc == 0
    posts = str(tmp_path / "h_posts")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--index", idx, "-o", posts)
    assert rc == 0
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--health", "--index", idx, "--postings", posts,
                  "-j")
    row = json.loads(out.splitlines()[0])
    assert rc == 0
    assert row["recommendation"] in ("ok", "rebalance")
    assert row["n_dead"] == 0 and row["distortion_ratio"] is not None
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--health", "--index", idx)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "gemm",
                "--health")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--health", "--index", idx, "--postings", posts,
                "--recall")
    assert rc == 2


def test_corpus_ann_recall_served_mode(capsys, tmp_path, spark):
    """--recall on a --postings serve grades against the STORED
    postings corpus, not the input frame (ADVICE r11), and is a
    loud rc-2 on codes-only postings (no exact ground truth)."""
    idx = str(tmp_path / "srv_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", idx)
    assert rc == 0
    posts = str(tmp_path / "srv_posts")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--index", idx, "-o", posts)
    assert rc == 0
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--postings", posts, "--index", idx,
                  "--recall", "-k", "3", "-j")
    row = json.loads(out.splitlines()[0])
    assert rc == 0 and 0.0 < row["recall"] <= 1.0
    cposts = str(tmp_path / "srv_posts_codes")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--codes-only", "--index", idx,
                "-o", cposts)
    assert rc == 0
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--postings", cposts, "--index", idx, "--rerank",
                "0", "--recall", "-k", "3", "-j")
    assert rc == 2


def test_corpus_search_index_verbs(capsys, tmp_path):
    """Keyword-search index lifecycle over the CLI: build, serve
    (== corpus-scan search), extend; loud verb conflicts."""
    idx = str(tmp_path / "kw_idx")
    rc, _ = run(capsys, "corpus", "search", "--build-index",
                "-o", idx)
    assert rc == 0
    rc, out = run(capsys, "corpus", "search", "--index", idx,
                  "--query", "spark window merge", "-k", "5", "-j")
    served = out.splitlines()
    rc, out = run(capsys, "corpus", "search", "--query",
                  "spark window merge", "-k", "5", "-j")
    assert rc == 0 and served == out.splitlines() and served
    ext = str(tmp_path / "kw_idx2")
    rc, _ = run(capsys, "corpus", "search", "--extend", "--index",
                idx, "-o", ext)
    assert rc == 0
    # upsert of the full corpus over itself == fresh build; the
    # integrity gauge reads consistent on it (r12)
    ups = str(tmp_path / "kw_idx3")
    rc, _ = run(capsys, "corpus", "search", "--upsert", "--index",
                idx, "-o", ups)
    assert rc == 0
    rc, out = run(capsys, "corpus", "search", "--index", ups,
                  "--query", "spark window merge", "-k", "5", "-j")
    assert rc == 0 and out.splitlines() == served
    rc, out = run(capsys, "corpus", "search", "--verify-index",
                  "--index", ups, "-j")
    row = json.loads(out.splitlines()[0])
    assert rc == 0 and row["consistent"] is True
    assert row["n_parts"] == 1 and row["compact_recommended"] is False
    # --max-parts tunes the compact recommendation (r13) and is loud
    # without its verb
    rc, out = run(capsys, "corpus", "search", "--verify-index",
                  "--index", ups, "--max-parts", "0", "-j")
    assert rc == 0
    assert json.loads(out.splitlines()[0])["compact_recommended"] \
        is True
    rc, _ = run(capsys, "corpus", "search", "--index", ups,
                "--query", "spark", "--max-parts", "4")
    assert rc == 2
    # ...including under --ingest (review r13: the guard originally
    # sat after the ingest branch and the flag silently dropped)
    rc, _ = run(capsys, "corpus", "search", "--ingest",
                f"{SF_DIR}/documents.parquet", "--index",
                str(tmp_path / "mp_idx"), "--max-parts", "4")
    assert rc == 2
    # ... and flags the double-extended artifact as inconsistent
    dbl = str(tmp_path / "kw_idx_dbl")
    rc, _ = run(capsys, "corpus", "search", "--extend", "--index",
                ups, "-o", dbl)
    assert rc == 0
    rc, out = run(capsys, "corpus", "search", "--verify-index",
                  "--index", dbl, "-j")
    row = json.loads(out.splitlines()[0])
    assert rc == 0 and row["consistent"] is False
    # batched serving (r12): one plan, rows equal the per-query
    # serve for the matching query id
    rc, out = run(capsys, "corpus", "search", "--index", ups,
                  "--queries", "a:spark window merge;b:the data",
                  "-k", "5", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and {r["query_id"] for r in rows} == {"a", "b"}
    a_rows = [json.dumps({k: v for k, v in r.items()
                          if k != "query_id"}, sort_keys=True)
              for r in sorted(rows, key=lambda r: r["rank"])
              if r["query_id"] == "a"]
    single = [json.dumps(json.loads(ln), sort_keys=True)
              for ln in run(capsys, "corpus", "search", "--index",
                            ups, "--query", "spark window merge",
                            "-k", "5", "-j")[1].splitlines()]
    assert a_rows == single
    # --queries misuse is loud: no index / with --query / bad item
    rc, _ = run(capsys, "corpus", "search", "--queries", "a:spark")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search", "--index", ups,
                "--queries", "a:spark", "--query", "spark")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search", "--index", ups,
                "--queries", "nocolon")
    assert rc == 2
    # r12 append-only lifecycle: --ingest streams fragments into the
    # index dir (append-is-extend), --compact-index folds them;
    # serving is identical at every step
    sidx = str(tmp_path / "kw_idx_stream")
    rc, out = run(capsys, "corpus", "search", "--ingest",
                  f"{SF_DIR}/documents.parquet", "--index", sidx,
                  "-j")
    grows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and grows and all("n_docs" in g for g in grows)
    rc, out = run(capsys, "corpus", "search", "--index", sidx,
                  "--query", "spark window merge", "-k", "5", "-j")
    assert rc == 0 and out.splitlines() == served
    cidx = str(tmp_path / "kw_idx_compacted")
    rc, _ = run(capsys, "corpus", "search", "--compact-index",
                "--index", sidx, "-o", cidx)
    assert rc == 0
    rc, out = run(capsys, "corpus", "search", "--index", cidx,
                  "--query", "spark window merge", "-k", "5", "-j")
    assert rc == 0 and out.splitlines() == served
    rc, _ = run(capsys, "corpus", "search", "--ingest",
                f"{SF_DIR}/documents.parquet")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search", "--compact-index",
                "--verify-index", "--index", cidx)
    assert rc == 2
    # verb misuse is loud
    rc, _ = run(capsys, "corpus", "search", "--build-index",
                "--index", idx)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search", "--build-index",
                "--query", "spark")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search", "--extend")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search", "--extend", "--upsert",
                "--index", idx)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search", "--verify-index",
                "--index", idx, "--query", "spark")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search")
    assert rc == 2
    # --timeout only bounds the --ingest drain — silently ignoring
    # it elsewhere violates the loud-flag contract (ADVICE r12)
    rc, _ = run(capsys, "corpus", "search", "--index", cidx,
                "--query", "spark", "--timeout", "60")
    assert rc == 2


def test_corpus_hybrid_served(capsys, tmp_path):
    """Served hybrid over the CLI: all three artifacts given,
    results equal the scan-mode hybrid when the vector side is
    exhaustive; a partial artifact set is a loud rc-2."""
    kw = str(tmp_path / "h_kw")
    vi = str(tmp_path / "h_vi")
    po = str(tmp_path / "h_po")
    rc, _ = run(capsys, "corpus", "search", "--build-index", "-o", kw)
    assert rc == 0
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", vi)
    assert rc == 0
    # postings must exclude the query vector's own row (vec 0):
    # encode from a filtered input via --input is not available for
    # embeddings, so accept the query doc ranking first instead and
    # compare the KEYWORD side + row shape only
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--index", vi, "-o", po)
    assert rc == 0
    rc, out = run(capsys, "corpus", "hybrid", "--query",
                  "spark window merge", "--vec", "0", "--kwindex",
                  kw, "--postings", po, "--vec-index", vi,
                  "--n-probe", "16", "-n", "20", "-k", "5", "-j")
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert rc == 0 and len(rows) == 5
    assert all({"doc_id", "kw_rank", "vec_rank", "rrf", "rank"}
               <= set(r) for r in rows)
    # the query's own vector IS in the postings -> doc 0 tops the
    # vector list
    assert any(r["doc_id"] == 0 and r["vec_rank"] == 1
               for r in rows)
    rc, _ = run(capsys, "corpus", "hybrid", "--query", "spark",
                "--vec", "0", "--kwindex", kw)
    assert rc == 2


def test_corpus_search_shrink_verb(capsys, tmp_path, spark):
    """--shrink exact-deletes the served corpus from a stored index:
    shrinking everything leaves zero postings and n=0 stats; verb
    conflicts are loud."""
    idx = str(tmp_path / "sh_idx")
    out = str(tmp_path / "sh_out")
    rc, _ = run(capsys, "corpus", "search", "--build-index",
                "-o", idx)
    assert rc == 0
    rc, _ = run(capsys, "corpus", "search", "--shrink", "--index",
                idx, "-o", out)
    assert rc == 0
    shrunk = spark.read.parquet(out)
    assert shrunk.where("kind = 'post'").count() == 0
    assert shrunk.where("kind = 'stat' and term = 'n'") \
        .first()["tf"] == 0.0
    rc, _ = run(capsys, "corpus", "search", "--extend", "--shrink",
                "--index", idx)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "search", "--shrink")
    assert rc == 2


def test_corpus_ann_upsert(capsys, tmp_path, spark):
    """Vector-side REPLACE-or-ADD over the CLI (r13): --upsert drops
    every stored row of the input ids — stale tombstones included —
    and appends the freshly encoded batch, so retire-then-upsert
    re-adds cleanly; misuse is a clean rc 2."""
    idx = str(tmp_path / "up_idx")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--build-index", "-o", idx)
    assert rc == 0
    post = str(tmp_path / "up_postings")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--encode", "--index", idx, "-o", post)
    assert rc == 0
    n0 = spark.read.parquet(post).count()
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--retire", "0,1,2", "--postings", post,
                "-o", post, "--append")
    assert rc == 0
    # upsert the whole embeddings table back: tombstones leave with
    # the replaced rows, every id serves again
    upped = str(tmp_path / "up_rewritten")
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--upsert", "--index", idx, "--postings", post,
                "-o", upped)
    assert rc == 0
    got = spark.read.parquet(upped)
    assert got.count() == n0
    assert got.where("codes is null").count() == 0
    rc, out = run(capsys, "corpus", "ann", "--method", "ivfpq",
                  "--index", idx, "--postings", upped, "-k", "3",
                  "-j", "-l", "5000")
    assert rc == 0
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert {0, 1, 2} <= {r["neighbor_id"] for r in rows}
    # misuse: needs both artifacts; conflicts and wrong methods loud
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--upsert", "--postings", post)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--upsert", "--index", idx)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--upsert", "--retire", "1", "--index", idx,
                "--postings", post)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "gemm",
                "--upsert")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "ann", "--method", "ivfpq",
                "--upsert", "--index", idx, "--postings", post,
                "--recall")
    assert rc == 2


def test_corpus_cluster_sample(capsys, tmp_path, spark):
    """Semantic-diversity selection over the CLI (r13): per-cluster
    caps hold, a stored centroid artifact serves assignment, --by
    reorders, --hashed works without an embeddings table, and
    misuse is a clean rc 2."""
    rc, out = run(capsys, "corpus", "cluster-sample",
                  "--per-cluster", "5", "--clusters", "4",
                  "-j", "-l", "5000")
    assert rc == 0
    rows = [json.loads(ln) for ln in out.splitlines()]
    per = {}
    for r in rows:
        per.setdefault(r["cluster_id"], []).append(r["rank"])
    assert per and all(
        sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 5
        for v in per.values())
    # stored artifact serves (train once with ann --build-index on
    # method ivf? centroids come from the dedicated builder — build
    # via the library, then serve over the CLI)
    from metacat_spark.llm.similarity import build_ivf_centroids
    idx = str(tmp_path / "cbs_idx")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    build_ivf_centroids(embs, n_lists=4,
                        train_iters=1).write.parquet(idx)
    rc, out2 = run(capsys, "corpus", "cluster-sample",
                   "--per-cluster", "5", "--index", idx,
                   "-j", "-l", "5000")
    assert rc == 0 and out2.splitlines()
    # --by: rank 1 holds the max label per cluster
    rc, out3 = run(capsys, "corpus", "cluster-sample",
                   "--per-cluster", "3", "--index", idx,
                   "--by", "label", "-j", "-l", "5000")
    assert rc == 0
    r3 = [json.loads(ln) for ln in out3.splitlines()]
    tops = {r["cluster_id"]: r["label"] for r in r3
            if r["rank"] == 1}
    for r in r3:
        assert r["label"] <= tops[r["cluster_id"]]
    # --hashed vectorizes the documents table
    rc, out4 = run(capsys, "corpus", "cluster-sample", "--hashed",
                   "--per-cluster", "2", "--clusters", "2", "-j",
                   "-l", "50")
    assert rc == 0 and out4.splitlines()
    # misuse: --clusters with a stored artifact; per-cluster < 1
    rc, _ = run(capsys, "corpus", "cluster-sample", "--index", idx,
                "--clusters", "8")
    assert rc == 2
    rc, _ = run(capsys, "corpus", "cluster-sample",
                "--per-cluster", "0")
    assert rc == 2


def test_corpus_cluster_sample_lifecycle(capsys, tmp_path, spark):
    """r14 lifecycle verbs: --stats gauges a stored artifact,
    --ingest streams assignment to a sink, and every loud-flag
    contract is a clean rc 2."""
    from metacat_spark.llm.similarity import build_ivf_centroids
    idx = str(tmp_path / "csl_idx")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    build_ivf_centroids(embs, n_lists=4,
                        train_iters=1).write.parquet(idx)
    rc, out = run(capsys, "corpus", "cluster-sample", "--stats",
                  "--index", idx, "-j")
    assert rc == 0
    row = json.loads(out.splitlines()[0])
    assert row["n_clusters"] == 4
    assert row["n_assigned"] == embs.count()
    assert row["recommendation"] in ("ok", "retrain", "rebalance")
    # sub-1 threshold forces the rebalance branch when nothing empty
    if row["n_empty"] == 0:
        rc, out2 = run(capsys, "corpus", "cluster-sample", "--stats",
                       "--index", idx, "--balance-threshold",
                       "0.999", "-j")
        assert rc == 0
        assert json.loads(
            out2.splitlines()[0])["recommendation"] == "rebalance"
    # --ingest: streamed assignment lands in the sink, gauge prints
    src = str(tmp_path / "csl_src")
    embs.write.parquet(src)
    sink = str(tmp_path / "csl_sink")
    rc, out3 = run(capsys, "corpus", "cluster-sample", "--ingest",
                   src, "--index", idx, "--sink", sink, "-j")
    assert rc == 0
    gauge = [json.loads(ln) for ln in out3.splitlines()]
    assert sum(g["n"] for g in gauge) == embs.count()
    assert all(g["n_dropped"] == 0 for g in gauge)
    filed = spark.read.parquet(sink)
    assert filed.count() == embs.count()
    assert "cluster_id" in filed.columns
    # loud-flag contracts
    rc, _ = run(capsys, "corpus", "cluster-sample", "--stats")
    assert rc == 2                     # gauge needs --index
    rc, _ = run(capsys, "corpus", "cluster-sample", "--stats",
                "--index", idx, "--ingest", src, "--sink", sink)
    assert rc == 2                     # conflicting verbs
    rc, _ = run(capsys, "corpus", "cluster-sample", "--stats",
                "--index", idx, "--per-cluster", "5")
    assert rc == 2                     # sampling option on a gauge
    rc, _ = run(capsys, "corpus", "cluster-sample",
                "--balance-threshold", "2.0")
    assert rc == 2                     # --balance-threshold needs --stats
    rc, _ = run(capsys, "corpus", "cluster-sample", "--ingest", src,
                "--index", idx)
    assert rc == 2                     # ingest needs --sink
    rc, _ = run(capsys, "corpus", "cluster-sample", "--sink", sink)
    assert rc == 2                     # --sink needs --ingest
    rc, _ = run(capsys, "corpus", "cluster-sample", "--timeout",
                "60")
    assert rc == 2                     # --timeout needs --ingest
    rc, _ = run(capsys, "corpus", "cluster-sample", "--ingest", src,
                "--index", idx, "--sink", str(tmp_path / "s2"),
                "--hashed")
    assert rc == 2                     # --hashed streams nothing


def test_corpus_decode_coverage(capsys, tmp_path, spark):
    """r14 codec-coverage gauge over the CLI: the synthesized
    fixture reads all-fallback 'other'; a real asset table via
    --input reads per-container real rates."""
    rc, out = run(capsys, "corpus", "decode-coverage", "-j")
    assert rc == 0
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert [r["container"] for r in rows] == ["other"]
    assert rows[0]["n_real"] == 0 and rows[0]["real_rate"] == 0.0
    # a real mixed asset table: one decodable BMP + junk
    from tests.test_llm_ops import _bmp_bytes
    assets = spark.createDataFrame(
        [(1, bytearray(_bmp_bytes(2, 2, [[(1, 2, 3)] * 2] * 2))),
         (2, bytearray(b"junk"))],
        "asset_id long, content binary")
    src = str(tmp_path / "dc_assets")
    assets.write.parquet(src)
    rc, out2 = run(capsys, "corpus", "decode-coverage", "--input",
                   src, "-j")
    assert rc == 0
    got = {r["container"]: r for r in
           (json.loads(ln) for ln in out2.splitlines())}
    assert got["bmp"]["real_rate"] == 1.0
    assert got["other"]["real_rate"] == 0.0


def test_corpus_novelty(capsys, tmp_path, spark):
    """r14 memorization gauge over the CLI: per-doc overlap vs a
    reference parquet; missing reference and bad n are clean rc 2."""
    ref = str(tmp_path / "nov_ref")
    spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .where("doc_id % 3 = 0").write.parquet(ref)
    rc, out = run(capsys, "corpus", "novelty", "--reference", ref,
                  "-n", "5", "-j", "-l", "10000")
    assert rc == 0
    rows = [json.loads(ln) for ln in out.splitlines()]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    by_id = {r["doc_id"]: r for r in rows}
    # reference members read overlap 1.0 by construction
    assert all(by_id[i]["overlap_rate"] == 1.0
               for i in by_id if i % 3 == 0)
    assert all(abs(r["overlap_rate"] + r["novelty_rate"] - 1.0)
               < 2e-6 for r in rows)
    rc, _ = run(capsys, "corpus", "novelty", "--reference", ref,
                "-n", "0")
    assert rc == 2


def test_corpus_decode_coverage_ingest(capsys, tmp_path, spark):
    """r14 drift monitor over the CLI: --ingest emits the per-batch
    gauge; --sink persists it; orphan flags are rc 2."""
    from metacat_spark.llm.multimodal import synthesize_assets
    src = str(tmp_path / "dcs_src")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    synthesize_assets(docs).write.parquet(src)
    rc, out = run(capsys, "corpus", "decode-coverage", "--ingest",
                  src, "-j", "-l", "1000")
    assert rc == 0
    rows = [json.loads(ln) for ln in out.splitlines()]
    assert sum(r["n_assets"] for r in rows) == docs.count()
    sink = str(tmp_path / "dcs_sink")
    rc, _ = run(capsys, "corpus", "decode-coverage", "--ingest",
                src, "--sink", sink, "-j")
    assert rc == 0
    assert spark.read.parquet(sink).count() >= 1
    rc, _ = run(capsys, "corpus", "decode-coverage", "--sink", sink)
    assert rc == 2
    rc, _ = run(capsys, "corpus", "decode-coverage", "--timeout",
                "60")
    assert rc == 2
