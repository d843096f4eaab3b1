"""Production-sink (``sink_dir``) mode of the *_stream twins
(VERDICT r11 #1): each per-doc twin parquet-appends its rows and
returns a BOUNDED per-batch gauge instead of accumulating documents
on the driver. Pins file-sink ≡ memory-sink ≡ batch per twin, and
that the gauge accounts for every sunk row."""

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

QUERY = ["spark", "window", "merge"]


@pytest.fixture(scope="module")
def docs(catalog):
    return catalog.raw["documents"]


@pytest.fixture(scope="module")
def embs(catalog):
    return catalog.raw["embeddings"]


def test_bm25_stream_sink_equals_batch(docs, spark, tmp_path):
    from metacat_spark.llm.search import bm25_scores, bm25_stream
    sink = str(tmp_path / "bm25_sink")
    gauge = bm25_stream(spark, f"{SF_DIR}/documents.parquet", QUERY,
                        stats_from=docs, sink_dir=sink).collect()
    assert gauge and all(r["n"] >= 0 for r in gauge)
    sunk = {r["doc_id"]: (r["n_tokens"], r["score"])
            for r in spark.read.parquet(sink).collect()}
    batch = {r["doc_id"]: (r["n_tokens"], r["score"])
             for r in bm25_scores(docs, QUERY).collect()}
    assert set(sunk) == set(batch)
    for d, (nt, s) in batch.items():
        snt, ss = sunk[d]
        assert snt == nt and abs(ss - s) <= 1e-6, d
    # the gauge accounts for every sunk row, and n_matched is the
    # real positive-score count
    assert sum(r["n"] for r in gauge) == len(sunk)
    assert (sum(r["n_matched"] for r in gauge)
            == sum(1 for _, s in sunk.values() if s > 0))
    # checkpointed by default
    assert os.path.isdir(sink + "__checkpoint")


def test_dsir_stream_sink_equals_batch(docs, spark, tmp_path):
    from metacat_spark.llm.text import dsir_logweights, dsir_stream
    raw = docs.where(F.col("source") != "src0")
    tgt = docs.where(F.col("source") == "src0")
    sink = str(tmp_path / "dsir_sink")
    gauge = dsir_stream(spark, f"{SF_DIR}/documents.parquet", raw,
                        tgt, buckets=256, sink_dir=sink).collect()
    assert gauge
    sunk = {r["doc_id"]: (r["n_feats"], r["dsir_logw"])
            for r in spark.read.parquet(sink).collect()}
    batch = {r["doc_id"]: (r["n_feats"], r["dsir_logw"])
             for r in dsir_logweights(raw, tgt, buckets=256)
             .collect()}
    # target docs stream too but score under the same map — the raw
    # pool (what batch scores) must match exactly
    assert set(batch) <= set(sunk)
    for d, (nf, w) in batch.items():
        snf, sw = sunk[d]
        assert snf == nf and abs(sw - w) <= 1e-6, d
    assert sum(r["n"] for r in gauge) == len(sunk)


def test_perplexity_stream_sink_equals_batch(docs, spark, tmp_path):
    """Multi-batch drain (3 source files, 1 per trigger): the sunk
    (score, bucket) rows equal the batch op row-for-row, and each
    gauge row's bucket counts partition its n."""
    from metacat_spark.llm.text import (perplexity_buckets,
                                        perplexity_stream)
    src = str(tmp_path / "ppl_src")
    docs.repartition(3).write.parquet(src)
    ref = docs.where(F.col("source") == "src0")
    sink = str(tmp_path / "ppl_sink")
    gauge = perplexity_stream(spark, src, ref,
                              threshold_corpus=docs,
                              sink_dir=sink).collect()
    assert len(gauge) >= 3
    assert all(r["n"] == r["n_head"] + r["n_middle"] + r["n_tail"]
               for r in gauge)
    sunk = {r["doc_id"]: (r["score"], r["bucket"])
            for r in spark.read.parquet(sink).collect()}
    batch = {r["doc_id"]: (r["score"], r["bucket"])
             for r in perplexity_buckets(docs, ref).collect()}
    assert sunk == batch and batch
    assert sum(r["n"] for r in gauge) == len(sunk)


def test_score_stream_sink_equals_batch(docs, spark, tmp_path):
    from metacat_spark.llm.train import (score_logreg_hashed,
                                         score_stream,
                                         train_logreg_hashed)
    labeled = docs.withColumn("y", (F.col("source") == "src0")
                              .cast("double"))
    w = train_logreg_hashed(labeled, "y", steps=3, lr=10.0,
                            buckets=64)
    sink = str(tmp_path / "score_sink")
    gauge = score_stream(spark, f"{SF_DIR}/documents.parquet", w,
                         buckets=64, sink_dir=sink).collect()
    assert gauge
    sunk = {r["doc_id"]: (r["margin"], r["prob"])
            for r in spark.read.parquet(sink).collect()}
    batch = {r["doc_id"]: (r["margin"], r["prob"])
             for r in score_logreg_hashed(labeled, w, buckets=64)
             .collect()}
    assert set(sunk) == set(batch)
    for d, (m, p) in batch.items():
        sm, sp = sunk[d]
        assert abs(sm - m) <= 1e-6 and abs(sp - p) <= 1e-6, d
    assert sum(r["n"] for r in gauge) == len(sunk)
    assert (sum(r["n_positive"] for r in gauge)
            == sum(1 for m, _ in sunk.values() if m > 0))


def test_search_stream_topk_sink_equals_batch(docs, spark,
                                              tmp_path):
    """Leaderboard twin with a parquet emission history: the FINAL
    leaderboard equals batch search_bm25, and the sink holds every
    intermediate leaderboard (≥ 2 sequences across 4 one-file
    batches) instead of a driver-resident memory table."""
    from metacat_spark.llm.search import (search_bm25,
                                          search_stream_topk)
    src = str(tmp_path / "docs4")
    docs.repartition(4).write.parquet(src)
    sink = str(tmp_path / "lb_sink")
    got = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
           for r in search_stream_topk(
               spark, src, QUERY, stats_from=docs, k=10,
               max_files_per_trigger=1, sink_dir=sink).collect()]
    want = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
            for r in search_bm25(docs, QUERY, k=10)
            .orderBy("rank").collect()]
    assert got == want and got
    history = spark.read.parquet(sink)
    seqs = {r["seq"] for r in history.select("seq").distinct()
            .collect()}
    assert len(seqs) >= 2, seqs
    # every emitted leaderboard is bounded by k
    per_seq = history.groupBy("seq").count().collect()
    assert all(r["count"] <= 10 for r in per_seq)


def test_events_sessions_sink_equals_memory_equals_batch(spark,
                                                         tmp_path):
    """Events twins graduate to production sinks (VERDICT r12 #2).
    Complete-mode twin: the parquet snapshot equals the memory-sink
    table equals the batch operator."""
    from metacat_spark.streaming import events as EV
    key = lambda r: (r["user_id"], str(r["session_start"]),
                     r["n_events"], r["total_value"])
    sink = str(tmp_path / "sess_sink")
    filed = sorted(key(r) for r in EV.streaming_sessions_to_memory(
        spark, SF_DIR, 30, sink_dir=sink).collect())
    mem = sorted(key(r) for r in EV.streaming_sessions_to_memory(
        spark, SF_DIR, 30, table="sess_sink_mem").collect())
    batch = sorted(key(r) for r in EV.sessionize_native(
        EV.load_events(spark, SF_DIR), 30).collect())
    assert filed == mem == batch and filed
    assert os.path.isdir(sink + "__checkpoint")


def test_events_windowed_counts_sink_equals_memory_equals_batch(
        spark, tmp_path):
    from metacat_spark.streaming import events as EV
    key = lambda r: (str(r["window_start"]), r["event_type"],
                     r["n_events"], r["total_value"])
    sink = str(tmp_path / "win_sink")
    filed = sorted(key(r) for r in
                   EV.streaming_windowed_counts_to_memory(
                       spark, SF_DIR, sink_dir=sink).collect())
    mem = sorted(key(r) for r in
                 EV.streaming_windowed_counts_to_memory(
                     spark, SF_DIR, table="win_sink_mem").collect())
    batch = sorted(key(r) for r in EV.windowed_counts(
        EV.load_events(spark, SF_DIR)).collect())
    assert filed == mem == batch and filed


def test_events_running_totals_sink_equals_memory_equals_batch(
        spark, tmp_path):
    """Update-mode twin: the appended emission history equals the
    memory sink's; the LAST emission per type equals the batch
    aggregate (availableNow over one file = one batch here)."""
    from metacat_spark.streaming import events as EV
    sink = str(tmp_path / "run_sink")
    filed = sorted(tuple(r) for r in
                   EV.streaming_running_totals_to_memory(
                       spark, SF_DIR, sink_dir=sink).collect())
    mem = sorted(tuple(r) for r in
                 EV.streaming_running_totals_to_memory(
                     spark, SF_DIR, table="run_sink_mem").collect())
    batch = sorted(
        (r["event_type"], r["n"], r["v"])
        for r in (EV.load_events(spark, SF_DIR)
                  .groupBy("event_type")
                  .agg(F.count("*").alias("n"),
                       F.round(F.sum("value"), 3).alias("v"))
                  .collect()))
    assert filed == mem == batch and filed


def test_events_funnel_sink_equals_memory_equals_batch(spark,
                                                       tmp_path):
    from metacat_spark.streaming import events as EV
    steps = ["view", "click", "purchase"]
    sink = str(tmp_path / "fun_sink")
    filed = {(r["user_id"], tuple(r["times"])) for r in
             EV.streaming_funnel_to_memory(
                 spark, SF_DIR, steps, horizon_s=86400,
                 sink_dir=sink).collect()}
    mem = {(r["user_id"], tuple(r["times"])) for r in
           EV.streaming_funnel_to_memory(
               spark, SF_DIR, steps, horizon_s=86400,
               table="fun_sink_mem").collect()}
    batch = {(r["user_id"], (r["u1"], r["u2"], r["u3"])) for r in
             EV.funnel(EV.load_events(spark, SF_DIR), steps,
                       horizon_s=86400)
             .select("user_id",
                     F.unix_micros(F.col("t1").cast("timestamp"))
                     .alias("u1"),
                     F.unix_micros(F.col("t2").cast("timestamp"))
                     .alias("u2"),
                     F.unix_micros(F.col("t3").cast("timestamp"))
                     .alias("u3")).collect()}
    assert filed == mem == batch and filed


def test_events_sink_ownership_is_loud(spark, tmp_path):
    """Review-r13: the events drains carry the same sink-ownership
    guards as the leaderboard twins — foreign data without its
    checkpoint refuses to start (an append-mode rerun would
    duplicate every funnel completion), and a drained checkpoint
    with zero new batches raises instead of relabeling the previous
    run's rows."""
    from metacat_spark.streaming import events as EV
    steps = ["view", "click", "purchase"]
    sink = str(tmp_path / "own_sink")
    first = EV.streaming_funnel_to_memory(
        spark, SF_DIR, steps, horizon_s=86400, sink_dir=sink)
    n = first.count()
    assert n > 0
    # same sink, fresh checkpoint -> refused before starting
    with pytest.raises(ValueError, match="checkpoint"):
        EV.streaming_funnel_to_memory(
            spark, SF_DIR, steps, horizon_s=86400, sink_dir=sink,
            checkpoint_dir=str(tmp_path / "fresh_ck"))
    # same sink + drained checkpoint -> zero new batches, loud
    with pytest.raises(ValueError, match="already marks"):
        EV.streaming_funnel_to_memory(
            spark, SF_DIR, steps, horizon_s=86400, sink_dir=sink)
    # no silent duplication happened along the way
    assert spark.read.parquet(sink).count() == n


def test_novelty_stream_sink_equals_batch(docs, spark, tmp_path):
    """r14 novelty twin: stream-scored rows (memory rig AND file
    sink) equal the batch ngram_novelty row-for-row, and the
    per-batch gauge accounts for every sunk row."""
    from metacat_spark.llm.dedup import ngram_novelty, novelty_stream
    ref = docs.where("doc_id % 3 = 0")
    want = sorted(
        (r["doc_id"], r["n_grams"], r["n_seen"], r["overlap_rate"])
        for r in ngram_novelty(docs, ref, n=5).collect())
    mem = novelty_stream(spark, f"{SF_DIR}/documents.parquet", ref,
                         n=5)
    key = lambda r: (r["doc_id"], r["n_grams"], r["n_seen"],
                     r["overlap_rate"])
    assert sorted(map(key, mem.collect())) == want
    sink = str(tmp_path / "nov_sink")
    os.makedirs(sink)
    gauge = novelty_stream(spark, f"{SF_DIR}/documents.parquet",
                           ref, n=5, sink_dir=sink)
    g = gauge.collect()
    assert g and sum(r["n"] for r in g) == docs.count()
    # reference members alone put the contaminated count >= |ref|
    assert sum(r["n_contaminated"] for r in g) >= ref.count()
    filed = spark.read.parquet(sink)
    assert sorted(map(key, filed.collect())) == want


def test_decode_coverage_stream_equals_batch(docs, spark, tmp_path):
    """r14 codec-drift monitor: per-batch per-container gauge rows;
    summing counts across batches replays the batch gauge of the
    union exactly (decode is row-local); file sink == memory rig."""
    from metacat_spark.llm.multimodal import (decode_coverage,
                                              decode_coverage_stream,
                                              synthesize_assets)
    src = str(tmp_path / "cov_src")
    assets = synthesize_assets(docs)
    assets.repartition(3).write.parquet(src)

    def fold(rows):
        agg = {}
        for r in rows:
            a = agg.setdefault(r["container"], [0, 0, 0])
            a[0] += r["n_assets"]
            a[1] += r["n_real"]
            a[2] += r["n_fallback"]
        return agg

    want = fold(decode_coverage(assets).collect())
    mem = decode_coverage_stream(spark, src)
    assert fold(mem.collect()) == want
    assert mem.count() <= mem.select("batch_id").distinct() \
        .count() * 9                       # bounded emission
    sink = str(tmp_path / "cov_sink")
    os.makedirs(sink)
    filed = decode_coverage_stream(spark, src, sink_dir=sink)
    assert fold(filed.collect()) == want
    key = lambda r: (r["batch_id"], r["container"], r["n_assets"],
                     r["n_real"], r["n_fallback"], r["real_rate"])
    assert sorted(map(key, filed.collect())) == sorted(
        map(key, mem.collect()))


def test_novelty_stream_empty_schema_matches_source_id_type(
        docs, spark, tmp_path):
    """ADVICE r14: the empty-stream fallback schema must carry the
    SOURCE id type (long doc_ids here), not a hardcoded string —
    otherwise the returned schema differed between an empty and a
    non-empty stream, breaking downstream unions on the empty edge."""
    from metacat_spark.llm.dedup import novelty_stream
    src = str(tmp_path / "nov_empty_src")
    docs.limit(0).write.parquet(src)
    ref = docs.where("doc_id % 3 = 0")
    out = novelty_stream(spark, src, ref, n=5)
    assert out.count() == 0
    assert dict(out.dtypes)["doc_id"] == dict(docs.dtypes)["doc_id"]
    assert [f for f, _ in out.dtypes] == [
        "doc_id", "n_grams", "n_seen", "overlap_rate", "novelty_rate"]
