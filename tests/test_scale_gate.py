"""Scale-trend GATE (VERDICT r5 #7): the 1x -> 4x in-plan replication
probe, promoted from a tools/-only report (docs/SCALING.md) to a test
that FAILS when an operator's wall-clock growth turns super-linear —
a plan regression (lost broadcast, new per-key concentration, a
shuffle that started spilling) breaks CI instead of waiting for a
human to reread the scaling tables.

Bound: wall(4x) <= 3 * wall(1x) + 2s. The 3x factor is deliberately
generous for 4x data (all three ops measure flat-to-sublinear in
docs/SCALING.md); the +2s absolute floor absorbs scheduling noise at
the tiny test scale, where per-job overhead rivals the compute."""

import importlib.util
import os
import time

from pyspark.sql import functions as F

from conftest import SF_DIR

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "scale_probe_mod", os.path.join(_ROOT, "tools", "scale_probe.py"))
_probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_probe)
_probe.SF_DIR = SF_DIR


def _docs(spark, mult):
    return _probe._replicate(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
        mult, ["doc_id"])


def _cases(spark, mult):
    from metacat_spark.llm import dedup as DD
    from metacat_spark.llm import text as TX
    from metacat_spark.streaming import events as EV
    docs = _docs(spark, mult)
    return {
        "minhash_lsh": lambda: DD.minhash_lsh_pairs(
            docs, n=2, k=32, bands=8, threshold=0.5).count(),
        "substring_spans": lambda: DD.duplicate_spans(
            docs, n=8, min_count=2).count(),
        "events_funnel": lambda: EV.funnel(
            _probe._replicate_events(spark, mult),
            ["view", "click", "purchase"], horizon_s=86400).count(),
        # consumed via a text hash + the removed count, NOT count():
        # output cardinality == input cardinality here, so count()
        # would let Catalyst prune the whole rebuild (the recurring
        # deterministic-and-unconsumed bug class). Replicas share
        # text, so at 4x every line is cross-doc common — a harsher
        # work profile (everything touched), still bounded.
        "line_dedup": lambda: len(
            DD.drop_common_lines(docs, min_df=2)
            .agg(F.bit_xor(F.xxhash64(
                F.coalesce(F.col("text"), F.lit("")),
                F.col("n_lines_removed"))).alias("s"))
            .collect()),
        # r8: Moore-Lewis is two vocab-bounded tf aggregates + one
        # occurrence join — growth must stay linear in occurrences.
        # Consumed via score hash (scores are deterministic work).
        "moore_lewis": lambda: len(
            TX.moore_lewis_scores(docs.where("source <> 'src0'"),
                                  docs.where("source = 'src0'"))
            .agg(F.bit_xor(F.xxhash64("doc_id", "ml_score"))
                 .alias("s")).collect()),
        # r9: BM25 is one scan + one 1-row stats aggregate — growth
        # must stay linear in documents. Consumed via score hash
        # (cardinality == input, count() would prune the math).
        "bm25": lambda: len(
            _search_mod().bm25_scores(
                docs, ["spark", "window", "merge"])
            .agg(F.bit_xor(F.xxhash64("doc_id", "score"))
                 .alias("s")).collect()),
        # r11: CCNet bucketing is two scoring passes + a 1-row
        # percentile aggregate — growth must stay linear in term
        # occurrences (the model side is vocabulary-bounded).
        # Consumed via (score, bucket) hash.
        "perplexity_buckets": lambda: len(
            TX.perplexity_buckets(docs,
                                  docs.where("source = 'src0'"))
            .agg(F.bit_xor(F.xxhash64("doc_id", "score", "bucket"))
                 .alias("s")).collect()),
        # r11: attribution is ONE user-keyed join with a bounded
        # lookback + conversion-id windows; replicas get distinct
        # users AND distinct event ids (the window partitions on
        # conversion id, so colliding replica ids would merge
        # windows and distort the work shape).
        "attribution": lambda: len(
            EV.attribution(
                _probe._replicate_events(spark, mult)
                .withColumn("event_id",
                            F.xxhash64("event_id", "user_id")),
                lookback_s=86400)
            .agg(F.bit_xor(F.xxhash64("touch_type", "credit"))
                 .alias("s")).collect()),
        # r11: inverted-index build is one scan + one (id, term)
        # aggregate; serve touches the query terms' postings only.
        # Build+serve together must stay linear in corpus size.
        "text_index": lambda: len(
            _search_mod().search_text_index(
                _search_mod().build_text_index(docs),
                ["spark", "window", "merge"], k=10).collect()),
        # r12: batched serving — one plan over the union of the
        # batch's terms; growth must stay linear in the matched
        # postings, never in the batch × corpus product.
        "text_index_many": lambda: len(
            _search_mod().search_text_index_many(
                _search_mod().build_text_index(docs),
                {"a": ["spark", "window", "merge"],
                 "b": ["the", "data"], "c": ["merge"]},
                k=10).collect()),
        # r14: novelty is one linear hashed-shingle semi-join + two
        # per-doc aggregates — no (doc, ref-doc) pair space, so
        # growth must stay linear in shingle occurrences even though
        # replicas share text (every doc fully matched at 4x: the
        # all-hot worst case). Consumed via rate hash (cardinality
        # == input, count() would prune the join).
        "ngram_novelty": lambda: len(
            DD.ngram_novelty(docs.where("source <> 'src0'"),
                             docs.where("source = 'src0'"), n=5)
            .agg(F.bit_xor(F.xxhash64("doc_id", "overlap_rate"))
                 .alias("s")).collect()),
        # r9: DSIR's model tables are bucket-bounded (broadcast at any
        # size); per-doc work is linear in bigram occurrences.
        "dsir": lambda: len(
            TX.dsir_logweights(docs.where("source <> 'src0'"),
                               docs.where("source = 'src0'"),
                               buckets=256)
            .agg(F.bit_xor(F.xxhash64("doc_id", "dsir_logw"))
                 .alias("s")).collect()),
        # r13: cluster-balanced sampling over hashed doc vectors —
        # assignment is a row-local JVM fold, selection a salted
        # two-phase window; growth must stay linear in rows. The
        # centroid ARTIFACT is prebuilt once (training is
        # sample-bounded and probed by the IVF rows; timing it here
        # made the tiny 1x wall noise-dominated under full-suite
        # load). Output is capped, so consume the ranks.
        "cluster_sample": lambda: len(
            _sim_mod().cluster_balanced_sample(
                _sim_mod().hashed_doc_vectors(docs),
                per_cluster=20, centroids=_cbs_centroids(spark),
                vec_col="vector", id_col="doc_id")
            .agg(F.bit_xor(F.xxhash64("doc_id", "cluster_id",
                                      "rank")).alias("s"))
            .collect()),
    }


_CBS_CACHE: dict = {}


def _cbs_centroids(spark):
    if "c" not in _CBS_CACHE:
        SIM = _sim_mod()
        art = SIM.build_ivf_centroids(
            SIM.hashed_doc_vectors(_docs(spark, 1)), n_lists=8,
            train_iters=0, vec_col="vector", id_col="doc_id").cache()
        art.count()
        _CBS_CACHE["c"] = art
    return _CBS_CACHE["c"]


def _search_mod():
    from metacat_spark.llm import search as SR
    return SR


def _sim_mod():
    from metacat_spark.llm import similarity as SIM
    return SIM


def test_scale_probe_gate(spark):
    # warm pass: JVM/codegen/Arrow-worker startup must not be charged
    # to the 1x measurement
    for fn in _cases(spark, 1).values():
        fn()
    walls = {}
    for mult in (1, 4):
        for name, fn in _cases(spark, mult).items():
            t = time.time()
            rows = fn()
            walls.setdefault(name, {})[mult] = time.time() - t
            assert rows >= 0
    for name, w in walls.items():
        assert w[4] <= 3 * w[1] + 2.0, (
            f"{name}: super-linear wall growth {w[1]:.2f}s -> "
            f"{w[4]:.2f}s at 4x data — plan regression")
