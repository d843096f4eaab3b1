"""BM25 / hybrid-RRF retrieval and DSIR importance-resampling tests.

Exact parity against DuckDB replays of the same math, plus closed-form
law checks (RRF recomputation, Gumbel-key determinism) and plan-shape
assertions (TakeOrdered not global sort, broadcast bucket tables)."""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from metacat_spark.llm.search import (bm25_scores, cosine_topn,
                                      hybrid_rrf, search_bm25)
from metacat_spark.llm.text import (POLY_MOD, dsir_logweights,
                                    dsir_resample)

QUERY = ["spark", "window", "merge"]

# DuckDB replay of the exact BM25 pipeline (k1=1.2, b=0.75)
BM25_SQL = """
with base as (
  select doc_id, string_split_regex(lower(text), '\\s+') as t
  from documents),
tf as (
  select doc_id, len(t)::double as dl,
         len(list_filter(t, x -> x = 'spark'))::double as tf0,
         len(list_filter(t, x -> x = 'window'))::double as tf1,
         len(list_filter(t, x -> x = 'merge'))::double as tf2
  from base),
stats as (
  select count(*)::double as n, avg(dl) as avgdl,
         sum((tf0 > 0)::int)::double as df0,
         sum((tf1 > 0)::int)::double as df1,
         sum((tf2 > 0)::int)::double as df2 from tf)
select doc_id, dl::bigint as n_tokens,
  round(
    ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
      * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
      * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
      * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
    as score
from tf cross join stats"""

DSIR_HASH = ("list_reduce(list_prepend(0::bigint, list_transform("
             "string_split(w1 || ' ' || w2, ''), "
             "x -> unicode(x)::bigint)), "
             "(acc, x) -> (acc * 31 + x) % 2147483647) % 256")

DSIR_SQL = f"""
with base as (
  select doc_id, source, string_split_regex(text, '\\s+') as t
  from documents
  where len(string_split_regex(text, '\\s+')) >= 2),
b0 as (select doc_id as id, source,
              unnest([{{'w1': lower(t[i]), 'w2': lower(t[i+1])}}
                      for i in range(1, len(t))]) as p
       from base),
b as (select id, source, p.w1 as w1, p.w2 as w2 from b0),
fr as (select id, {DSIR_HASH} as f from b where source <> 'src0'),
ft as (select {DSIR_HASH} as f from b where source = 'src0'),
cr as (select f, count(*) as c_r from fr group by f),
tr as (select sum(c_r) as n_r from cr),
ct as (select f, count(*) as c_t from ft group by f),
tt as (select sum(c_t) as n_t from ct)
select id as doc_id, count(*) as n_feats,
       round(sum(ln((coalesce(c_t, 0) + 1) / (n_t + 256))
                 - ln((c_r + 1) / (n_r + 256))), 6) as dsir_logw
from fr join cr using (f) left join ct using (f)
  cross join tr cross join tt
group by id"""


@pytest.fixture(scope="module")
def docs(catalog):
    return catalog.raw["documents"]


@pytest.fixture(scope="module")
def embs(catalog):
    return catalog.raw["embeddings"]


def _py_poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % POLY_MOD
    return acc


# -------------------------------------------------------------- BM25

def test_bm25_scores_vs_duck(docs, duck):
    got = {r["doc_id"]: (r["n_tokens"], r["score"])
           for r in bm25_scores(docs, QUERY).collect()}
    want = {r[0]: (r[1], r[2])
            for r in duck.execute(BM25_SQL).fetchall()}
    assert got == want


def test_bm25_formula_tiny(spark):
    """Hand-computed BM25 on a 3-doc corpus: every constant in the
    formula exercised with exact expected values."""
    rows = [(1, "apple banana apple"), (2, "banana"), (3, "cherry")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, ["apple"]).collect()}
    n, df_t, avgdl = 3.0, 1.0, (3 + 1 + 1) / 3.0
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    tf, dl = 2.0, 3.0
    expect = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert got[1] == round(expect, 6)
    assert got[2] == 0.0 and got[3] == 0.0


def test_bm25_dedupes_and_rejects_empty_query(docs):
    a = {r["doc_id"]: r["score"]
         for r in bm25_scores(docs, ["spark", "SPARK", "spark"])
         .collect()}
    b = {r["doc_id"]: r["score"]
         for r in bm25_scores(docs, ["spark"]).collect()}
    assert a == b
    with pytest.raises(ValueError):
        bm25_scores(docs, ["", ""])


def test_search_bm25_topk_vs_duck(docs, duck):
    got = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
           for r in search_bm25(docs, QUERY, k=10)
           .orderBy("rank").collect()]
    want = duck.execute(f"""
        with scored as ({BM25_SQL})
        select doc_id, n_tokens, score,
               row_number() over (order by score desc, doc_id) as rank
        from scored where score > 0
        qualify rank <= 10 order by rank""").fetchall()
    assert got == [tuple(r) for r in want]


# ------------------------------------------------------- hybrid RRF

def test_cosine_topn_vs_duck(embs, duck):
    got = [(r["id"], r["cosine"], r["rank"])
           for r in cosine_topn(embs, query_vec_id=0, n=15)
           .orderBy("rank").collect()]
    want = duck.execute("""
        with q as (select embedding as qvec from embeddings
                   where vec_id = 0),
        cos0 as (
          select vec_id as id,
                 round(list_cosine_similarity(embedding::double[],
                                               qvec::double[]), 6)
                   as cosine
          from embeddings cross join q where vec_id <> 0)
        select id, cosine,
               row_number() over (order by cosine desc, id) as rank
        from cos0 where isfinite(cosine)
        qualify rank <= 15 order by rank""").fetchall()
    assert got == [tuple(r) for r in want]


def test_bm25_stream_equals_batch(docs, spark):
    """Streaming BM25 with reference stats from the SAME corpus must
    reproduce the batch scorer's round-6 scores for every doc."""
    from conftest import SF_DIR

    from metacat_spark.llm.search import bm25_stream
    batch = {r["doc_id"]: (r["n_tokens"], r["score"])
             for r in bm25_scores(docs, QUERY).collect()}
    streamed = {r["doc_id"]: (r["n_tokens"], r["score"])
                for r in bm25_stream(
                    spark, f"{SF_DIR}/documents.parquet", QUERY,
                    stats_from=docs, table="bm25_stream_t1")
                .collect()}
    assert set(streamed) == set(batch)
    for d, (nt, s) in batch.items():
        snt, ss = streamed[d]
        assert snt == nt and abs(ss - s) <= 1e-6, (d, (nt, s),
                                                   (snt, ss))


def test_search_stream_topk_across_batches(docs, spark, tmp_path):
    """The running-top-k stateful operator must converge to the batch
    top-k after draining the corpus — exercised across MULTIPLE
    micro-batches (4 input files, one per trigger), so the state
    genuinely merges leaderboards between batches."""
    from metacat_spark.llm.search import search_stream_topk
    src = str(tmp_path / "docs4")
    docs.repartition(4).write.parquet(src)
    got = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
           for r in search_stream_topk(
               spark, src, QUERY, stats_from=docs, k=10,
               max_files_per_trigger=1,
               table="search_stream_topk_t1").collect()]
    want = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
            for r in search_bm25(docs, QUERY, k=10)
            .orderBy("rank").collect()]
    assert got == want
    # the state really crossed batches: more than one leaderboard
    # sequence was emitted
    seqs = {r["seq"] for r in
            spark.table("search_stream_topk_t1").select("seq")
            .collect()}
    assert len(seqs) >= 2, seqs


def test_cosine_topn_missing_vec_raises(embs):
    """A typo'd vec_id must be a clean error, not a silently empty
    (or BM25-only, through hybrid_rrf) result (review r9)."""
    with pytest.raises(ValueError, match="99999"):
        cosine_topn(embs, query_vec_id=99999, n=5)


def test_hybrid_rrf_laws(docs, embs):
    """RRF recomputed from the source ranks; every fused doc appears
    in at least one candidate list; full-outer semantics keep
    vector-only candidates."""
    out = hybrid_rrf(docs, embs, QUERY, query_vec_id=0,
                     n=20, k=10).orderBy("rank").collect()
    assert len(out) == 10
    prev = None
    for r in out:
        assert r["kw_rank"] is not None or r["vec_rank"] is not None
        expect = 0.0
        if r["kw_rank"] is not None:
            expect += 1.0 / (60 + r["kw_rank"])
        if r["vec_rank"] is not None:
            expect += 1.0 / (60 + r["vec_rank"])
        assert r["rrf"] == round(expect, 6)
        key = (-r["rrf"], r["doc_id"])
        assert prev is None or prev < key  # strict rank order
        prev = key
    # both single-list kinds must be representable: with n=20 and
    # k=10, docs fused from both lists outrank single-list docs of
    # equal rank — verify at least one doc came from each ranker
    assert any(r["kw_rank"] is not None for r in out)
    assert any(r["vec_rank"] is not None for r in out)


def test_hybrid_rrf_vs_duck(docs, embs, duck):
    got = [(r["doc_id"], r["kw_rank"], r["vec_rank"], r["rrf"],
            r["rank"])
           for r in hybrid_rrf(docs, embs, QUERY, query_vec_id=0,
                               n=20, k=10).orderBy("rank").collect()]
    want = duck.execute(f"""
        with scored as ({BM25_SQL}),
        kw as (
          select doc_id as id,
                 row_number() over (order by score desc, doc_id)
                   as kw_rank
          from scored where score > 0
          qualify kw_rank <= 20),
        q as (select embedding as qvec from embeddings
              where vec_id = 0),
        cos0 as (
          select vec_id as id,
                 round(list_cosine_similarity(embedding::double[],
                         qvec::double[]), 6) as cosine
          from embeddings cross join q where vec_id <> 0),
        cos as (
          select id, cosine,
                 row_number() over (order by cosine desc, id)
                   as vec_rank
          from cos0 where isfinite(cosine)
          qualify vec_rank <= 20),
        fused as (
          select coalesce(kw.id, cos.id) as doc_id, kw_rank, vec_rank,
                 round(coalesce(1.0 / (60 + kw_rank), 0)
                       + coalesce(1.0 / (60 + vec_rank), 0), 6) as rrf
          from kw full outer join cos on kw.id = cos.id)
        select doc_id, kw_rank, vec_rank, rrf,
               row_number() over (order by rrf desc, doc_id) as rank
        from fused qualify rank <= 10 order by rank""").fetchall()
    assert got == [tuple(r) for r in want]


def test_topk_prereduce_volume_and_order(docs):
    """The per-partition pre-reduce is volume-bounded (≤ k rows per
    partition survive) and order-preserving (the global top-k over
    the pre-reduced rows equals the batch ranker exactly)."""
    from metacat_spark.llm.search import _topk_prereduce
    scored = (bm25_scores(docs, QUERY).where(F.col("score") > 0)
              .select("doc_id", "n_tokens", "score").repartition(4))
    rows = _topk_prereduce(scored, 5, "score", "doc_id").collect()
    assert len(rows) <= 4 * 5
    got = sorted(((r["doc_id"], r["n_tokens"], r["score"])
                  for r in rows),
                 key=lambda t: (-t[2], t[0]))[:5]
    want = [(r["doc_id"], r["n_tokens"], r["score"])
            for r in search_bm25(docs, QUERY, k=5)
            .orderBy("rank").collect()]
    assert got == want


def test_stream_topk_prereduce_wired(docs, spark, tmp_path,
                                     monkeypatch):
    """search_stream_topk routes matches through the pre-reduce
    (VERDICT r9 #6): the spy sees the leaderboard's k and the
    pre-reduced STREAMING plan carries the MapInPandas node ahead of
    the state operator."""
    import metacat_spark.llm.search as S
    seen = {}
    orig = S._topk_prereduce

    def spy(df, k, value_col, id_col):
        out = orig(df, k, value_col, id_col)
        seen["k"] = k
        seen["streaming"] = out.isStreaming
        seen["plan"] = out._jdf.queryExecution().analyzed().toString()
        return out

    monkeypatch.setattr(S, "_topk_prereduce", spy)
    src = str(tmp_path / "docs_spy")
    docs.write.parquet(src)
    got = S.search_stream_topk(spark, src, QUERY, stats_from=docs,
                               k=7, table="sst_spy_t1").collect()
    assert seen["k"] == 7 and seen["streaming"]
    assert "MapInPandas" in seen["plan"] or "mapInPandas" in seen["plan"]
    assert 0 < len(got) <= 7


def test_cosine_stream_topk_equals_batch(embs, spark, tmp_path):
    """The running cosine leaderboard converges to the batch
    cosine_topn top-k across MULTIPLE micro-batches."""
    from metacat_spark.llm.search import cosine_stream_topk
    src = str(tmp_path / "embs4")
    embs.repartition(4).write.parquet(src)
    got = [(r["id"], r["cosine"], r["rank"])
           for r in cosine_stream_topk(
               spark, src, 0, query_from=embs, k=10,
               max_files_per_trigger=1,
               table="cos_stream_t1").collect()]
    want = [(r["id"], r["cosine"], r["rank"])
            for r in cosine_topn(embs, query_vec_id=0, n=10)
            .orderBy("rank").collect()]
    assert got == want
    seqs = {r["seq"] for r in
            spark.table("cos_stream_t1").select("seq").collect()}
    assert len(seqs) >= 2, seqs


def test_cosine_stream_topk_missing_vec_raises(embs, spark, tmp_path):
    """Same loud-typo contract as batch cosine_topn — and it fires
    BEFORE any stream is started."""
    from metacat_spark.llm.search import cosine_stream_topk
    with pytest.raises(ValueError, match="99999"):
        cosine_stream_topk(spark, str(tmp_path), 99999,
                           query_from=embs)


def test_hybrid_stream_topk_equals_batch(docs, embs, spark, tmp_path):
    """Streaming hybrid retrieval: after both drains (4 micro-batches
    each), the RRF fusion of the two final leaderboards equals batch
    hybrid_rrf row-for-row."""
    from metacat_spark.llm.search import hybrid_stream_topk
    dsrc = str(tmp_path / "hdocs4")
    esrc = str(tmp_path / "hembs4")
    docs.repartition(4).write.parquet(dsrc)
    embs.repartition(4).write.parquet(esrc)
    got = [(r["doc_id"], r["kw_rank"], r["vec_rank"], r["rrf"],
            r["rank"])
           for r in hybrid_stream_topk(
               spark, dsrc, esrc, QUERY, query_vec_id=0,
               stats_from=docs, query_from=embs, n=20, k=10,
               max_files_per_trigger=1,
               table="hyb_stream_t1").orderBy("rank").collect()]
    want = [(r["doc_id"], r["kw_rank"], r["vec_rank"], r["rrf"],
             r["rank"])
            for r in hybrid_rrf(docs, embs, QUERY, query_vec_id=0,
                                n=20, k=10).orderBy("rank").collect()]
    assert got == want
    # both drains really crossed micro-batches
    for t in ("hyb_stream_t1_kw", "hyb_stream_t1_vec"):
        seqs = {r["seq"] for r in
                spark.table(t).select("seq").collect()}
        assert len(seqs) >= 2, (t, seqs)


def _one_file(df, stage_dir, dest_dir, name, mtime):
    """Write df as ONE parquet file named ``name`` under dest_dir
    with a controlled mtime — FileStreamSource processes oldest
    first, so ascending mtimes pin the micro-batch ORDER and make
    'the first s micro-batches' a known file prefix."""
    import glob
    import os
    import shutil
    stage = os.path.join(
        stage_dir, f"__stage_{os.path.basename(dest_dir)}_{name}")
    df.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(dest_dir, exist_ok=True)
    dst = os.path.join(dest_dir, name)
    shutil.copyfile(part, dst)
    os.utime(dst, (mtime, mtime))


def test_hybrid_per_emit_fusion_equals_prefix(docs, embs, spark,
                                              tmp_path):
    """Pins the per-emit fusion claim in hybrid_stream_topk's
    docstring (VERDICT r10 #4): an INTERMEDIATE (seq_kw, seq_vec)
    pair read back from the two memory sinks, fused with the same
    ``_rrf_fuse``, equals the fusion of leaderboards batch-computed
    over exactly the file prefixes those micro-batches drained —
    i.e. every intermediate emit is the true hybrid result as of
    its prefix, not just the final one."""
    from metacat_spark.llm.search import (_bm25_ref_stats,
                                          _dedupe_terms,
                                          _fetch_query_vec,
                                          _rowlocal_bm25, _rrf_fuse,
                                          cosine,
                                          hybrid_stream_topk)
    import time as _time
    base = _time.time() - 600
    dsrc, esrc = str(tmp_path / "pfx_docs"), str(tmp_path / "pfx_embs")
    # 3 files each, doc_id % 3 split, mtime-ordered → prefix-known
    dparts = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    eparts = [embs.where(F.col("vec_id") % 3 == i) for i in range(3)]
    for i in range(3):
        _one_file(dparts[i], str(tmp_path), dsrc,
                  f"f{i}.parquet", base + 10 * i)
        _one_file(eparts[i], str(tmp_path), esrc,
                  f"f{i}.parquet", base + 10 * i)
    n, k = 20, 10
    hybrid_stream_topk(
        spark, dsrc, esrc, QUERY, query_vec_id=0, stats_from=docs,
        query_from=embs, n=n, k=k, max_files_per_trigger=1,
        table="hyb_emit_t1").collect()
    kw_sink = spark.table("hyb_emit_t1_kw")
    vec_sink = spark.table("hyb_emit_t1_vec")
    assert ({r["seq"] for r in kw_sink.select("seq").collect()}
            == {1, 2, 3})
    # intermediate pair: kw after 2 micro-batches, vec after 1
    got = [tuple(r) for r in _rrf_fuse(
        kw_sink.where(F.col("seq") == 2)
        .select(F.col("doc_id").alias("id"),
                F.col("rank").alias("kw_rank")),
        vec_sink.where(F.col("seq") == 1)
        .select("id", F.col("rank").alias("vec_rank")),
        60, k, "doc_id").orderBy("rank").collect()]
    # expected: batch leaderboards over the drained prefixes, using
    # the streaming rankers' own scoring (full-corpus ref stats for
    # BM25; the stored query vector as a literal for cosine)
    terms = _dedupe_terms(QUERY)
    ref = _bm25_ref_stats(docs.select(F.col("text").alias("text")),
                          terms)
    kw_prefix = dparts[0].unionAll(dparts[1])
    kw_top = (_rowlocal_bm25(kw_prefix, terms, ref, 1.2, 0.75,
                             "text", "doc_id")
              .where((F.col("score") > 0)
                     & F.col("doc_id").isNotNull())
              .orderBy(F.col("score").desc(), "doc_id").limit(n))
    kw_exp = kw_top.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(
            Window.orderBy(F.col("score").desc(),
                           "doc_id")).alias("kw_rank"))
    qv = _fetch_query_vec(embs, 0, "embedding", "vec_id", "t")
    qvec = F.array(*[F.lit(x) for x in qv])
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_top = (eparts[0]
               .select(F.col("vec_id").alias("id"),
                       F.round(cosine(v, qvec), 6).alias("cosine"))
               .where(F.col("id").isNotNull() & (F.col("id") != 0)
                      & F.col("cosine").isNotNull()
                      & ~F.isnan(F.col("cosine")))
               .orderBy(F.col("cosine").desc(), "id").limit(n))
    vec_exp = vec_top.select(
        "id", F.row_number().over(
            Window.orderBy(F.col("cosine").desc(),
                           "id")).alias("vec_rank"))
    want = [tuple(r) for r in _rrf_fuse(kw_exp, vec_exp, 60, k,
                                        "doc_id")
            .orderBy("rank").collect()]
    assert got == want and got


def test_fetch_query_vec_null_elements_raise(spark):
    """A stored query vector with NULL elements is a loud ValueError
    (→ OpError 400 on the surfaces), not float(None) → TypeError →
    opaque 500 (ADVICE r10)."""
    from metacat_spark.llm.search import _fetch_query_vec
    df = spark.createDataFrame(
        [(0, [1.0, None, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="NULL elements"):
        _fetch_query_vec(df, 0, "embedding", "vec_id", "t")
    assert _fetch_query_vec(df, 1, "embedding", "vec_id", "t") == \
        [1.0, 2.0, 3.0]


# -------------------------------------------------------------- DSIR

def test_dsir_logweights_vs_duck(docs, duck):
    raw = docs.where(F.col("source") != "src0")
    tgt = docs.where(F.col("source") == "src0")
    got = {r["doc_id"]: (r["n_feats"], r["dsir_logw"])
           for r in dsir_logweights(raw, tgt, buckets=256).collect()}
    want = {r[0]: (r[1], r[2])
            for r in duck.execute(DSIR_SQL).fetchall()}
    assert got == want


def test_dsir_resample_laws(docs):
    raw = docs.where(F.col("source") != "src0")
    tgt = docs.where(F.col("source") == "src0")
    sel = dsir_resample(raw, tgt, m=12, buckets=256,
                        seed=7).orderBy("rank").collect()
    assert len(sel) == 12
    weights = {r["doc_id"]: r["dsir_logw"]
               for r in dsir_logweights(raw, tgt, buckets=256)
               .collect()}
    prev_key = None
    for r in sel:
        # selected ids are scored docs with their exact weight
        assert weights[r["doc_id"]] == r["dsir_logw"]
        # Gumbel key recomputed in pure Python: u from the SQUARED
        # rolling hash of "id#seed" (squaring decorrelates adjacent
        # ids), key = logw − ln(−ln u)
        h = _py_poly_hash(f"{r['doc_id']}#7")
        u = ((h * h) % POLY_MOD + 1) / float(POLY_MOD + 1)
        expect = r["dsir_logw"] - math.log(-math.log(u))
        assert abs(r["gumbel_key"] - expect) < 1e-4
        key = (-r["gumbel_key"], r["doc_id"])
        assert prev_key is None or prev_key < key
        prev_key = key
    # determinism: the same seed reproduces the selection exactly
    again = dsir_resample(raw, tgt, m=12, buckets=256,
                          seed=7).orderBy("rank").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in sel]
    # a different seed reshuffles the noise (selection may overlap,
    # but the keys must differ)
    other = dsir_resample(raw, tgt, m=12, buckets=256,
                          seed=8).orderBy("rank").collect()
    assert {r["gumbel_key"] for r in other} != \
        {r["gumbel_key"] for r in sel}


def test_dsir_stream_equals_batch(docs, spark):
    """Streaming DSIR with models from the same raw/target split must
    reproduce the batch weights for every streamed raw doc (target
    docs stream too but score under the same map — restrict the
    compare to the raw pool, which is what batch scores)."""
    from conftest import SF_DIR

    from metacat_spark.llm.text import dsir_stream
    raw = docs.where(F.col("source") != "src0")
    tgt = docs.where(F.col("source") == "src0")
    batch = {r["doc_id"]: (r["n_feats"], r["dsir_logw"])
             for r in dsir_logweights(raw, tgt, buckets=256)
             .collect()}
    streamed = {r["doc_id"]: (r["n_feats"], r["dsir_logw"])
                for r in dsir_stream(
                    spark, f"{SF_DIR}/documents.parquet", raw, tgt,
                    buckets=256, table="dsir_stream_t1").collect()}
    assert set(batch) <= set(streamed)
    for d, (nf, w) in batch.items():
        snf, sw = streamed[d]
        assert snf == nf and abs(sw - w) <= 1e-6, (d, (nf, w),
                                                   (snf, sw))
    # empty reference is a clean error
    with pytest.raises(ValueError, match="no bigrams"):
        dsir_stream(spark, f"{SF_DIR}/documents.parquet",
                    raw.where("doc_id < 0"), tgt, buckets=64,
                    table="dsir_stream_t2")


def test_dsir_gumbel_noise_decorrelates_adjacent_ids(docs):
    """With raw == target every weight is exactly 0, so selection is
    pure noise — it must look like a random sample, not a consecutive
    id run (regression: the UNSQUARED rolling hash moved only ~31^k
    for a one-digit id change, so 'random' selection returned
    499, 498, 497, ...)."""
    sel = dsir_resample(docs, docs, m=12, buckets=256,
                        seed=42).orderBy("rank").collect()
    assert all(r["dsir_logw"] == 0.0 for r in sel)
    ids = [r["doc_id"] for r in sel]
    gaps = [abs(a - b) for a, b in zip(ids, ids[1:])]
    # a consecutive run has every gap == 1; a uniform sample of 12
    # from 500 ids virtually never has even one adjacent pair
    assert sum(g == 1 for g in gaps) <= 2, ids


def test_ivf_prebuilt_index_matches_inline_training(embs, tmp_path,
                                                    spark):
    """Train-once/serve-many: ivf_topk fed a parquet-round-tripped
    centroid table from build_ivf_centroids must return EXACTLY the
    inline-trained results (r9)."""
    from metacat_spark.llm.similarity import (build_ivf_centroids,
                                              ivf_topk)
    inline = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_topk(embs, k=3, n_lists=8, n_probe=2,
                                train_iters=2).collect()}
    idx = build_ivf_centroids(embs, n_lists=8, train_iters=2)
    path = str(tmp_path / "ivf_index")
    idx.write.parquet(path)
    served = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_topk(embs, k=3, n_probe=2,
                                centroids=spark.read.parquet(path))
              .collect()}
    assert served == inline
    # the artifact itself: n_lists unit-norm centroid rows
    rows = idx.collect()
    assert len(rows) == 8
    import math
    for r in rows:
        nrm = math.sqrt(sum(x * x for x in r["centroid"]))
        assert abs(nrm - 1.0) < 1e-9


def test_ivf_malformed_centroids_clean_errors(embs):
    """ivf_topk(centroids=) must reject malformed artifacts with
    ValueError (→ clean OpError on the surfaces), matching the
    ivfpq decoder's contract (review r9b)."""
    from metacat_spark.llm.similarity import ivf_topk
    spark = embs.sparkSession
    with pytest.raises(ValueError, match="columns"):
        ivf_topk(embs, centroids=embs)
    empty = spark.createDataFrame(
        [], "list_id int, centroid array<double>")
    with pytest.raises(ValueError, match="empty"):
        ivf_topk(embs, centroids=empty)
    mixed = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0, 0.0])],
        "list_id int, centroid array<double>")
    with pytest.raises(ValueError, match="dimension"):
        ivf_topk(embs, centroids=mixed)


def test_ivfpq_prebuilt_index_matches_inline_training(embs, tmp_path,
                                                      spark):
    """Same train-once/serve-many pin for the billion-scale path:
    ivf_pq_topk fed a parquet-round-tripped build_ivfpq_index table
    must return EXACTLY the inline-trained results, with m/n_codes
    derived from the artifact (r9)."""
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              ivf_pq_topk)
    inline = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_pq_topk(embs, k=3, n_lists=8, n_probe=2,
                                   m=8, n_codes=16,
                                   train_iters=1).collect()}
    idx = build_ivfpq_index(embs, n_lists=8, m=8, n_codes=16,
                            train_iters=1)
    path = str(tmp_path / "ivfpq_index")
    idx.write.parquet(path)
    served = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_pq_topk(embs, k=3, n_probe=2,
                                   index=spark.read.parquet(path))
              .collect()}
    assert served == inline
    # malformed artifacts are clean errors, not wrong answers
    with pytest.raises(ValueError, match="centroid or codebook"):
        ivf_pq_topk(embs, index=idx.where("kind = 'centroid'"))
    with pytest.raises(ValueError, match="columns"):
        ivf_pq_topk(embs, index=embs)


def test_ivfpq_encode_search_add_roundtrip(embs, tmp_path, spark):
    """The r10 production triad: build once (build_ivfpq_index), add
    incrementally (encode_ivfpq + parquet append), serve many
    (ivf_pq_search) — plus the distortion staleness gauge.

    1. postings assembled by TWO separate encode+append calls (the
       add path) serve EXACTLY what ivf_pq_topk(index=) returns;
    2. appended vectors really are queryable (returned as neighbors);
    3. the gauge reads ~1 on in-distribution data and degrades to a
       NULL baseline on a pre-r10 artifact without the stat row."""
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              encode_ivfpq,
                                              ivf_pq_search,
                                              ivf_pq_topk,
                                              ivfpq_distortion)
    idx = build_ivfpq_index(embs, n_lists=8, m=8, n_codes=16,
                            train_iters=1)
    ipath = str(tmp_path / "ivfpq_idx")
    idx.write.parquet(ipath)
    index = spark.read.parquet(ipath)
    ppath = str(tmp_path / "postings")
    encode_ivfpq(embs.where("vec_id % 2 = 0"),
                 index).write.parquet(ppath)
    encode_ivfpq(embs.where("vec_id % 2 = 1"),
                 index).write.mode("append").parquet(ppath)
    postings = spark.read.parquet(ppath)
    assert postings.count() == embs.count()
    served = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_pq_search(embs, postings, index, k=3,
                                     n_probe=2).collect()}
    inline = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_pq_topk(embs, k=3, n_probe=2,
                                   index=index).collect()}
    assert served == inline and served
    # the appended (odd-id) half is genuinely queryable: some
    # neighbors come from it
    odd = {r["vec_id"]
           for r in embs.where("vec_id % 2 = 1")
           .select("vec_id").collect()}
    assert any(nb in odd for nb, _ in served.values())
    # staleness gauge: same distribution as training ⇒ ratio ≈ 1
    row = ivfpq_distortion(embs, index).collect()[0]
    assert row["n"] == embs.count()
    assert row["build_distortion"] is not None
    assert row["mean_distortion"] >= 0
    assert row["distortion_ratio"] is not None
    assert 0.5 < row["distortion_ratio"] < 2.0, row
    # pre-r10 artifact (no stat row): serving works, baseline NULL
    old = index.where("kind <> 'stat'")
    row2 = ivfpq_distortion(embs, old).collect()[0]
    assert row2["build_distortion"] is None
    assert row2["distortion_ratio"] is None
    # rerank without stored vectors errors inside the scoring task
    # (no driver pre-scan of the postings on the healthy path —
    # review r10); the library message survives the Py4J wrap
    from pyspark.sql import functions as SF
    novec = postings.withColumn(
        "vec", SF.lit(None).cast("array<double>"))
    with pytest.raises(Exception, match="keep_vectors"):
        ivf_pq_search(embs, novec, index, k=3).count()
    # ... and codes-only postings DO serve with rerank=False
    adc = ivf_pq_search(embs, novec, index, k=3, n_probe=2,
                        rerank=False)
    assert adc.count() > 0
    # malformed postings (wrong columns) are clean errors
    with pytest.raises(ValueError, match="columns"):
        ivf_pq_search(embs, embs, index, k=3)


def test_ivfpq_retire_compact_lifecycle(embs, tmp_path, spark):
    """Index CRUD (VERDICT r10 #5): retire appends tombstones,
    search immediately excludes the retired members, compaction
    physically removes dead rows + tombstones while preserving
    search results EXACTLY, and the per-list stats expose which
    lists are dirty."""
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              compact_postings,
                                              encode_ivfpq,
                                              ivf_pq_search,
                                              postings_tombstone_stats,
                                              retire_vectors)
    idx = build_ivfpq_index(embs, n_lists=8, m=8, n_codes=16,
                            train_iters=1)
    ppath = str(tmp_path / "lc_postings")
    encode_ivfpq(embs, idx).write.parquet(ppath)
    postings = spark.read.parquet(ppath)
    victims = [r["vec_id"] for r in
               embs.select("vec_id").orderBy("vec_id")
               .limit(5).collect()]
    # the delete is O(delta): tombstones APPEND to the stored table
    retire_vectors(postings, victims).write.mode("append") \
        .parquet(ppath)
    tombstoned = spark.read.parquet(ppath)
    assert tombstoned.where("codes is null").count() == 5
    # delete-then-search: retired members never appear as neighbors
    res = ivf_pq_search(embs, tombstoned, idx, k=3,
                        n_probe=2).collect()
    assert res and not ({r["neighbor_id"] for r in res}
                        & set(victims))
    # retiring an unknown id is an idempotent no-op
    assert retire_vectors(tombstoned, [999999123]).count() == 0
    # re-running the SAME retire batch appends nothing (the lookup
    # goes through live_postings, so already-dead members don't
    # double-tombstone and n_dead never inflates — review r11)
    assert retire_vectors(tombstoned, victims).count() == 0
    stats = postings_tombstone_stats(tombstoned)
    assert stats.agg(F.sum("n_dead")).collect()[0][0] == 5
    assert stats.where("tombstone_ratio > 0").count() >= 1
    # compaction: dead rows and tombstones gone, results identical
    compacted = compact_postings(tombstoned)
    assert compacted.count() == embs.count() - 5
    assert compacted.where("codes is null").count() == 0
    res2 = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
            for r in ivf_pq_search(embs, compacted, idx, k=3,
                                   n_probe=2).collect()}
    res1 = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
            for r in res}
    assert res1 == res2
    # a threshold above every list's ratio rewrites nothing
    untouched = compact_postings(tombstoned, min_ratio=0.99)
    assert untouched.count() == tombstoned.count()


def test_index_health_recommendations_flip(docs, embs, spark):
    """The rebuild-decision verb (VERDICT r11 #4): a fresh index on
    in-distribution data reads ok; heavy tombstoning flips the
    recommendation to compact; out-of-distribution data flips it to
    rebuild (which outranks compact); should_rebuild mirrors it."""
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              encode_ivfpq,
                                              hashed_doc_vectors,
                                              index_health,
                                              retire_vectors,
                                              should_rebuild)
    idx = build_ivfpq_index(embs, n_lists=8, m=8, n_codes=16,
                            train_iters=1)
    postings = encode_ivfpq(embs, idx)
    row = index_health(embs, postings, idx,
                       balance_threshold=10.0).collect()[0]
    assert row["recommendation"] == "ok", row
    assert row["n_dead"] == 0 and row["tombstone_ratio"] == 0.0
    assert 0.5 < row["distortion_ratio"] < 1.5
    assert row["n_lists_total"] == 8
    assert row["n_sampled"] == embs.count()
    assert not should_rebuild(embs, postings, idx,
                              balance_threshold=10.0)
    # retire 30% of the corpus → tombstone load says compact
    victims = [r["vec_id"] for r in
               embs.select("vec_id").orderBy("vec_id")
               .limit(embs.count() * 3 // 10).collect()]
    tomb = postings.unionByName(retire_vectors(postings, victims))
    crow = index_health(embs, tomb, idx,
                        balance_threshold=10.0).collect()[0]
    assert crow["recommendation"] == "compact", crow
    assert crow["tombstone_ratio"] > 0.2
    assert crow["n_lists_dirty"] >= 1
    # out-of-distribution gauge frame (hashed doc vectors measure
    # 1.13× the build distortion — deterministic) → rebuild once the
    # ratio crosses the operator's threshold, even on the tombstoned
    # table (severity order: rebuild outranks compact)
    ood = hashed_doc_vectors(docs, dim=len(
        embs.first()["embedding"]))
    rrow = index_health(ood, tomb, idx, vec_col="vector",
                        id_col="doc_id",
                        distortion_threshold=1.1,
                        balance_threshold=10.0).collect()[0]
    assert rrow["recommendation"] == "rebuild", rrow
    assert rrow["distortion_ratio"] > 1.1
    assert should_rebuild(ood, tomb, idx, vec_col="vector",
                          id_col="doc_id", distortion_threshold=1.1,
                          balance_threshold=10.0)


def test_encode_ivfpq_stream_equals_batch(embs, tmp_path, spark):
    """Streaming postings ingest (VERDICT r10 #4): stream-ingested
    postings are row-for-row the batch encode of the same corpus
    (same row-local kernel), the staleness gauge is queryable PER
    micro-batch, and ivf_pq_search over the streamed postings equals
    the inline index serve."""
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              encode_ivfpq,
                                              encode_ivfpq_stream,
                                              ivf_pq_search,
                                              ivf_pq_topk)
    idx = build_ivfpq_index(embs, n_lists=8, m=8, n_codes=16,
                            train_iters=1)
    src = str(tmp_path / "ing_src")
    embs.repartition(3).write.parquet(src)
    pdir = str(tmp_path / "ing_postings")
    gauge = encode_ivfpq_stream(spark, src, idx, pdir,
                                max_files_per_trigger=1)
    grows = gauge.orderBy("batch_id").collect()
    assert len(grows) >= 2                # crossed micro-batches
    assert sum(r["n"] for r in grows) == embs.count()
    # in-distribution data: every batch's ratio reads ~1
    assert all(r["distortion_ratio"] is not None
               and 0.3 < r["distortion_ratio"] < 3.0 for r in grows)
    streamed = spark.read.parquet(pdir)

    def key(r):
        return (r["lst"], r["id"], tuple(r["codes"]),
                tuple(r["vec"]))
    assert (sorted(map(key, streamed.collect()))
            == sorted(map(key, encode_ivfpq(embs, idx).collect())))
    served = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_pq_search(embs, streamed, idx, k=3,
                                     n_probe=2).collect()}
    inline = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_pq_topk(embs, k=3, n_probe=2,
                                   index=idx).collect()}
    assert served == inline and served


def test_corpus_diff_statuses(spark):
    """All four statuses on a hand-built pair of snapshots; text
    never needs to match — only the fingerprint decides."""
    from metacat_spark.llm.pipeline import corpus_diff
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "goes away")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added"}
    out = corpus_diff(old, new).collect()
    for r in out:
        assert (r["old_fp"] is None) == (r["status"] == "added")
        assert (r["new_fp"] is None) == (r["status"] == "removed")


# -------------------------------------------------------- plan shape

def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_bm25_plan_is_takeordered_not_global_sort(docs):
    """Top-k keyword search must plan TakeOrderedAndProject (heap +
    merge of k rows), never a corpus-wide Sort, and the 1-row stats
    join must be a broadcast."""
    plan = _plan(search_bm25(docs, QUERY, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats × corpus


def test_dsir_plan_broadcasts_bucket_tables(docs):
    """DSIR's bucket-count model tables are bounded by `buckets` —
    they must broadcast; nothing may plan a cartesian product."""
    raw = docs.where(F.col("source") != "src0")
    tgt = docs.where(F.col("source") == "src0")
    plan = _plan(dsir_logweights(raw, tgt, buckets=256))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    plan2 = _plan(dsir_resample(raw, tgt, m=10, buckets=256))
    assert "TakeOrderedAndProject" in plan2


def test_opq_rotation_improves_distortion_and_roundtrips(tmp_path,
                                                         spark):
    """OPQ (r11, Ge et al. 2013): on vectors whose variance is
    CORRELATED across subspace boundaries —

    1. the learned rotation is orthogonal (R·Rᵀ = I);
    2. the build-time distortion recorded in the artifact is
       strictly below plain PQ's on the same data/params (the whole
       point of rotating);
    3. the artifact parquet-round-trips and the full triad shares
       one kernel: ivf_pq_topk(index=) == ivf_pq_search over
       encode_ivfpq postings, row-for-row, rotation applied
       transparently by every verb;
    4. the staleness gauge measures in rotated space (ratio ≈ 1 on
       in-distribution data);
    5. plain artifacts carry no rotation rows and decode to the
       identity path (generations interoperate)."""
    import numpy as np

    from metacat_spark.llm.similarity import (_decode_ivfpq_index,
                                              build_ivfpq_index,
                                              encode_ivfpq,
                                              ivf_pq_search,
                                              ivf_pq_topk,
                                              ivfpq_distortion)
    rng = np.random.default_rng(7)
    # 8-dim, m=4 (2-dim subspaces): dims 2i+1 echo dims 2i across
    # subspace boundaries -> a correlated covariance PQ handles
    # badly and an orthogonal rotation fixes
    U = rng.normal(size=(400, 4))
    X = np.empty((400, 8))
    X[:, 0::2] = U
    X[:, 1::2] = np.roll(U, 1, axis=1) + 0.05 * rng.normal(
        size=(400, 4))
    corr = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>")

    def build_dist(idx):
        r = idx.where("kind = 'stat'").collect()[0]
        return r["vector"][0]

    plain = build_ivfpq_index(corr, n_lists=4, m=4, n_codes=8,
                              sample_size=400)
    opq = build_ivfpq_index(corr, n_lists=4, m=4, n_codes=8,
                            sample_size=400, opq_iters=6)
    _cn, _cb, rt_none = _decode_ivfpq_index(plain)
    assert rt_none is None
    assert plain.where("kind = 'rotation'").count() == 0
    _cn, _cb, Rt = _decode_ivfpq_index(opq)
    assert Rt is not None and Rt.shape == (8, 8)
    assert np.allclose(Rt @ Rt.T, np.eye(8), atol=1e-9)
    assert build_dist(opq) < build_dist(plain), (
        build_dist(opq), build_dist(plain))

    ipath = str(tmp_path / "opq_idx")
    opq.write.parquet(ipath)
    index = spark.read.parquet(ipath)
    _cn, _cb, Rt2 = _decode_ivfpq_index(index)
    assert np.allclose(Rt2, Rt)
    ppath = str(tmp_path / "opq_postings")
    encode_ivfpq(corr, index).write.parquet(ppath)
    postings = spark.read.parquet(ppath)
    served = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_pq_search(corr, postings, index, k=3,
                                     n_probe=2).collect()}
    inline = {(r["id"], r["rank"]): (r["neighbor_id"], r["cosine"])
              for r in ivf_pq_topk(corr, k=3, n_probe=2,
                                   index=index).collect()}
    assert served == inline and served
    row = ivfpq_distortion(corr, index).collect()[0]
    assert row["n"] == 400
    assert 0.5 < row["distortion_ratio"] < 2.0, row
    # a truncated rotation is a clean error, not silent identity
    broken = index.where("not (kind = 'rotation' and i = 3)")
    with pytest.raises(ValueError, match="rotation"):
        ivf_pq_topk(corr, k=3, index=broken)


def test_ann_recall_gauge(embs):
    """ann_recall: exact-vs-exact is perfect recall; an approximate
    method lands in (0, 1]; the macro stats expose a query that got
    nothing (recall accounting replayed by hand on a crippled
    result)."""
    from pyspark.sql import functions as SF

    from metacat_spark.llm.similarity import (ann_recall,
                                              lsh_bucketed_topk,
                                              topk_gemm)
    exact = topk_gemm(embs, k=3)
    row = ann_recall(exact, exact).collect()[0]
    n_q = exact.select("id").distinct().count()
    assert row["n_queries"] == n_q
    assert row["n_pairs"] == row["n_hits"] == exact.count()
    assert row["recall"] == 1.0
    assert row["mean_query_recall"] == 1.0
    assert row["min_query_recall"] == 1.0
    approx = lsh_bucketed_topk(embs, k=3)
    arow = ann_recall(approx, exact).collect()[0]
    assert 0.0 < arow["recall"] <= 1.0
    assert arow["n_hits"] <= arow["n_pairs"]
    # cripple one query: drop every result row for the first id —
    # min_query_recall must hit 0 while micro recall stays high
    first = exact.select("id").orderBy("id").first()["id"]
    crippled = exact.where(SF.col("id") != first)
    crow = ann_recall(crippled, exact).collect()[0]
    assert crow["min_query_recall"] == 0.0
    assert crow["n_queries"] == n_q            # truth defines the set
    assert crow["recall"] == pytest.approx(
        (row["n_pairs"] - 3) / row["n_pairs"], abs=1e-6)


def test_topk_gemm_vs_separate_corpus(embs, spark):
    """topk_gemm_vs: queries ranked against a SEPARATE corpus.
    Against the full corpus it equals topk_gemm (self-join) exactly;
    against a half corpus every neighbor comes from that half — the
    served-ANN ground truth shape (ADVICE r11)."""
    from metacat_spark.llm.similarity import topk_gemm, topk_gemm_vs
    self_join = sorted(tuple(r) for r in topk_gemm(embs, k=3)
                       .collect())
    vs_full = sorted(tuple(r) for r in topk_gemm_vs(embs, embs, k=3)
                     .collect())
    assert vs_full == self_join and vs_full
    half = embs.where("vec_id % 2 = 0")
    vs_half = topk_gemm_vs(embs, half, k=3).collect()
    assert vs_half
    assert all(r["neighbor_id"] % 2 == 0 for r in vs_half)
    # mask_self=True: a query never retrieves its own stored row
    assert all(r["id"] != r["neighbor_id"] for r in vs_half)
    # mask_self=False: an even query's best neighbor IS itself
    vs_ext = {(r["id"], r["rank"]): r["neighbor_id"]
              for r in topk_gemm_vs(embs, half, k=1,
                                    mask_self=False).collect()}
    even = [r["vec_id"] for r in half.select("vec_id").collect()]
    assert all(vs_ext[(i, 1)] == i for i in even)


def test_served_recall_truth_is_the_postings_corpus(embs, tmp_path,
                                                    spark):
    """The served-ANN recall gauge must grade against the members
    actually served — the stored postings — not the query frame
    (ADVICE r11): with postings = half the corpus and an exhaustive
    serve, recall vs the postings truth is 1.0, while a self-join
    truth would penalize every neighbor missing from the postings."""
    from metacat_spark.llm.similarity import (ann_recall,
                                              build_ivfpq_index,
                                              encode_ivfpq,
                                              ivf_pq_search,
                                              topk_gemm, topk_gemm_vs)
    idx = build_ivfpq_index(embs, n_lists=4, m=8, n_codes=16,
                            train_iters=1)
    half = embs.where("vec_id % 2 = 0")
    postings = encode_ivfpq(half, idx)
    served = ivf_pq_search(embs, postings, idx, k=3, n_probe=4,
                           shortlist=10 ** 6)
    truth = topk_gemm_vs(
        embs, half.select(F.col("vec_id"), F.col("embedding")), k=3)
    row = ann_recall(served, truth).collect()[0]
    assert row["recall"] == 1.0, row
    # the self-join truth really is the wrong corpus here
    wrong = ann_recall(served, topk_gemm(embs, k=3)).collect()[0]
    assert wrong["recall"] < 1.0


def test_text_index_build_serve_extend(docs, spark, tmp_path):
    """The keyword-search train-once/serve-many triad (r11):

    1. serve-from-index == search_bm25 row-for-row (scores pivoted
       into columns and summed in the batch scorer's term order —
       identical float sequence), through a parquet round-trip;
    2. extend(build(A), B) serves EXACTLY like build(A ∪ B) (df and
       stat sums are integer-valued doubles — associative), and its
       postings equal the full rebuild's as a set;
    3. unknown terms / malformed artifacts / empty queries are clean
       errors or empty results, never wrong answers."""
    from metacat_spark.llm.search import (build_text_index,
                                          extend_text_index,
                                          search_bm25,
                                          search_text_index)
    terms = ["spark", "window", "merge"]
    idx = build_text_index(docs)
    path = str(tmp_path / "text_idx")
    idx.write.parquet(path)
    stored = spark.read.parquet(path)
    for q in (terms, ["spark"], ["the", "data"]):
        served = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
                  for r in search_text_index(stored, q, k=10)
                  .collect()]
        batch = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
                 for r in search_bm25(docs, q, k=10).collect()]
        assert served == batch and served, q
    # unknown term contributes nothing; all-unknown query matches
    # nothing (score 0 everywhere)
    assert search_text_index(stored, ["zzznotaword"], k=5) \
        .count() == 0
    both = [(r["doc_id"], r["score"]) for r in search_text_index(
        stored, ["spark", "zzznotaword"], k=10).collect()]
    only = [(r["doc_id"], r["score"]) for r in search_text_index(
        stored, ["spark"], k=10).collect()]
    assert both == only
    # incremental add: halves == full rebuild
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    ext = extend_text_index(build_text_index(a), b)
    full = build_text_index(docs)
    srv_ext = [(r["doc_id"], r["score"], r["rank"])
               for r in search_text_index(ext, terms, k=10)
               .collect()]
    srv_full = [(r["doc_id"], r["score"], r["rank"])
                for r in search_text_index(full, terms, k=10)
                .collect()]
    assert srv_ext == srv_full and srv_ext
    post_ext = {(r["term"], r["id"], r["tf"], r["dl"])
                for r in ext.where("kind = 'post'").collect()}
    post_full = {(r["term"], r["id"], r["tf"], r["dl"])
                 for r in full.where("kind = 'post'").collect()}
    assert post_ext == post_full
    dfs_ext = {(r["term"], r["tf"])
               for r in ext.where("kind = 'df'").collect()}
    dfs_full = {(r["term"], r["tf"])
                for r in full.where("kind = 'df'").collect()}
    assert dfs_ext == dfs_full
    # malformed artifact / empty query are clean errors
    with pytest.raises(ValueError, match="columns"):
        search_text_index(docs, terms)
    with pytest.raises(ValueError, match="at least one"):
        search_text_index(stored, [""])


def test_hybrid_from_indexes_equals_batch(docs, embs, spark,
                                          tmp_path):
    """Served hybrid == batch hybrid_rrf when the vector side is
    exhaustive: text index from the corpus, IVF-PQ postings encoding
    every embedding EXCEPT the query's own row (cosine_topn excludes
    it), n_probe = n_lists, rerank=True. Both artifacts
    parquet-round-tripped."""
    from metacat_spark.llm.search import (build_text_index,
                                          hybrid_from_indexes,
                                          hybrid_rrf)
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              encode_ivfpq)
    terms = ["spark", "window", "merge"]
    tpath = str(tmp_path / "h_tidx")
    build_text_index(docs).write.parquet(tpath)
    vidx = build_ivfpq_index(embs, n_lists=8, m=8, n_codes=16,
                             train_iters=1)
    vpath = str(tmp_path / "h_vidx")
    vidx.write.parquet(vpath)
    ppath = str(tmp_path / "h_posts")
    encode_ivfpq(embs.where("vec_id <> 0"),
                 spark.read.parquet(vpath)).write.parquet(ppath)
    qvec = [float(x) for x in embs.where("vec_id = 0")
            .first()["embedding"]]
    served = [(r["doc_id"], r["kw_rank"], r["vec_rank"], r["rrf"],
               r["rank"])
              for r in hybrid_from_indexes(
                  spark, spark.read.parquet(tpath),
                  spark.read.parquet(ppath),
                  spark.read.parquet(vpath), terms, qvec,
                  n=20, k=10, n_probe=8).collect()]
    batch = [(r["doc_id"], r["kw_rank"], r["vec_rank"], r["rrf"],
              r["rank"])
             for r in hybrid_rrf(docs, embs, terms, 0,
                                 n=20, k=10).collect()]
    assert served == batch and served


def test_hybrid_from_indexes_member_id_minus_one(spark, tmp_path):
    """A corpus legitimately containing member ids -1 and 0 must rank
    those members: the served query is EXTERNAL to the postings, so
    the self-pair mask is off (exclude_self=False) and no in-band
    sentinel id exists to collide with (VERDICT r11 #3 / ADVICE
    r11 — the old -1 sentinel silently dropped a real member -1)."""
    import numpy as np
    from metacat_spark.llm.search import (build_text_index,
                                          hybrid_from_indexes)
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              encode_ivfpq)
    rng = np.random.RandomState(7)
    ids = [-1, 0, 1, 2, 3, 4, 5, 6]
    vecs = rng.randn(len(ids), 8).round(3)
    ddf = spark.createDataFrame(
        [(i, f"doc {i} spark merge window token{i}") for i in ids],
        "doc_id long, text string")
    edf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>")
    tpath = str(tmp_path / "m1_tidx")
    build_text_index(ddf).write.parquet(tpath)
    vidx = build_ivfpq_index(edf, n_lists=2, m=4, n_codes=4,
                             train_iters=1)
    vpath = str(tmp_path / "m1_vidx")
    vidx.write.parquet(vpath)
    ppath = str(tmp_path / "m1_posts")
    encode_ivfpq(edf, spark.read.parquet(vpath)).write.parquet(ppath)
    qvec = [float(x) for x in vecs[0]]     # exactly member -1's vector
    res = hybrid_from_indexes(
        spark, spark.read.parquet(tpath), spark.read.parquet(ppath),
        spark.read.parquet(vpath), ["spark"], qvec,
        n=8, k=8, n_probe=2).collect()
    got = {r["doc_id"]: r["vec_rank"] for r in res}
    assert -1 in got and got[-1] == 1      # its own vector ranks first
    assert 0 in got                        # qid 0 never masks member 0


def test_det_shortlist_matches_lexsort_spec():
    """The argpartition + boundary-tie-repair shortlist returns the
    SAME SET as the lexsort spec (score desc, neighbor-rank asc,
    truncate to rr) — an optimization, not a semantics change
    (ADVICE r11). Coarse integer scores force many exact ties, the
    shared-PQ-code-tuple case that motivated determinism."""
    import numpy as np
    from metacat_spark.llm.similarity import _det_shortlist
    rng = np.random.RandomState(11)
    for trial in range(25):
        nq, nc = int(rng.randint(1, 6)), int(rng.randint(1, 40))
        adc = rng.randint(0, 4, size=(nq, nc)).astype(float)
        crank = rng.permutation(nc)
        rr = int(rng.randint(1, nc + 1))
        spec = np.lexsort((crank[None, :].repeat(nq, 0), -adc),
                          axis=1)[:, :rr]
        got = _det_shortlist(adc, crank, rr)
        assert got.shape == (nq, rr)
        for i in range(nq):
            assert set(got[i]) == set(spec[i]), (trial, i)


def test_search_text_index_many_equals_per_query(docs, spark,
                                                 tmp_path):
    """Batched serving (VERDICT r11 #6): one plan over the union of
    the queries' terms, pinned ROW-FOR-ROW equal to each query's own
    search_text_index serve — overlapping terms, partly-unknown and
    all-unknown queries included; loud on empty/duplicate input."""
    from metacat_spark.llm.search import (build_text_index,
                                          search_text_index,
                                          search_text_index_many)
    path = str(tmp_path / "many_idx")
    build_text_index(docs).write.parquet(path)
    stored = spark.read.parquet(path)
    batch = {
        "q1": ["spark", "window", "merge"],
        "q2": ["spark"],
        "q3": ["the", "data", "zzznotaword"],
        "q4": ["zzznotaword"],
    }
    many = search_text_index_many(stored, batch, k=10)
    got = {}
    for r in many.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["n_tokens"], r["score"]))
    for qid in got:
        got[qid].sort()
    for qid, terms in batch.items():
        want = [(r["rank"], r["doc_id"], r["n_tokens"], r["score"])
                for r in search_text_index(stored, terms, k=10)
                .orderBy("rank").collect()]
        assert got.get(qid, []) == want, qid
    assert got["q1"] and got["q2"] and got["q3"]
    assert "q4" not in got          # all-unknown matches nothing
    # pairs input form works; empty/duplicate input is loud
    pairs = search_text_index_many(stored,
                                   [("a", ["spark"])], k=3)
    assert pairs.count() == 3
    with pytest.raises(ValueError, match="at least one"):
        search_text_index_many(stored, {})
    with pytest.raises(ValueError, match="duplicate"):
        search_text_index_many(stored, [("a", ["x"]), ("a", ["y"])])


def test_text_index_truncated_artifact_is_loud(docs, spark):
    """A postings-only slice of a (kind-partitioned) index must be a
    clean ValueError at serve time, not silently empty results
    (review r11 — null stats previously nulled every score)."""
    from metacat_spark.llm.search import (build_text_index,
                                          search_text_index)
    idx = build_text_index(docs)
    with pytest.raises(ValueError, match="stat"):
        search_text_index(idx.where("kind = 'post'"), ["spark"])
    with pytest.raises(ValueError, match="stat"):
        search_text_index(idx.where("kind <> 'stat'"), ["spark"])


def test_text_index_shrink_is_exact_delete(docs, spark):
    """shrink(extend(build(A), B), B) == build(A) — postings, df and
    stats all exactly equal, and serve-after-shrink equals a fresh
    rebuild row-for-row (the CRUD symmetry verb)."""
    from metacat_spark.llm.search import (build_text_index,
                                          extend_text_index,
                                          search_bm25,
                                          search_text_index,
                                          shrink_text_index)
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    grown = extend_text_index(build_text_index(a), b)
    back = shrink_text_index(grown, b)
    fresh = build_text_index(a)
    for kind in ("post", "df", "stat"):
        got = {tuple(r) for r in
               back.where(f"kind = '{kind}'").collect()}
        want = {tuple(r) for r in
                fresh.where(f"kind = '{kind}'").collect()}
        assert got == want, kind
    terms = ["spark", "window", "merge"]
    srv = [(r["doc_id"], r["score"], r["rank"])
           for r in search_text_index(back, terms, k=10).collect()]
    scan = [(r["doc_id"], r["score"], r["rank"])
            for r in search_bm25(a, terms, k=10).collect()]
    assert srv == scan and srv


def _index_parts(idx):
    return {kind: {tuple(r) for r in
                   idx.where(f"kind = '{kind}'").collect()}
            for kind in ("post", "df", "stat", "doc")}


def test_text_index_upsert_is_exact_replace(docs, spark, tmp_path):
    """The REPLACE-or-ADD verb (VERDICT r11 #2):
    upsert(build(A ∪ B_old), B_new) ≡ build(A ∪ B_new) exactly —
    postings, df and stats; idempotent; ids new to the index degrade
    to a plain extend; re-add-then-serve equals a fresh rebuild
    through a parquet round trip."""
    from metacat_spark.llm.search import (build_text_index,
                                          search_bm25,
                                          search_text_index,
                                          upsert_text_index)
    a = docs.where("doc_id % 3 <> 0")
    b_old = docs.where("doc_id % 3 = 0")
    b_new = b_old.withColumn(
        "text", F.concat(F.col("text"), F.lit(" upserted marker")))
    idx = build_text_index(a.unionByName(b_old))
    up = upsert_text_index(idx, b_new)
    fresh = build_text_index(a.unionByName(b_new))
    assert _index_parts(up) == _index_parts(fresh)
    # idempotent: upserting the same docs again changes nothing
    assert _index_parts(upsert_text_index(up, b_new)) \
        == _index_parts(fresh)
    # ids NEW to the index degrade to extend
    assert _index_parts(upsert_text_index(build_text_index(a),
                                          b_new)) \
        == _index_parts(fresh)
    # an EMPTY upsert batch is an exact no-op (the empty build's
    # NULL sum_dl stat must coalesce, not TypeError — review r12)
    assert _index_parts(upsert_text_index(fresh,
                                          docs.where("doc_id < 0"))) \
        == _index_parts(fresh)
    # serve-after-upsert == fresh rebuild, through parquet
    path = str(tmp_path / "upsert_idx")
    up.write.parquet(path)
    terms = ["spark", "upserted", "marker"]
    srv = [(r["doc_id"], r["score"], r["rank"])
           for r in search_text_index(spark.read.parquet(path),
                                      terms, k=10).collect()]
    scan = [(r["doc_id"], r["score"], r["rank"])
            for r in search_bm25(a.unionByName(b_new), terms,
                                 k=10).collect()]
    assert srv == scan and srv


def test_text_index_stats_gauge(docs, spark):
    """The integrity gauge (VERDICT r11 #2): a healthy artifact is
    consistent; the documented corruption modes — a double-extend
    re-add and hand-dropped postings — are both caught."""
    from metacat_spark.llm.search import (build_text_index,
                                          extend_text_index,
                                          shrink_text_index,
                                          text_index_stats,
                                          upsert_text_index)
    idx = build_text_index(docs)
    row = text_index_stats(idx).collect()[0]
    assert row["consistent"], row
    assert row["n_df_mismatch"] == 0
    assert row["n_ids_inconsistent_dl"] == 0
    assert row["n_docs_stat"] == row["n_docs_postings"] > 0
    assert row["sum_dl_stat"] == row["sum_dl_postings"] > 0
    assert row["n_terms_df"] == row["n_terms_postings"] > 0
    # upsert/shrink outputs stay consistent
    half = docs.where("doc_id % 2 = 0")
    assert text_index_stats(upsert_text_index(idx, half)) \
        .collect()[0]["consistent"]
    assert text_index_stats(shrink_text_index(idx, half)) \
        .collect()[0]["consistent"]
    # double-extend (the re-add bug upsert exists to prevent):
    # n doubles in the stats but not in the distinct postings ids
    bad = extend_text_index(idx, docs)
    brow = text_index_stats(bad).collect()[0]
    assert not brow["consistent"]
    assert brow["n_docs_stat"] == 2 * brow["n_docs_postings"]
    # hand-dropped postings: df rows disagree with the postings
    first = docs.select(F.min("doc_id")).collect()[0][0]
    dropped = idx.where(f"not (kind = 'post' and id = {first})")
    drow = text_index_stats(dropped).collect()[0]
    assert not drow["consistent"] and drow["n_df_mismatch"] > 0


def test_text_index_append_is_extend_and_stream_build(docs, spark,
                                                      tmp_path):
    """r12 append-only algebra: parquet-appending build(B) onto a
    stored build(A) serves EXACTLY like build(A ∪ B) — serve SUMS
    the df/stat parts (exact: integer-valued doubles). The streaming
    build produces the same artifact semantics batch-by-batch;
    compact folds the parts with serve unchanged; the integrity
    gauge and the edit verbs handle multi-part artifacts."""
    from metacat_spark.llm.search import (build_text_index,
                                          build_text_index_stream,
                                          compact_text_index,
                                          search_bm25,
                                          search_text_index,
                                          search_text_index_many,
                                          text_index_stats,
                                          upsert_text_index)
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    path = str(tmp_path / "app_idx")
    build_text_index(a).write.parquet(path)
    build_text_index(b).write.mode("append").parquet(path)
    stored = spark.read.parquet(path)
    terms = ["spark", "window", "merge"]

    def serve(ix):
        return [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
                for r in search_text_index(ix, terms, k=10)
                .collect()]

    scan = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
            for r in search_bm25(docs, terms, k=10).collect()]
    assert serve(stored) == scan and scan
    # batched serve sums the parts too
    got_many = [(r["doc_id"], r["n_tokens"], r["score"], r["rank"])
                for r in search_text_index_many(
                    stored, {"q": terms}, k=10)
                .orderBy("rank").collect()]
    assert got_many == scan
    # gauge reads the folded artifact as consistent
    assert text_index_stats(stored).collect()[0]["consistent"]
    # compact: canonical one-row-per-term parts, serve unchanged
    comp = compact_text_index(stored)
    assert (comp.where("kind = 'df'").groupBy("term").count()
            .where("count > 1").count() == 0)
    assert comp.where("kind = 'stat'").count() == 3
    assert serve(comp) == scan
    # the edit verbs fold multi-part inputs: upsert on the appended
    # artifact equals a fresh rebuild
    b_new = b.withColumn(
        "text", F.concat(F.col("text"), F.lit(" appended marker")))
    up = upsert_text_index(stored, b_new)
    fresh = build_text_index(a.unionByName(b_new))
    assert _index_parts(up) == _index_parts(fresh)
    # streaming build over 3 one-file batches == batch build
    src = str(tmp_path / "app_docs3")
    docs.repartition(3).write.parquet(src)
    sidx = str(tmp_path / "stream_idx")
    gauge = build_text_index_stream(spark, src, sidx,
                                    max_files_per_trigger=1)
    grows = gauge.collect()
    assert len(grows) >= 3
    assert sum(r["n_docs"] for r in grows) == docs.count()
    streamed = spark.read.parquet(sidx)
    assert serve(streamed) == scan
    assert text_index_stats(streamed).collect()[0]["consistent"]


def test_det_shortlist_nan_rows_never_crash():
    """A NaN-containing query vector NaNs its whole ADC row; the
    shortlist must degrade like the lexsort it replaced (NaN scores
    rank last, crank tie-break) instead of crashing on a broadcast
    mismatch (ADVICE r12)."""
    import numpy as np
    from metacat_spark.llm.similarity import _det_shortlist
    rng = np.random.RandomState(13)
    for trial in range(25):
        nq, nc = int(rng.randint(1, 5)), int(rng.randint(2, 30))
        adc = rng.randint(0, 4, size=(nq, nc)).astype(float)
        # poison: one all-NaN row (when nq > 1) plus random NaNs
        adc[0, rng.randint(0, nc)] = np.nan
        if nq > 1:
            adc[1] = np.nan
        mask = rng.rand(nq, nc) < 0.4
        adc[mask] = np.nan
        crank = rng.permutation(nc)
        rr = int(rng.randint(1, nc + 1))
        got = _det_shortlist(adc, crank, rr)
        assert got.shape == (nq, rr)
        for i in range(nq):
            row = adc[i]
            assert len(set(got[i])) == rr, (trial, i)
            # spec: every non-NaN candidate strictly better than a
            # chosen one is itself chosen (NaNs only pad the tail)
            chosen = set(got[i])
            finite = [c for c in range(nc) if not np.isnan(row[c])]
            if any(c in chosen for c in finite):
                worst = min(row[c] for c in finite if c in chosen)
                better = [c for c in finite if row[c] > worst]
                assert all(c in chosen for c in better), (trial, i)


def test_stream_topk_sink_ownership_is_loud(docs, spark, tmp_path):
    """Sink-dir hygiene for the leaderboard twins (ADVICE r12): a
    sink holding rows WITHOUT its checkpoint is refused before the
    stream starts, and a re-run whose checkpoint already marks all
    input processed raises instead of returning the PREVIOUS run's
    leaderboard labeled as the new query's result."""
    from metacat_spark.llm.search import search_stream_topk
    src = str(tmp_path / "docs_src")
    docs.coalesce(1).write.parquet(src)
    sink = str(tmp_path / "lb_sink")
    first = search_stream_topk(spark, src, ["spark"],
                               stats_from=docs, k=5,
                               sink_dir=sink).collect()
    assert first
    # same sink, fresh checkpoint: the existing rows belong to
    # another lineage -> refuse before starting
    with pytest.raises(ValueError, match="checkpoint"):
        search_stream_topk(spark, src, ["spark"], stats_from=docs,
                           k=5, sink_dir=sink,
                           checkpoint_dir=str(tmp_path / "fresh_ck"))
    # same sink + same (drained) checkpoint, different query: zero
    # new emissions -> loud, never the old query's rows
    with pytest.raises(ValueError, match="already marks"):
        search_stream_topk(spark, src, ["window"], stats_from=docs,
                           k=5, sink_dir=sink)
    # a genuinely fresh sink still works
    sink2 = str(tmp_path / "lb_sink2")
    again = search_stream_topk(spark, src, ["spark"],
                               stats_from=docs, k=5,
                               sink_dir=sink2).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in first]


def test_one_collect_decode_matches_split_jobs(docs, spark,
                                               tmp_path):
    """r15 one-collect serve decode: `_decode_stats_and_df` folds the
    corpus stats AND the query terms' df values from ONE bounded
    collect. It must return (a) stats identical to the stats-only
    decoder and (b) a df map identical to a direct groupBy-sum over
    the artifact's df rows — on a MULTI-PART appended artifact (one
    df row per part per term, r12 append-is-extend; the driver fold
    is exact because df values are integer-valued doubles), with
    absent terms absent from the map (serve defaults them to 0.0)."""
    from metacat_spark.llm.search import (_decode_stats_and_df,
                                          _decode_text_index_stats,
                                          build_text_index)
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    path = str(tmp_path / "one_collect_idx")
    build_text_index(a).write.parquet(path)
    build_text_index(b).write.mode("append").parquet(path)
    stored = spark.read.parquet(path)
    terms = ["spark", "window", "merge", "zzznotaword"]
    st, df_map = _decode_stats_and_df(stored, terms)
    assert st == _decode_text_index_stats(stored)
    want = {r["term"]: r["s"] for r in
            stored.where((F.col("kind") == "df")
                         & F.col("term").isin(terms))
            .groupBy("term").agg(F.sum("tf").alias("s")).collect()}
    assert df_map == want and len(df_map) == 3
    assert "zzznotaword" not in df_map
    # genuinely multi-part: each present term's df was folded from
    # one row per part
    assert stored.where((F.col("kind") == "df")
                        & (F.col("term") == "spark")).count() >= 2
    # malformed artifact is loud through the shared column check
    with pytest.raises(ValueError, match="columns"):
        _decode_stats_and_df(docs, terms)


def test_text_index_null_stat_rows_are_loud(docs, spark):
    """A part whose stat rows were NULLED (not just dropped) must be
    a loud serve-time error — summing the surviving parts would
    silently serve undercounted n/sum_dl (ADVICE r12). A legitimate
    all-empty streaming fragment (n=0, NULL sum_dl) still serves."""
    from metacat_spark.llm.search import (build_text_index,
                                          search_text_index)
    idx = build_text_index(docs)
    # legitimate: append an all-empty fragment (zero docs)
    empty_frag = build_text_index(docs.where("doc_id < 0"))
    ok = idx.unionByName(empty_frag)
    assert search_text_index(ok, ["spark"], k=3).count() == 3
    # corruption: null the sum_dl of a NON-empty part
    nulled = idx.withColumn(
        "tf", F.when((F.col("kind") == "stat")
                     & (F.col("term") == "sum_dl"),
                     F.lit(None).cast("double"))
        .otherwise(F.col("tf")))
    with pytest.raises(ValueError, match="sum_dl|zero-doc"):
        search_text_index(nulled, ["spark"])
    # corruption: null an n row anywhere
    nulled_n = ok.withColumn(
        "tf", F.when((F.col("kind") == "stat")
                     & (F.col("term") == "n")
                     & (F.col("tf") > 0), F.lit(None).cast("double"))
        .otherwise(F.col("tf")))
    with pytest.raises(ValueError, match="NULL n"):
        search_text_index(nulled_n, ["spark"])
    # corruption: a part lost SOME stat rows (ragged parts)
    ragged = idx.unionByName(
        empty_frag.where("kind <> 'stat' or term <> 'n_dl'"))
    with pytest.raises(ValueError, match="ragged"):
        search_text_index(ragged, ["spark"])


def test_text_index_zero_token_docs_are_exact(docs, spark):
    """VERDICT r12 #3: token-less documents carry kind='doc' marker
    rows, so their stat contribution is storage-recoverable — upsert
    of a re-added zero-token doc equals a fresh rebuild exactly (the
    r12 caveat is gone), shrink drops the marker, the gauge counts
    markers and stays consistent, and serving ignores the kind."""
    from metacat_spark.llm.search import (build_text_index,
                                          compact_text_index,
                                          extend_text_index,
                                          search_bm25,
                                          search_text_index,
                                          shrink_text_index,
                                          text_index_stats,
                                          upsert_text_index)
    # weird corpus: a normal slice + an empty-text doc + a NULL-text
    # doc + a doc of only whitespace-separated nothing (spaces)
    a = docs.where("doc_id % 3 = 0").select("doc_id", "text")
    weird = spark.createDataFrame(
        [(900001, ""), (900002, None), (900003, "   ")],
        "doc_id long, text string")
    corpus = a.unionByName(weird)
    idx = build_text_index(corpus)
    marks = {r["id"]: r["dl"] for r in
             idx.where("kind = 'doc'").collect()}
    assert set(marks) == {900001, 900002, 900003}
    assert marks[900002] is None          # NULL text -> NULL dl
    # gauge: markers counted, artifact exactly consistent
    row = text_index_stats(idx).collect()[0]
    assert row["consistent"] and row["n_doc_markers"] == 3
    assert row["n_marker_conflicts"] == 0
    assert row["n_docs_stat"] == row["n_docs_postings"]
    assert row["sum_dl_stat"] == row["sum_dl_postings"]
    # upsert re-adding the zero-token docs == fresh rebuild (the r12
    # double-count hole)
    up = upsert_text_index(idx, weird)
    assert _index_parts(up) == _index_parts(idx)
    assert text_index_stats(up).collect()[0]["consistent"]
    # upsert that REPLACES a zero-token doc with real text
    weird_new = spark.createDataFrame(
        [(900001, "spark marker text"), (900002, None),
         (900003, "")],
        "doc_id long, text string")
    up2 = upsert_text_index(idx, weird_new)
    fresh2 = build_text_index(a.unionByName(weird_new))
    assert _index_parts(up2) == _index_parts(fresh2)
    # ...and one that replaces a REAL doc with a zero-token one
    first = a.select(F.min("doc_id")).collect()[0][0]
    gone = spark.createDataFrame([(first, "")],
                                 "doc_id long, text string")
    up3 = upsert_text_index(idx, gone)
    fresh3 = build_text_index(
        a.where(f"doc_id <> {first}").unionByName(weird)
        .unionByName(gone))
    assert _index_parts(up3) == _index_parts(fresh3)
    # shrink removes markers too
    back = shrink_text_index(idx, weird)
    assert _index_parts(back) == _index_parts(build_text_index(a))
    # extend and compact carry markers; serve ignores them
    grown = extend_text_index(build_text_index(a), weird)
    assert _index_parts(grown) == _index_parts(idx)
    comp = compact_text_index(idx)
    assert _index_parts(comp)["doc"] == _index_parts(idx)["doc"]
    terms = ["spark", "window", "merge"]
    srv = [(r["doc_id"], r["score"], r["rank"])
           for r in search_text_index(idx, terms, k=10).collect()]
    scan = [(r["doc_id"], r["score"], r["rank"])
            for r in search_bm25(corpus, terms, k=10).collect()]
    assert srv == scan and srv
    # backward compat: a PRE-r13 artifact (markers stripped) still
    # loads, serves, and upserts with the documented pre-r13 drift
    old = idx.where("kind <> 'doc'")
    assert search_text_index(old, terms, k=5).count() == 5
    orow = text_index_stats(old).collect()[0]
    assert orow["n_doc_markers"] == 0 and not orow["consistent"]
    assert orow["n_docs_postings"] < orow["n_docs_stat"]


def test_search_text_index_long_query_guard(docs, spark):
    """Past MAX_PIVOT_TERMS the single-query serve must route
    through the array-fold scorer (no thousand-column pivot plans —
    VERDICT r12 #6), row-for-row equal at the boundary +-1."""
    from metacat_spark.llm import search as S
    idx = S.build_text_index(docs)
    # real + synthetic terms straddling the bound
    real = ["spark", "window", "merge", "the", "data"]
    pad = [f"zzpad{i}" for i in range(S.MAX_PIVOT_TERMS + 1)]
    key = lambda df: [(r["doc_id"], r["n_tokens"], r["score"],
                       r["rank"])
                      for r in df.orderBy("rank").collect()]
    for n in (S.MAX_PIVOT_TERMS - 1, S.MAX_PIVOT_TERMS,
              S.MAX_PIVOT_TERMS + 1):
        terms = (real + pad)[:n]
        got = key(S.search_text_index(idx, terms, k=10))
        want = key(S.search_text_index_many(idx, [("q", terms)],
                                            k=10)
                   .select("doc_id", "n_tokens", "score", "rank"))
        assert got == want and got, n
    # above the bound the plan must NOT stage per-term pivot columns
    long_q = real + pad
    plan = (S.search_text_index(idx, long_q, k=10)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "zzpad7_tf" not in plan


def test_text_index_stats_part_count_recommends_compact(docs,
                                                        spark,
                                                        tmp_path):
    """The append-only lifecycle's rebuild-decision gauge (VERDICT
    r12 #4): n_parts counts appended fragments and
    compact_recommended flips past max_parts; compaction resets
    it."""
    from metacat_spark.llm.search import (build_text_index,
                                          compact_text_index,
                                          text_index_stats)
    path = str(tmp_path / "parts_idx")
    for i in range(4):
        (build_text_index(docs.where(f"doc_id % 4 = {i}"))
         .write.mode("append").parquet(path))
    stored = spark.read.parquet(path)
    row = text_index_stats(stored, max_parts=2).collect()[0]
    assert row["n_parts"] == 4 and row["compact_recommended"]
    assert row["consistent"]
    ok = text_index_stats(stored, max_parts=32).collect()[0]
    assert ok["n_parts"] == 4 and not ok["compact_recommended"]
    comp = compact_text_index(stored)
    crow = text_index_stats(comp, max_parts=2).collect()[0]
    assert crow["n_parts"] == 1 and not crow["compact_recommended"]
    assert crow["consistent"]


def test_upsert_vectors_is_exact_replace(embs, spark, tmp_path):
    """Vector-side REPLACE-or-ADD (VERDICT r12 #5 — the
    upsert_text_index analogue): upsert(encode(A ∪ B_old), B_new) ≡
    encode(A ∪ B_new) row-for-row, idempotent, new ids degrade to a
    plain encode-append, and — unlike retire + append —
    retire-then-upsert re-adds cleanly without compaction (the stale
    tombstone leaves with the row)."""
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              encode_ivfpq,
                                              ivf_pq_search,
                                              retire_vectors,
                                              upsert_vectors)
    idx = build_ivfpq_index(embs, n_lists=8, m=8, n_codes=16,
                            train_iters=1)
    a = embs.where("vec_id % 3 <> 0")
    b_old = embs.where("vec_id % 3 = 0")
    b_new = b_old.withColumn(
        "embedding",
        F.transform("embedding", lambda x: x + F.lit(0.25)))

    def rows(p):
        return {(r["lst"], r["id"], tuple(r["codes"] or ()),
                 tuple(r["vec"] or ())) for r in p.collect()}

    stored = encode_ivfpq(a.unionByName(b_old), idx)
    up = upsert_vectors(stored, b_new, idx)
    fresh = encode_ivfpq(a.unionByName(b_new), idx)
    assert rows(up) == rows(fresh)
    # idempotent
    assert rows(upsert_vectors(up, b_new, idx)) == rows(fresh)
    # new ids degrade to encode-append
    assert rows(upsert_vectors(encode_ivfpq(a, idx), b_new, idx)) \
        == rows(fresh)
    # retire-then-upsert: the re-add survives (plain append would be
    # killed by the stale tombstone through live_postings)
    victims = [r["vec_id"] for r in
               b_old.select("vec_id").limit(3).collect()]
    tomb = stored.unionByName(retire_vectors(stored, victims))
    naive = tomb.unionByName(encode_ivfpq(
        b_old.where(F.col("vec_id").isin(victims)), idx))
    served_naive = {r["neighbor_id"] for r in ivf_pq_search(
        embs, naive, idx, k=3, n_probe=8).collect()}
    assert not (served_naive & set(victims))   # the documented trap
    upped = upsert_vectors(tomb, b_old.where(
        F.col("vec_id").isin(victims)), idx)
    assert rows(upped) == rows(stored)          # tombstones gone too
    served = {r["neighbor_id"] for r in ivf_pq_search(
        embs, upped, idx, k=3, n_probe=8).collect()}
    assert set(victims) <= served
    # through a parquet round trip
    path = str(tmp_path / "ups_postings")
    stored.write.parquet(path)
    assert rows(upsert_vectors(spark.read.parquet(path), b_new,
                               idx)) == rows(fresh)


def test_stream_topk_precreated_empty_sink_is_empty(docs, spark,
                                                    tmp_path):
    """Review-r13: zero-emission runs over an EMPTY (or caller-pre-
    created) sink return an empty leaderboard — not a spurious
    'checkpoint already marks all input processed' error about rows
    the sink does not hold. Covers both shapes: an empty-batch
    source, and a drained checkpoint pointed at a fresh empty
    sink."""
    import os

    from metacat_spark.llm.search import search_stream_topk
    # shape 1: a source holding one EMPTY parquet file — the batch
    # fires with zero rows, the state operator emits nothing
    src0 = str(tmp_path / "empty_src")
    docs.limit(0).coalesce(1).write.parquet(src0)
    sink0 = str(tmp_path / "pre_sink0")
    os.makedirs(sink0)
    out = search_stream_topk(spark, src0, ["spark"],
                             stats_from=docs, k=5, sink_dir=sink0)
    assert out.count() == 0
    # shape 2: drain a real source, then re-run with the SAME
    # checkpoint but a NEW pre-created empty sink — zero new
    # batches, nothing mislabeled, empty result
    src = str(tmp_path / "docs_src1")
    docs.coalesce(1).write.parquet(src)
    sink1 = str(tmp_path / "pre_sink1")
    ck = str(tmp_path / "pre_ck")
    assert search_stream_topk(spark, src, ["spark"],
                              stats_from=docs, k=5, sink_dir=sink1,
                              checkpoint_dir=ck).count() == 5
    sink2 = str(tmp_path / "pre_sink2")
    os.makedirs(sink2)
    out2 = search_stream_topk(spark, src, ["spark"],
                              stats_from=docs, k=5, sink_dir=sink2,
                              checkpoint_dir=ck)
    assert out2.count() == 0


def test_cluster_balanced_sample(embs, spark, tmp_path):
    """Semantic-diversity sampling (r13): per-cluster caps hold,
    ranks are contiguous, the salted two-phase pre-reduce equals the
    exact single window, selection is deterministic and replayable,
    order_col flips the ordering, and a stored centroid artifact
    round-trips."""
    from pyspark.sql import Window as W

    from metacat_spark.llm.similarity import (build_ivf_centroids,
                                              cluster_balanced_sample)
    from metacat_spark.llm.text import sample_order_key
    cents = build_ivf_centroids(embs, n_lists=8, train_iters=1)
    path = str(tmp_path / "cbs_cents")
    cents.write.parquet(path)
    stored = spark.read.parquet(path)
    out = cluster_balanced_sample(embs, per_cluster=20,
                                  centroids=stored)
    rows = out.collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault(r["cluster_id"], []).append(r["rank"])
    for cid, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), cid
        assert len(ranks) <= 20
    # at least one cluster actually hit the cap on this corpus
    assert max(len(v) for v in per.values()) == 20
    # deterministic
    again = cluster_balanced_sample(embs, per_cluster=20,
                                    centroids=stored)
    key = lambda r: (r["vec_id"], r["cluster_id"], r["rank"])
    assert sorted(map(key, rows)) == sorted(map(key,
                                                again.collect()))
    # two-phase pre-reduce == exact single window over the same
    # assignment (drop rank, compare survivor sets per cluster)
    assigned = cluster_balanced_sample(
        embs, per_cluster=10 ** 9, centroids=stored).drop("rank")
    w = (W.partitionBy("cluster_id")
         .orderBy(sample_order_key(F.col("vec_id")), "vec_id"))
    exact = (assigned.withColumn("rank", F.row_number().over(w))
             .where("rank <= 20"))
    got20 = {key(r) for r in cluster_balanced_sample(
        embs, per_cluster=20, centroids=stored).collect()}
    want20 = {key(r) for r in exact.collect()}
    assert got20 == want20
    # order_col: highest score wins rank 1 within each cluster
    scored = embs.withColumn("quality",
                             (F.col("vec_id") % 7).cast("double"))
    byq = cluster_balanced_sample(scored, per_cluster=3,
                                  centroids=stored,
                                  order_col="quality")
    for r in byq.where("rank = 1").collect():
        assert r["quality"] == max(
            x["quality"] for x in byq.collect()
            if x["cluster_id"] == r["cluster_id"])
    with pytest.raises(ValueError, match="per_cluster"):
        cluster_balanced_sample(embs, per_cluster=0,
                                centroids=stored)
    # the default key is well MIXED, not id-ordered (review r13b:
    # ordering by raw adler32 selected exactly the lowest ids)
    ids = [r["vec_id"] for r in rows]
    assert max(ids) > embs.count() * 0.8
    assert min(sorted(ids)[:20]) < embs.count() * 0.5
    # a corpus/artifact dimension mismatch is loud, not silently
    # empty (review r13b)
    short = embs.withColumn("embedding", F.slice("embedding", 1, 8))
    with pytest.raises(ValueError, match="dimension"):
        cluster_balanced_sample(short, per_cluster=5,
                                centroids=stored)
    # a gappy centroid artifact would relabel assignments — loud
    with pytest.raises(ValueError, match="contiguous"):
        cluster_balanced_sample(embs, per_cluster=5,
                                centroids=stored.where("list_id <> 3"))


def test_cluster_sample_stats(embs, spark, tmp_path):
    """Occupancy gauge for a stored centroid artifact (r14): counts
    cross-check the shared assignment kernel, derived columns are
    exact, and every recommendation branch fires on a corpus that
    actually exhibits it."""
    from metacat_spark.llm.similarity import (assign_clusters,
                                              build_ivf_centroids,
                                              cluster_sample_stats)
    cents = build_ivf_centroids(embs, n_lists=8, train_iters=1)
    path = str(tmp_path / "css_cents")
    cents.write.parquet(path)
    stored = spark.read.parquet(path)
    row = cluster_sample_stats(embs, stored).collect()[0]
    n = embs.count()
    assigned = assign_clusters(embs, stored)
    per = {r["cluster_id"]: r["n"] for r in
           assigned.groupBy("cluster_id").count()
           .withColumnRenamed("count", "n").collect()}
    assert row["n_clusters"] == 8
    assert row["n_assigned"] == n == sum(per.values())
    assert row["n_dropped"] == 0
    assert row["n_empty"] == 8 - len(per)
    assert row["max_occupancy"] == max(per.values())
    assert row["mean_occupancy"] == round(n / 8, 6)
    assert row["balance_ratio"] == round(
        max(per.values()) / (n / 8), 6)
    if row["n_empty"] > 0:
        assert row["recommendation"] == "retrain"
    else:
        assert row["recommendation"] in ("ok", "rebalance")
    # skew branch: with every cluster non-empty, max/mean >= 1, so a
    # sub-1 threshold must flip the recommendation to rebalance
    if row["n_empty"] == 0:
        skew = cluster_sample_stats(
            embs, stored, balance_threshold=0.999).collect()[0]
        assert skew["recommendation"] == "rebalance"
    # retrain branch: a corpus drawn from ONE cluster leaves the
    # others empty — dead centroids are the retrain signal
    one = assigned.where(
        F.col("cluster_id") == max(per, key=per.get)) \
        .drop("cluster_id")
    r1 = cluster_sample_stats(one, stored).collect()[0]
    assert r1["n_empty"] > 0 and r1["recommendation"] == "retrain"
    # mismatched branch: the gauge REPORTS a wholesale dimension
    # mismatch (the operator raises; a gauge must describe)
    short = embs.withColumn("embedding", F.slice("embedding", 1, 8))
    rm = cluster_sample_stats(short, stored).collect()[0]
    assert rm["n_assigned"] == 0 and rm["n_dropped"] == n
    assert rm["recommendation"] == "mismatched"
    assert rm["balance_ratio"] is None
    # NULL vectors count as dropped, not assigned
    nulled = embs.withColumn(
        "embedding", F.when(F.col("vec_id") % 10 == 0,
                            F.lit(None)).otherwise(F.col("embedding")))
    rn = cluster_sample_stats(nulled, stored).collect()[0]
    assert rn["n_dropped"] == embs.where("vec_id % 10 = 0").count()
    assert rn["n_assigned"] == n - rn["n_dropped"]


def test_cluster_assign_stream(embs, spark, tmp_path):
    """Streaming assignment twin (r14): stream-assigned rows are
    row-for-row the batch assignment (shared kernel), unassignable
    rows carry the -1 sentinel, and the production sink path yields
    file rows == memory rows plus a bounded per-batch gauge."""
    import os

    from metacat_spark.llm.similarity import (assign_clusters,
                                              build_ivf_centroids,
                                              cluster_assign_stream)
    cents = build_ivf_centroids(embs, n_lists=8, train_iters=1)
    src = str(tmp_path / "cas_src")
    # include unassignable rows: every 7th id gets a NULL vector
    feed = embs.withColumn(
        "embedding", F.when(F.col("vec_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("embedding")))
    feed.write.parquet(src)
    got = cluster_assign_stream(spark, src, cents,
                                table="cas_mem").select(
        "vec_id", "cluster_id").collect()
    want = assign_clusters(feed, cents, check_dim=False,
                           keep_invalid=True).select(
        "vec_id", "cluster_id").collect()
    key = lambda r: (r["vec_id"], r["cluster_id"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert any(r["cluster_id"] == -1 for r in got)
    # production sink: per-doc rows land in parquet, return value is
    # the bounded gauge
    sink = str(tmp_path / "cas_sink")
    os.makedirs(sink)
    gauge = cluster_assign_stream(spark, src, cents, sink_dir=sink)
    g = gauge.collect()
    assert g and all(r["n"] >= 0 for r in g)
    assert sum(r["n"] for r in g) == feed.count()
    assert sum(r["n_dropped"] for r in g) == feed.where(
        "vec_id % 7 = 0").count()
    assert all(r["n_clusters_hit"] <= 8 for r in g)
    filed = spark.read.parquet(sink).select(
        "vec_id", "cluster_id").collect()
    assert sorted(map(key, filed)) == sorted(map(key, want))


def test_upsert_text_index_markerless_guard(docs, spark):
    """VERDICT r13 #3: a pre-r13 artifact (token-less docs, no
    kind='doc' markers) REFUSES an upsert that brings unaccounted
    ids — the ambiguous case that silently double-counted stats —
    while batches touching only accounted ids stay exact, and the
    marker-ful artifact accepts the same batch."""
    from metacat_spark.llm.search import (build_text_index,
                                          upsert_text_index)
    base = docs.limit(30).select("doc_id", "text")
    zero = spark.createDataFrame([(990001, "")],
                                 "doc_id long, text string")
    idx = build_text_index(base.unionByName(zero))
    assert idx.where("kind = 'doc'").count() == 1
    pre = idx.where("kind <> 'doc'")     # the pre-r13 shape
    newdoc = spark.createDataFrame([(990002, "spark window")],
                                   "doc_id long, text string")
    with pytest.raises(ValueError, match="marker"):
        upsert_text_index(pre, newdoc)
    # the token-less RE-ADD itself (the original drift case) is the
    # same unknown-id shape — also refused
    rezero = spark.createDataFrame([(990001, "spark anew")],
                                   "doc_id long, text string")
    with pytest.raises(ValueError, match="marker"):
        upsert_text_index(pre, rezero)
    # accounted-ids-only batch proceeds and stays exact: doc count
    # unchanged, postings replaced
    some_id = base.first()["doc_id"]
    re_add = base.where(F.col("doc_id") == some_id) \
        .withColumn("text", F.lit("zzreplaced token"))
    up = upsert_text_index(pre, re_add)
    n_of = lambda df: sum(r["tf"] for r in df.where(
        "kind = 'stat' and term = 'n'").collect())
    assert n_of(up) == n_of(pre)
    assert up.where((F.col("kind") == "post")
                    & (F.col("term") == "zzreplaced")).count() == 1
    # the marker-ful artifact accepts the unknown-id batch unchanged
    ok = upsert_text_index(idx, newdoc)
    assert n_of(ok) == n_of(idx) + 1


def test_encode_stream_refuses_tombstoned_readd(embs, tmp_path,
                                                spark):
    """VERDICT r13 #4: appending a retired id via the ingest path
    yields a row live_postings silently kills — the stream now
    refuses it loudly, pointing at upsert_vectors; retire-then-
    UPSERT still re-adds cleanly, and ingest of genuinely new ids
    over a tombstoned table proceeds."""
    from metacat_spark.llm.similarity import (build_ivfpq_index,
                                              encode_ivfpq,
                                              encode_ivfpq_stream,
                                              live_postings,
                                              retire_vectors,
                                              upsert_vectors)
    idx = build_ivfpq_index(embs, n_lists=4, m=8, n_codes=16,
                            train_iters=1)
    first = embs.where("vec_id < 100")
    pdir = str(tmp_path / "tg_postings")
    encode_ivfpq(first, idx).write.parquet(pdir)
    postings = spark.read.parquet(pdir)
    retired = [int(r["vec_id"]) for r in
               first.limit(2).select("vec_id").collect()]
    retire_vectors(postings, retired).write.mode("append") \
        .parquet(pdir)
    # re-add one retired id through the stream: refused, nothing
    # appended for that batch
    src_bad = str(tmp_path / "tg_src_bad")
    embs.where(F.col("vec_id") == retired[0]).write.parquet(src_bad)
    n_before = spark.read.parquet(pdir).count()
    with pytest.raises(ValueError, match="upsert"):
        encode_ivfpq_stream(spark, src_bad, idx, pdir)
    assert spark.read.parquet(pdir).count() == n_before
    # genuinely new ids still ingest over the tombstoned table
    src_ok = str(tmp_path / "tg_src_ok")
    fresh = embs.where((F.col("vec_id") >= 100)
                       & (F.col("vec_id") < 120))
    fresh.write.parquet(src_ok)
    ck = str(tmp_path / "tg_ck_ok")
    gauge = encode_ivfpq_stream(spark, src_ok, idx, pdir,
                                checkpoint_dir=ck)
    assert sum(r["n"] for r in gauge.collect()) == fresh.count()
    # retire-then-upsert remains the clean re-add
    up = upsert_vectors(spark.read.parquet(pdir),
                        embs.where(F.col("vec_id") == retired[0]),
                        idx)
    live_ids = {r["id"] for r in
                live_postings(up).select("id").collect()}
    assert retired[0] in live_ids and retired[1] not in live_ids


def test_tombstone_guard_sees_mid_drain_retires(embs, spark, tmp_path):
    """r15 (VERDICT r14 #2): the stream's tombstone guard re-reads
    the tombstone projection per BATCH, so a retire_vectors commit
    that lands while the stream drains is visible to the next batch
    — the once-at-start read left exactly that race open. Pinned on
    the factored per-batch helper: a second call after a tombstone
    append must see it."""
    from metacat_spark.llm.similarity import (_tombstoned_in_batch,
                                              build_ivfpq_index,
                                              encode_ivfpq,
                                              retire_vectors)
    idx = build_ivfpq_index(embs.limit(64), n_lists=4, m=8,
                            n_codes=8, train_iters=0)
    pdir = str(tmp_path / "race_postings")
    first = embs.limit(8)
    encode_ivfpq(first, idx).write.parquet(pdir)
    victim = int(first.select("vec_id").head()["vec_id"])
    batch = embs.where(F.col("vec_id") == victim)
    # clean table: the guard passes
    assert _tombstoned_in_batch(spark, pdir, batch, "vec_id") == []
    # a retire committed AFTER the stream started (simulated by the
    # append between guard calls) is seen by the NEXT batch's check
    retire_vectors(spark.read.parquet(pdir), [victim]) \
        .write.mode("append").parquet(pdir)
    assert _tombstoned_in_batch(spark, pdir, batch,
                                "vec_id") == [victim]
    # and a batch of unrelated ids still passes
    other = embs.where(F.col("vec_id") != victim).limit(3)
    assert _tombstoned_in_batch(spark, pdir, other, "vec_id") == []


def test_cluster_sample_stats_shared_assignments(embs, spark,
                                                 tmp_path):
    """r15 (VERDICT r14 #3): a precomputed assign_clusters frame
    feeds the gauge, so a deployment that samples AND gauges one
    corpus pays the family's Arrow GEMM once. The gauge row is
    identical to the self-assigned path; the reused path's plan
    carries exactly the shared frame's ONE MapInPandas (a second
    would mean the kernel ran twice); a frame without cluster_id is
    a clean error."""
    from metacat_spark.llm.similarity import (assign_clusters,
                                              build_ivf_centroids,
                                              cluster_sample_stats)
    cents = build_ivf_centroids(embs, n_lists=8, train_iters=1)
    path = str(tmp_path / "css_shared_cents")
    cents.write.parquet(path)
    stored = spark.read.parquet(path)
    assigned = assign_clusters(embs, stored, check_dim=False,
                               keep_invalid=True)
    base = cluster_sample_stats(embs, stored).collect()
    reused = cluster_sample_stats(embs, stored,
                                  assignments=assigned).collect()
    assert reused == base
    plan = _plan(assigned.groupBy("cluster_id").count())
    assert plan.count(") MapInPandas") == 1
    with pytest.raises(ValueError, match="cluster_id"):
        cluster_sample_stats(embs, stored, assignments=embs)


def test_cluster_sample_stats_rejects_stale_assignments(embs, spark):
    """r16 (ADVICE r15): an assignments frame built against MORE
    centroids than the decoded artifact defines carries out-of-range
    cluster ids — the ~free tell for the wrong-centroids mistake that
    would otherwise silently skew every gauge column. Caught on the
    same collect the gauge already pays."""
    from metacat_spark.llm.similarity import (assign_clusters,
                                              build_ivf_centroids,
                                              cluster_sample_stats)
    cents4 = build_ivf_centroids(embs, n_lists=4, train_iters=0)
    cents16 = build_ivf_centroids(embs, n_lists=16, train_iters=0)
    stale = assign_clusters(embs, cents16, check_dim=False,
                            keep_invalid=True)
    with pytest.raises(ValueError, match="different/stale"):
        cluster_sample_stats(embs, cents4, assignments=stale)
    # matching frame still passes
    ok = assign_clusters(embs, cents4, check_dim=False,
                         keep_invalid=True)
    assert cluster_sample_stats(
        embs, cents4, assignments=ok).count() == 1
