"""LLM-pipeline operator tests: text analysis, dedup family, similarity
search, multimodal plumbing. Exact variants check against DuckDB; LSH
variants check recall/precision against their exact counterparts."""

import math

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture(scope="session")
def docs(catalog):
    return catalog.raw["documents"]


@pytest.fixture(scope="session")
def embs(catalog):
    return catalog.raw["embeddings"]


# ------------------------------------------------------------------- text

def test_token_count_vs_duck(docs, duck):
    from metacat_spark.llm import text as TX
    got = {r["doc_id"]: r["n"] for r in
           docs.select("doc_id", TX.token_count(F.col("text")).alias("n"))
           .collect()}
    want = dict(duck.execute(
        "select doc_id, len(string_split_regex(text, '\\s+')) "
        "from documents").fetchall())
    assert got == want


def test_poly_hash_vs_duck(docs, duck):
    from metacat_spark.llm import text as TX
    got = {r["doc_id"]: r["h"] for r in
           docs.select("doc_id", TX.poly_hash(F.col("text")).alias("h"))
           .collect()}
    want = dict(duck.execute("""
        select doc_id, list_reduce(
            list_prepend(0::bigint,
                         list_transform(string_split(text, ''),
                                        x -> unicode(x)::bigint)),
            (acc, x) -> (acc * 31 + x) % 2147483647)
        from documents""").fetchall())
    assert got == want


def test_quality_and_langid_run(docs):
    from metacat_spark.llm import text as TX
    out = TX.analyze(docs).collect()
    assert len(out) == docs.count()
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)
    assert all(r["n_tokens"] > 0 for r in out)
    langs = {r["lang_pred"] for r in out}
    assert langs  # deterministic heuristic runs; values in marker set
    assert langs <= {"und", "en", "es", "fr", "de", "zh"}


def test_top_terms_and_tfidf(docs):
    from metacat_spark.llm import text as TX
    top = TX.top_terms(docs, k=10).collect()
    assert len(top) == 10
    assert [r["n"] for r in top] == sorted((r["n"] for r in top),
                                           reverse=True)
    ti = TX.tfidf_top_terms(docs, k=3)
    per_doc = ti.groupBy("id").count().collect()
    assert all(r["count"] <= 3 for r in per_doc)
    assert ti.where("rank = 1").count() == docs.count()


def test_stratified_sample_deterministic(docs):
    from metacat_spark.llm.pipeline import stratified_sample
    frac = {"en": 0.5, "de": 1.0}
    a = sorted(r["doc_id"] for r in
               stratified_sample(docs, frac).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(docs, frac).select("doc_id").collect())
    assert a == b and a  # same survivors every run
    out = stratified_sample(docs, frac)
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # default 0.0 drops other strata
    n_de_in = docs.where("lang = 'de'").count()
    assert out.where("lang = 'de'").count() == n_de_in  # frac 1.0 keeps all
    n_en_in = docs.where("lang = 'en'").count()
    n_en_out = out.where("lang = 'en'").count()
    assert 0 < n_en_out < n_en_in  # frac 0.5 downsamples


def test_word_occurrences_vs_duck(docs, duck):
    from metacat_spark.llm import text as TX
    got = {r["doc_id"]: r["n"] for r in
           docs.select("doc_id",
                       TX.word_occurrences(F.col("text"), "the").alias("n"))
           .collect()}
    want = dict(duck.execute(
        "select doc_id, len(list_filter(string_split_regex(text, '\\s+'), "
        "x -> x = 'the')) from documents").fetchall())
    assert got == want


# ------------------------------------------------------------------ dedup

def test_exact_dedup(docs, duck, spark):
    from metacat_spark.llm import dedup as DD
    # inject known duplicates so the operator has work to do
    dupes = docs.limit(10).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000)
    with_dupes = docs.unionByName(dupes)
    groups = DD.exact_duplicates(with_dupes).collect()
    n_groups = len(groups)
    assert n_groups == docs.count()  # every original text is one group
    n_dup_groups = sum(1 for g in groups if g["n_copies"] > 1)
    assert n_dup_groups == 10
    survivors = DD.dedup_exact(with_dupes)
    assert survivors.count() == docs.count()
    # canonical = min id ⇒ originals survive, injected copies don't
    assert survivors.where(F.col("doc_id") >= 1_000_000).count() == 0


def test_curate_exact_pipeline(docs):
    """Exact-variant curation: output ⊆ input, no exact-dup survivors,
    and every stage's constraint holds on the output."""
    from metacat_spark.llm.pipeline import curate_exact
    from metacat_spark.llm.text import quality_score, token_count
    out = curate_exact(docs)
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out <= n_in
    checked = out.select(
        quality_score(F.col("text")).alias("q"),
        token_count(F.col("text")).alias("nt"),
        F.md5("text").alias("h"))
    assert checked.where("q < 0.3 or nt < 5").count() == 0
    assert checked.groupBy("h").count().where("count > 1").count() == 0


def test_dedup_exact_stream_equals_batch(docs, spark, tmp_path):
    """Streaming-ingest dedup: the streamed survivors carry the same
    distinct content set as batch dedup."""
    from metacat_spark.llm import dedup as DD
    src = str(tmp_path / "docs_stream")
    dupes = docs.limit(10).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000)
    docs.unionByName(dupes).write.parquet(src)
    out = DD.dedup_exact_stream(spark, src, table="dedup_stream_t")
    assert out.count() == docs.count()
    got = {r["t"] for r in
           out.select(F.md5("text").alias("t")).collect()}
    want = {r["t"] for r in
            docs.select(F.md5("text").alias("t")).distinct().collect()}
    assert got == want


def test_ngram_jaccard_vs_duck(docs, duck):
    from metacat_spark.llm import dedup as DD
    got = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in
                 DD.ngram_jaccard_pairs(docs, n=3, threshold=0.12)
                 .collect())
    want = sorted(duck.execute("""
        with sh as (
          select doc_id as id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                  for i in range(1, greatest(len(toks) - 2, 1) + 1)]) as s
          from (select doc_id,
                       string_split_regex(text, '\\s+') as toks
                from documents)
        ),
        ex as (select id, unnest(s) as shingle from sh),
        sizes as (select id, len(s) as n from sh),
        inter as (
          select a.id as id_a, b.id as id_b, count(*) as n_inter
          from ex a join ex b on a.shingle = b.shingle and a.id < b.id
          group by 1, 2)
        select id_a, id_b,
               round(n_inter / (sa.n + sb.n - n_inter), 6) as jaccard
        from inter
          join sizes sa on sa.id = id_a
          join sizes sb on sb.id = id_b
        where n_inter / (sa.n + sb.n - n_inter) >= 0.12
    """).fetchall())
    assert got == want and got


def test_minhash_lsh_recall(docs):
    """LSH candidates verified exactly ⇒ precision 1.0 by construction;
    recall vs exact pairs must be high at this threshold/banding."""
    from metacat_spark.llm import dedup as DD
    exact = {(r["id_a"], r["id_b"]) for r in
             DD.ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           DD.minhash_lsh_pairs(docs, n=2, k=32, bands=8,
                                threshold=0.5).collect()}
    assert exact, "shingle pipeline returned zero exact pairs — " \
        "both sides empty would make this test vacuous (review r6)"
    assert lsh <= exact  # exact verification ⇒ no false positives
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_minhash_jaccard_estimate(docs):
    """Signature agreement rate ≈ true Jaccard (MinHash property)."""
    from metacat_spark.llm import dedup as DD
    sig = DD.minhash_signatures(docs.limit(50), n=2, k=64,
                                include_shingles=True)
    rows = sig.collect()
    by_id = {r["id"]: r for r in rows}
    ids = sorted(by_id)[:10]
    assert len(ids) >= 2, "empty signature table: no pairs checked"
    checked = 0
    for i in range(0, len(ids) - 1, 2):
        a, b = by_id[ids[i]], by_id[ids[i + 1]]
        sa, sb = set(a["sh"]), set(b["sh"])
        true_j = len(sa & sb) / len(sa | sb)
        est = sum(a[f"mh_{k}"] == b[f"mh_{k}"] for k in range(64)) / 64
        assert abs(est - true_j) < 0.25
        checked += 1
    assert checked >= 4      # the property loop must actually run


def test_simhash_properties(docs, spark):
    from metacat_spark.llm import dedup as DD
    sh = DD.simhash(docs)
    assert sh.count() == docs.count()
    # identical docs → identical simhash; near-identical → small distance
    d1 = docs.limit(5).select("doc_id", "text")
    d2 = d1.select((F.col("doc_id") + 500).alias("doc_id"), "text")
    both = DD.simhash(d1.unionByName(d2)).collect()
    by_id = {r["id"]: r["simhash"] for r in both}
    for i in by_id:
        if i >= 500:
            assert by_id[i] == by_id[i - 500]
    pairs = DD.simhash_pairs(d1.unionByName(d2),
                             max_hamming=0).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} >= {
        (i, i + 500) for i in by_id if i < 500}


# -------------------------------------------------------------- similarity

def test_cosine_vs_duck(embs, duck):
    # the synthetic embeddings are near-random: max pairwise cosine
    # ≈ 0.48, so "near-duplicate" thresholds sit around 0.35 here
    from metacat_spark.llm import similarity as SIM
    got = sorted((r["id_a"], r["id_b"], r["cosine"]) for r in
                 SIM.cosine_pairs(embs, threshold=0.35).collect())
    want = sorted(duck.execute("""
        select a.vec_id, b.vec_id,
               round(list_cosine_similarity(
                 a.embedding::double[], b.embedding::double[]), 6)
        from embeddings a join embeddings b on a.vec_id < b.vec_id
        where list_cosine_similarity(
                 a.embedding::double[], b.embedding::double[]) >= 0.35
    """).fetchall())
    assert len(got) == len(want)
    for (ga, gb, gc), (wa, wb, wc) in zip(got, want):
        assert (ga, gb) == (wa, wb) and abs(gc - wc) < 1e-5
    assert got


def test_brute_force_topk(embs):
    from metacat_spark.llm import similarity as SIM
    k = 3
    out = SIM.brute_force_topk(embs.limit(50), k=k).collect()
    per = {}
    for r in out:
        per.setdefault(r["id"], []).append(r)
    assert len(per) == 50    # empty output must fail, not pass vacuously
    assert all(len(v) == k for v in per.values())
    for v in per.values():
        sims = [r["cosine"] for r in sorted(v, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_topk_gemm_equals_bruteforce(embs):
    from metacat_spark.llm import similarity as SIM
    sub = embs.limit(80)
    a = sorted((r["id"], r["neighbor_id"], r["rank"]) for r in
               SIM.brute_force_topk(sub, k=3).collect())
    b = sorted((r["id"], r["neighbor_id"], r["rank"]) for r in
               SIM.topk_gemm(sub, k=3).collect())
    assert a == b and a


def test_lsh_topk_recall(embs):
    from metacat_spark.llm import similarity as SIM
    sub = embs.limit(200)
    exact = {(r["id"], r["neighbor_id"]) for r in
             SIM.brute_force_topk(sub, k=1).collect()}
    approx = {(r["id"], r["neighbor_id"]) for r in
              SIM.lsh_bucketed_topk(sub, k=1, n_tables=12,
                                    planes_per_table=2).collect()}
    hits = len(exact & approx)
    assert hits / len(exact) >= 0.5, \
        f"LSH nn recall degenerate: {hits / len(exact)}"


def test_ngram_stop_shingle_cap(spark):
    """Skew regression (VERDICT r1): one shingle shared by 50% of docs
    must not blow up the self-join. The cap drops it from the shingle
    space; jaccard over the remaining shingles is unchanged."""
    from metacat_spark.llm import dedup as DD
    hot = "the quick fox"
    rows = [(i, f"{hot} unique{i} filler{i} tail{i}")
            for i in range(200)]
    # two genuinely similar docs that must survive the cap
    rows += [(900, "alpha beta gamma delta epsilon zeta"),
             (901, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = DD.ngram_jaccard_pairs(df, n=3, threshold=0.3,
                                    max_df=50).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert (900, 901) in got
    # the 200 hot-shingle docs share ONLY the stop shingle — no pairs
    assert all(a == 900 for a, _ in got)
    # on a corpus with no stop shingles the cap is a no-op vs exact
    normal = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} common tail") for i in range(30)],
        ["doc_id", "text"])
    exact = {tuple(r) for r in DD.ngram_jaccard_pairs(
        normal, n=3, threshold=0.1, max_df=None).collect()}
    withcap = {tuple(r) for r in DD.ngram_jaccard_pairs(
        normal, n=3, threshold=0.1, max_df=1000).collect()}
    assert exact == withcap


def test_lsh_hot_bucket_subsplit(embs):
    """Skew regression (VERDICT r1): a degenerate bucket holding the
    whole table must sub-split into bounded bipartite tasks with
    identical results to the single-task path."""
    from metacat_spark.llm import similarity as SIM
    sub = embs.limit(150)
    one_task = {tuple(r) for r in
                SIM.lsh_bucketed_topk(sub, k=2, n_tables=4,
                                      planes_per_table=2,
                                      bucket_cap=10**6).collect()}
    split = {tuple(r) for r in
             SIM.lsh_bucketed_topk(sub, k=2, n_tables=4,
                                   planes_per_table=2,
                                   bucket_cap=16).collect()}
    assert one_task == split
    # fully degenerate: every vector identical direction → ONE bucket
    # per table; with cap=8 the 120-row bucket must still score
    spark = sub.sparkSession
    deg = spark.createDataFrame(
        [(i, [1.0 + 0.001 * i] * 8) for i in range(120)],
        ["vec_id", "embedding"])
    out = SIM.lsh_bucketed_topk(deg, k=1, n_tables=2,
                                planes_per_table=2, dim=8,
                                bucket_cap=8).collect()
    assert len(out) == 120  # every vector found a neighbour


def test_centroids(embs, duck):
    from metacat_spark.llm import similarity as SIM
    got = {r["label"]: r["centroid"] for r in
           SIM.centroid_by_label(embs).collect()}
    one = duck.execute("""
        select avg(embedding[1]::double) from embeddings where label = 0
    """).fetchone()[0]
    assert abs(got[0][0] - one) < 1e-9
    assert all(len(c) == 64 for c in got.values())


# -------------------------------------------------------------- multimodal

def test_multimodal_plumbing(docs):
    from metacat_spark.llm import multimodal as MM
    assets = MM.synthesize_assets(docs)
    feats = MM.extract_features(assets)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r["feature"]) == 8 for r in rows)
    # text payloads aren't BMP/WAV containers: decode misses, and the
    # deterministic histogram fallback is normalized
    for r in rows[:20]:
        assert r["decode_ok"] is False
        assert abs(sum(r["feature"]) - 1.0) < 1e-9
    frames = MM.frame_sample_plan(assets, every_ms=500)
    f = frames.limit(10).collect()
    assert all(r["t_ms"] == r["frame_idx"] * 500 for r in f)


def _bmp_bytes(w, h, rgb_rows):
    """Minimal 24-bit uncompressed BMP (bottom-up rows of (r,g,b))."""
    import struct
    stride = (w * 3 + 3) // 4 * 4
    pix = b""
    for row in reversed(rgb_rows):      # file stores bottom-up
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        pix += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                      2835, 2835, 0, 0)
    return header + dib + pix


def _wav_bytes(rate, samples):
    """Minimal 16-bit mono PCM WAV."""
    import struct
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_multimodal_real_bmp_wav_decode(spark):
    """The BMP and WAV kernels decode REAL containers end-to-end
    through the Arrow mapInPandas stage — pixel means and audio
    RMS/peak asserted against hand-computed values."""
    from metacat_spark.llm import multimodal as MM

    # 2x2 image: red, green / blue, white
    bmp = _bmp_bytes(2, 2, [[(255, 0, 0), (0, 255, 0)],
                            [(0, 0, 255), (255, 255, 255)]])
    # 4 samples: 0, half, -half, 0 at 8 kHz
    wav = _wav_bytes(8000, [0, 16384, -16384, 0])
    assets = spark.createDataFrame(
        [(1, "image", bytearray(bmp), "image/bmp", 2, 2, None),
         (2, "audio", bytearray(wav), "audio/wav", None, None, 1),
         (3, "image", bytearray(b"not a container"), None, None, None,
          None)],
        MM.ASSET_SCHEMA)
    rows = {r["asset_id"]: r for r in
            MM.extract_features(assets).collect()}

    img = rows[1]
    assert img["decode_ok"] is True
    w, h, bpp, mr, mg, mb, bright, npx = img["feature"]
    assert (w, h, bpp, npx) == (2.0, 2.0, 24.0, 4.0)
    assert abs(mr - 510 / 4 / 255) < 1e-6   # mean R = (255+0+0+255)/4
    assert abs(mg - 510 / 4 / 255) < 1e-6
    assert abs(mb - 510 / 4 / 255) < 1e-6
    assert abs(bright - 0.5) < 1e-6

    aud = rows[2]
    assert aud["decode_ok"] is True
    rate, ch, bits, n, dur, rms, peak, zc = aud["feature"]
    assert (rate, ch, bits, n) == (8000.0, 1.0, 16.0, 4.0)
    assert abs(dur - 4 / 8000) < 1e-9
    assert abs(peak - 0.5) < 1e-6
    assert abs(rms - 0.125 ** 0.5) < 1e-6  # sqrt((0+.25+.25+0)/4)

    assert rows[3]["decode_ok"] is False


def test_multimodal_decode_kernels_direct():
    """Kernel-level contract: malformed containers raise, valid ones
    round-trip without Spark."""
    import pytest as _pt

    from metacat_spark.llm import multimodal as MM
    with _pt.raises(ValueError):
        MM.decode_bmp(b"BMgarbage")
    with _pt.raises(ValueError):
        MM.decode_wav(b"RIFFxxxxWAVE")
    f = MM.decode_bmp(_bmp_bytes(3, 1, [[(10, 20, 30)] * 3]))
    assert f[0] == 3.0 and f[1] == 1.0
    assert abs(f[3] - 10 / 255) < 1e-6 and abs(f[5] - 30 / 255) < 1e-6
    g = MM.decode_wav(_wav_bytes(16000, [32767] * 16))
    assert g[0] == 16000.0 and abs(g[6] - 32767 / 32768) < 1e-6
    assert g[7] == 0.0  # constant signal: no zero crossings


# ----------------------------------------------------------- IVF / pipeline

def test_ivf_topk_recall(embs):
    from metacat_spark.llm import similarity as SIM
    sub = embs.limit(150)
    exact = {(r["id"], r["neighbor_id"]) for r in
             SIM.brute_force_topk(sub, k=1).collect()}
    approx = {(r["id"], r["neighbor_id"]) for r in
              SIM.ivf_topk(sub, k=1, n_lists=8, n_probe=4).collect()}
    hits = len(exact & approx)
    assert hits / len(exact) >= 0.5, \
        f"IVF nn recall degenerate: {hits / len(exact)}"


def test_ivf_kmeans_training_improves_recall(embs):
    """Distributed spherical-k-means refinement (train_iters) must buy
    recall over the raw hash-sampled seeds at the same probe budget
    (measured +5–10 points at every n_probe on both sf corpora; the
    tight n_probe=2 budget shows the largest gap)."""
    from metacat_spark.llm import similarity as SIM
    exact = {(r["id"], r["neighbor_id"]) for r in
             SIM.topk_gemm(embs, k=3).collect()}

    def recall(ti):
        got = {(r["id"], r["neighbor_id"]) for r in
               SIM.ivf_topk(embs, k=3, n_lists=8, n_probe=2,
                            train_iters=ti).collect()}
        return len(got & exact) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0 + 0.03, f"training did not help: {r0} -> {r2}"


def test_curation_pipeline(docs, spark):
    from metacat_spark.llm import pipeline as PL
    from pyspark.sql import functions as F
    # plant exact + near duplicates
    exact_dupe = docs.limit(5).withColumn("doc_id",
                                          F.col("doc_id") + 900_000)
    raw = docs.unionByName(exact_dupe)
    curated = PL.curate(raw, min_quality=0.0, min_tokens=1,
                        jaccard_threshold=0.8)
    report = PL.curation_report(raw, curated)
    assert report["n_in"] == docs.count() + 5
    # exact dupes removed, plus the corpus's planted near-dup pairs
    assert report["n_out"] < docs.count()
    assert report["removed"] >= 5
    # survivors are unique by content
    n_hash = curated.select(F.md5("text")).distinct().count()
    assert n_hash == report["n_out"]


# ---------------------------------------------------------------- CC
def _uf_components(n_nodes, edges):
    """Pure-python union-find oracle: {node: min id of component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed,n,m", [(1, 30, 15), (2, 50, 60),
                                      (3, 80, 40)])
def test_connected_components_vs_union_find(spark, seed, n, m):
    import random
    from metacat_spark.llm.dedup import connected_components
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["id"]: r["component"]
           for r in connected_components(df).collect()}
    want = _uf_components(n, edges)
    assert got == want


def test_connected_components_long_chain(spark):
    """A 200-node path: diameter 200, must converge well inside the
    30-round cap (naive label propagation would need 200 rounds)."""
    from metacat_spark.llm.dedup import connected_components
    df = spark.createDataFrame([(i, i + 1) for i in range(200)],
                               ["id_a", "id_b"])
    rows = connected_components(df).collect()
    assert len(rows) == 201
    assert all(r["component"] == 0 for r in rows)


def test_near_dup_clusters(docs, spark):
    from metacat_spark.llm.dedup import (near_dup_clusters,
                                         ngram_jaccard_pairs)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.12)
    out = near_dup_clusters(docs, pairs).collect()
    assert len(out) == docs.count()            # every doc labeled
    by_id = {r["doc_id"]: r for r in out}
    # cluster representative is a member and is minimal
    clusters = {}
    for r in out:
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in clusters.items():
        assert cid == min(members)
        assert by_id[cid]["is_canonical"]
    # pair endpoints co-clustered
    for p in pairs.collect():
        assert (by_id[p["id_a"]]["cluster_id"]
                == by_id[p["id_b"]]["cluster_id"])


def test_bpe_tokens(spark):
    from metacat_spark.llm.text import bpe_token_count, bpe_tokens
    df = spark.createDataFrame(
        [("it's a test-case with 42 numbers, ok",),
         ("hello   world",), ("",)], ["text"])
    rows = (df.select(bpe_tokens(F.col("text")).alias("t"),
                      bpe_token_count(F.col("text")).alias("n"))
            .collect())
    assert rows[0]["t"] == ["it", "'s", " a", " test", "-", "case",
                            " with", " 42", " numbers", ",", " ok"]
    # no lookahead (RE2-compatible): \s+ is greedy, so the run of
    # spaces is one whitespace token and "world" gets no space prefix
    assert rows[1]["t"] == ["hello", "   ", "world"]
    assert rows[2]["n"] == 0


# ------------------------------------------- cross-corpus contamination

def _parity_split(docs):
    test = docs.where(F.col("doc_id") % 2 == 0)
    train = docs.where(F.col("doc_id") % 2 == 1)
    return test, train


def test_cross_corpus_exact_vs_duck(docs, duck):
    """Contaminated test docs = md5 joins across the parity split; the
    sf corpora have no byte-identical twins across parity, so ALSO
    check a constructed overlap (test = shifted copy of every 7th doc)
    where each test doc must resolve to exactly its source."""
    from metacat_spark.llm import dedup as DD
    test, train = _parity_split(docs)
    got = sorted((r["test_id"], r["train_id"]) for r in
                 DD.cross_corpus_exact(test, train).collect())
    want = sorted(duck.execute("""
        select a.doc_id, b.doc_id from documents a join documents b
        on md5(a.text) = md5(b.text)
        and a.doc_id % 2 = 0 and b.doc_id % 2 = 1""").fetchall())
    assert got == want
    shifted = (docs.where(F.col("doc_id") % 7 == 0)
               .select((F.col("doc_id") + 1000000).alias("doc_id"),
                       "text"))
    hits = DD.cross_corpus_exact(shifted, docs).collect()
    assert hits and all(r["test_id"] == r["train_id"] + 1000000
                        for r in hits)
    assert len(hits) == shifted.count()


def test_cross_corpus_jaccard_equals_union_filter(docs):
    """The parity split partitions `documents`, so cross-corpus
    jaccard == the within-corpus pair join on the full table filtered
    to even-odd pairs (same shingle space, same df cap)."""
    from metacat_spark.llm import dedup as DD
    test, train = _parity_split(docs)
    got = sorted((r["test_id"], r["train_id"], r["jaccard"]) for r in
                 DD.cross_corpus_jaccard(test, train, n=3,
                                         threshold=0.12).collect())
    allp = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.12).collect()
    want = sorted(
        ((r["id_a"], r["id_b"], r["jaccard"]) if r["id_a"] % 2 == 0
         else (r["id_b"], r["id_a"], r["jaccard"]))
        for r in allp
        if (r["id_a"] % 2) != (r["id_b"] % 2))
    assert got == want and got


def test_cross_corpus_lsh_precision_recall(docs):
    """Banded cross-corpus LSH: exact verification ⇒ precision 1.0 by
    construction; recall vs the exact cross pairs must be high (the sf
    corpora's cross pairs all have jaccard ≥ 0.9 at n=2, where a
    4-row×8-band collision is near-certain)."""
    from metacat_spark.llm import dedup as DD
    test, train = _parity_split(docs)
    exact = {(r["test_id"], r["train_id"]) for r in
             DD.cross_corpus_jaccard(test, train, n=2,
                                     threshold=0.5).collect()}
    lsh = {(r["test_id"], r["train_id"]) for r in
           DD.cross_corpus_lsh(test, train, n=2, k=32, bands=8,
                               threshold=0.5).collect()}
    assert lsh <= exact
    assert exact, "fixture should contain cross-parity near-dups"
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"cross-corpus LSH recall too low: {recall}"


def test_cross_corpus_colliding_ids(spark):
    """Test and train corpora very commonly BOTH number doc_ids from 0.
    Every internal key is (grp, id), so a test doc and a train doc
    sharing an id must not merge shingle sets / signatures / sizes
    (ADVICE r4): test id 0 is an exact twin of train id 1 while train
    id 0 is unrelated — the pair (0, 1) must come back with jaccard
    exactly 1.0 from both the exact-jaccard and the banded-LSH path."""
    from metacat_spark.llm import dedup as DD
    t = "the quick brown fox jumps over the lazy dog again and again"
    test = spark.createDataFrame(
        [(0, t), (1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(0, "completely unrelated filler content nothing shared here"),
         (1, t)], "doc_id long, text string")
    jac = DD.cross_corpus_jaccard(test, train, n=2, threshold=0.5,
                                  max_df=None).collect()
    assert [(r["test_id"], r["train_id"], r["jaccard"])
            for r in jac] == [(0, 1, 1.0)]
    lsh = DD.cross_corpus_lsh(test, train, n=2, k=32, bands=8,
                              threshold=0.5).collect()
    assert [(r["test_id"], r["train_id"], r["jaccard"])
            for r in lsh] == [(0, 1, 1.0)]
    ex = DD.cross_corpus_exact(test, train).collect()
    assert [(r["test_id"], r["train_id"]) for r in ex] == [(0, 1)]


def test_cross_corpus_containment_vs_duck(docs, duck):
    """Containment = |∩| / |test shingles| on the parity split must
    match the DuckDB replay (same shingle space, same df cap)."""
    from metacat_spark.llm import dedup as DD
    test, train = _parity_split(docs)
    got = sorted((r["test_id"], r["train_id"], r["n_inter"],
                  r["containment"]) for r in
                 DD.cross_corpus_containment(test, train, n=3,
                                             threshold=0.3).collect())
    want = sorted(tuple(r) for r in duck.execute("""
        with sh as (
          select doc_id as id, doc_id % 2 as grp,
                 list_distinct(case when len(toks) >= 3 then
                   [array_to_string(toks[i:i+2], ' ')
                    for i in range(1, len(toks) - 1)]
                   else [array_to_string(toks, ' ')] end) as s
          from (select doc_id,
                       string_split_regex(text, '\\s+') as toks
                from documents)),
        ex0 as (select id, grp, unnest(s) as shingle from sh),
        ex as (select * from ex0 where shingle in (
          select shingle from ex0 group by 1 having count(*) <= 1000)),
        sizes as (select id, grp, count(*) as n from ex group by 1, 2),
        inter as (
          select a.id as test_id, b.id as train_id,
                 count(*) as n_inter
          from ex a join ex b
          on a.shingle = b.shingle and a.grp = 0 and b.grp = 1
          group by 1, 2)
        select test_id, train_id, n_inter,
               round(n_inter / sa.n, 6) as containment
        from inter join sizes sa
          on sa.id = test_id and sa.grp = 0
        where n_inter / sa.n >= 0.3""").fetchall())
    assert got == want and got


def test_containment_catches_embedded_prefix(spark):
    """The statistic containment exists for: a short eval doc embedded
    verbatim in a much larger training doc scores containment 1.0
    while Jaccard dilutes below any useful threshold."""
    from metacat_spark.llm import dedup as DD
    prefix = "alpha bravo charlie delta echo foxtrot golf hotel"
    filler = " ".join(f"w{i}" for i in range(200))
    test = spark.createDataFrame([(0, prefix)],
                                 "doc_id long, text string")
    train = spark.createDataFrame([(0, prefix + " " + filler)],
                                  "doc_id long, text string")
    cont = DD.cross_corpus_containment(test, train, n=3,
                                       threshold=0.9,
                                       max_df=None).collect()
    assert [(r["test_id"], r["train_id"], r["containment"])
            for r in cont] == [(0, 0, 1.0)]
    jac = DD.cross_corpus_jaccard(test, train, n=3, threshold=0.9,
                                  max_df=None).collect()
    assert jac == []  # 6 shared shingles / 204-shingle union ≈ 0.03


def test_decontaminate(docs):
    """decontaminate = train minus the train side of the pair list,
    for every method; exact method checked against the id arithmetic
    of a constructed overlap (every 7th doc duplicated into test)."""
    from metacat_spark.llm import dedup as DD
    test = (docs.where(F.col("doc_id") % 7 == 0)
            .select((F.col("doc_id") + 1000000).alias("doc_id"),
                    "text"))
    clean = DD.decontaminate(docs, test, method="exact")
    dropped = {r["doc_id"] for r in
               docs.join(clean, "doc_id", "left_anti")
               .select("doc_id").collect()}
    want = {r["train_id"] for r in
            DD.cross_corpus_exact(test, docs).collect()}
    assert dropped == want
    # INDEPENDENT spec of the planted overlap: every 7th corpus doc
    # was copied into test, so exactly those ids must be dropped —
    # comparing only against cross_corpus_exact (which decontaminate
    # calls internally) would pass if both regressed to empty
    # (review r6)
    planted = {r["doc_id"] for r in
               docs.where(F.col("doc_id") % 7 == 0)
               .select("doc_id").collect()}
    assert dropped == planted and planted
    # containment method drops a superset of exact's (same n-gram
    # space contains every byte-identical pair at threshold <= 1)
    clean_c = DD.decontaminate(docs, test, method="containment",
                               n=3, threshold=0.99)
    dropped_c = {r["doc_id"] for r in
                 docs.join(clean_c, "doc_id", "left_anti")
                 .select("doc_id").collect()}
    assert want <= dropped_c


def test_shingle_rows_carry(docs):
    """carry= threads a per-doc constant column through without
    changing the (id, shingle) set."""
    from metacat_spark.llm import dedup as DD
    plain = DD.shingle_rows(docs.limit(40), n=3)
    tagged = DD.shingle_rows(
        docs.limit(40).withColumn("grp", F.col("doc_id") % 2),
        n=3, carry=["grp"])
    assert sorted((r["id"], r["shingle"]) for r in plain.collect()) == \
           sorted((r["id"], r["shingle"]) for r in tagged.collect())
    assert all(r["grp"] == r["id"] % 2 for r in tagged.collect())


# ------------------------------------------------------ sequence packing

def test_pack_sequences_contract(docs):
    """Every (doc, chunk) packed exactly once, no pack over capacity,
    deterministic across runs, and FFD fill stays high (measured 0.98
    mean at max_tokens=512 / group_docs=200 on the sf corpora)."""
    from metacat_spark.llm.packing import pack_sequences, packing_stats
    p = pack_sequences(docs, max_tokens=512, group_docs=200)
    rows = sorted(map(tuple, p.collect()))
    assert len(rows) == docs.count()  # no doc exceeds 512 at this sf
    assert len({(r[0], r[1]) for r in rows}) == len(rows)
    fills = {}
    for _, _, t, pid in rows:
        fills[pid] = fills.get(pid, 0) + t
    assert max(fills.values()) <= 512
    stats = packing_stats(p, 512).collect()[0]
    assert stats["n_packs"] == len(fills)
    assert stats["mean_fill"] >= 0.9
    again = sorted(map(tuple,
                       pack_sequences(docs, max_tokens=512,
                                      group_docs=200).collect()))
    assert again == rows


def test_pack_sequences_chunks_long_docs(spark):
    """Documents longer than max_tokens are pre-split into full
    windows plus a remainder; short docs pack together."""
    from metacat_spark.llm.packing import pack_sequences
    data = [(1, " ".join(["w"] * 130)),   # 130 toks -> 50,50,30
            (2, " ".join(["x"] * 49)),
            (3, " ".join(["y"] * 1))]
    df = spark.createDataFrame(data, "doc_id long, text string")
    p = pack_sequences(df, max_tokens=50, group_docs=100, n_groups=1)
    rows = {(r["doc_id"], r["chunk"]): r["n_tok"] for r in p.collect()}
    assert rows == {(1, 0): 50, (1, 1): 50, (1, 2): 30,
                    (2, 0): 49, (3, 0): 1}
    fills = {}
    for r in p.collect():
        fills.setdefault(r["pack_id"], 0)
        fills[r["pack_id"]] += r["n_tok"]
    assert max(fills.values()) <= 50
    # 180 tokens / 50-cap => at least 4 bins; FFD achieves exactly 4
    # here (50 | 50 | 49+1 | 30)
    assert len(fills) == 4


def test_pack_sequences_null_text_and_chunk_sizing(spark):
    """Null-text docs yield NO pack rows (greatest/least null-skip
    would otherwise fabricate one phantom max_tokens chunk — review
    r7), and the default n_groups sizing counts CHUNKS, not
    documents, so a single mega-document's chunks spread across
    groups instead of pinning one FFD task."""
    from metacat_spark.llm.packing import pack_sequences
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 10)), (2, None)],
        "doc_id long, text string")
    p = pack_sequences(df, max_tokens=4).collect()
    assert {r["doc_id"] for r in p} == {1}
    assert sum(r["n_tok"] for r in p) == 10
    # one 400-token doc at max_tokens=4 -> 100 chunks; group_docs=10
    # must yield multiple groups (chunk-based sizing) with every
    # chunk placed exactly once
    big = spark.createDataFrame([(7, " ".join(["z"] * 400))],
                                "doc_id long, text string")
    rows = pack_sequences(big, max_tokens=4, group_docs=10).collect()
    assert len(rows) == 100 and len({r["chunk"] for r in rows}) == 100
    groups = {r["pack_id"].split("-")[0] for r in rows}
    assert len(groups) > 1, "mega-doc chunks all pinned to one group"


def test_pack_sequences_ffd_matches_naive_first_fit(spark):
    """The segment-tree first-fit (r8, VERDICT r7 #7) must assign
    bit-identically to the naive linear scan it replaced: replay the
    same FFD order through a reference loop and compare pack ids,
    including zero-token (empty-text) chunks, over a single group so
    group hashing can't mask a divergence."""
    import random

    from metacat_spark.llm.packing import pack_sequences
    rng = random.Random(8)
    docs = [(i, " ".join(["w"] * rng.randint(1, 70)))
            for i in range(1, 120)]
    docs += [(200, ""), (201, "x")]        # a 0-token chunk
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = pack_sequences(df, max_tokens=64, n_groups=1).collect()
    # reference: naive first-fit over the documented FFD order
    order = sorted(got, key=lambda r: (-r["n_tok"], r["doc_id"],
                                       r["chunk"]))
    bins, want = [], {}
    for r in order:
        t = r["n_tok"]
        for i, rem in enumerate(bins):
            if rem >= t:
                bins[i] = rem - t
                want[(r["doc_id"], r["chunk"])] = i
                break
        else:
            bins.append(64 - t)
            want[(r["doc_id"], r["chunk"])] = len(bins) - 1
    for r in got:
        assert r["pack_id"] == f"0-{want[(r['doc_id'], r['chunk'])]}"


# --------------------------------------------------------- PII scrubbing

def test_pii_redaction_vs_duck(spark, duck):
    """Each rule fires on its canonical shape, the redacted text and
    the match counts agree with the RE2 (DuckDB) compilation of the
    SAME patterns, and clean text passes through untouched."""
    from metacat_spark.llm import text as TX
    data = [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "ssn 123-45-6789 leaked"),
        (3, "card 4111111111111111 on file"),
        (4, "call (555) 010-1234 or 555-010-4321"),
        (5, "host 192.168.0.1 up"),
        (6, "no pii here at all"),
        (7, "multi a@b.co 10.0.0.7 222-33-4444"),
        # cross-rule overlap (ADVICE r4): the 13-digit local part also
        # matches the card rule on RAW text, but only ONE replacement
        # happens — n_pii must be 1, not 2
        (8, "pay 1234567890123@x.com today"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {r["doc_id"]: (r["red"], r["n"]) for r in
           df.select("doc_id",
                     TX.redact_pii(F.col("text")).alias("red"),
                     TX.pii_count(F.col("text")).alias("n"))
           .collect()}
    assert got[1] == ("mail <EMAIL> now", 1)
    assert got[2] == ("ssn <SSN> leaked", 1)
    assert got[3] == ("card <CARD> on file", 1)
    assert got[4] == ("call <PHONE> or <PHONE>", 2)
    assert got[5] == ("host <IP> up", 1)
    assert got[6] == ("no pii here at all", 0)
    assert got[7] == ("multi <EMAIL> <IP> <SSN>", 3)
    assert got[8] == ("pay <EMAIL> today", 1)
    duck.execute("create or replace table pii_t(doc_id bigint, "
                 "text varchar)")
    duck.executemany("insert into pii_t values (?, ?)", data)
    red_sql, cnt_sql = "text", "0"
    for _, pat, repl in TX.PII_RULES:
        lit = pat.replace("'", "''")
        cnt_sql += f" + len(regexp_extract_all({red_sql}, '{lit}'))"
        red_sql = f"regexp_replace({red_sql}, '{lit}', '{repl}', 'g')"
    want = {r[0]: (r[1], r[2]) for r in duck.execute(
        f"select doc_id, {red_sql}, {cnt_sql} from pii_t").fetchall()}
    assert got == want


# ------------------------------------------------------- mixture sampling

def test_sample_to_mixture(docs):
    """Downsample-only re-balancing: the binding stratum is kept in
    full, every surviving stratum lands near T·w (deterministic hash
    filter ⇒ small fixed deviation, not RNG), non-target strata drop,
    and the operator is reproducible run-to-run."""
    from metacat_spark.llm.pipeline import (mixture_fractions,
                                            sample_to_mixture)
    target = {"en": 0.6, "de": 0.2, "fr": 0.2}
    counts_in = {r["lang"]: r["count"] for r in
                 docs.groupBy("lang").count().collect()}
    frac = mixture_fractions(counts_in, target)
    binding = min(target, key=lambda s: counts_in[s] / target[s])
    assert frac[binding] == 1.0
    out = sample_to_mixture(docs, target)
    got = {r["lang"]: r["count"] for r in
           out.groupBy("lang").count().collect()}
    assert set(got) <= set(target)
    assert got[binding] == counts_in[binding]
    T = counts_in[binding] / target[binding]
    for s, w in target.items():
        want = T * w
        assert abs(got.get(s, 0) - want) <= max(8, 0.15 * want), \
            f"{s}: got {got.get(s)} want ~{want}"
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               sample_to_mixture(docs, target)
               .select("doc_id").collect())
    assert a == b and a


def test_mixture_fractions_edge_cases():
    from metacat_spark.llm.pipeline import mixture_fractions
    # absent target stratum is ignored, zero weight is ignored
    f = mixture_fractions({"en": 100}, {"en": 0.5, "xx": 0.5,
                                        "zz": 0.0})
    assert f == {"en": 1.0}
    assert mixture_fractions({"en": 100}, {"xx": 1.0}) == {}
    # two strata, en binding: T = 200, de keeps 100/300
    f = mixture_fractions({"en": 100, "de": 300},
                          {"en": 0.5, "de": 0.5})
    assert f["en"] == 1.0 and abs(f["de"] - 1 / 3) < 1e-12


# ---------------------------------------------------- repetition signals

def test_repetition_scores_vs_duck(docs, duck):
    """Gopher-style repetition stats agree with a DuckDB replay on the
    occurrence (non-distinct) 2-gram space."""
    from metacat_spark.llm.pipeline import repetition_scores
    got = {r["doc_id"]: (r["n_ngrams"], r["dup_ngram_frac"],
                         r["top_ngram_frac"])
           for r in repetition_scores(docs, n=2).collect()}
    want = {r[0]: (r[1], r[2], r[3]) for r in duck.execute("""
        with sh as (
          select doc_id as id, len(toks) as n_tok,
                 case when len(toks) >= 2 then
                   [array_to_string(toks[i:i+1], ' ')
                    for i in range(1, len(toks))]
                   else [array_to_string(toks, ' ')] end as s
          from (select doc_id,
                       string_split_regex(text, '\\s+') as toks
                from documents)),
        ex as (select id, n_tok, unnest(s) as shingle from sh),
        per as (select id, any_value(n_tok) as n_tok, shingle,
                       count(*) as c
                from ex group by id, shingle),
        st as (select id, any_value(n_tok) as n_tok,
                      sum(c) as n_ngrams, count(*) as n_distinct,
                      max(c) as max_c
               from per group by id)
        select id, cast(n_ngrams as bigint),
               round(1 - n_distinct / n_ngrams, 6),
               round(least(1.0, max_c * 2 / n_tok), 6)
        from st""").fetchall()}
    assert got == want and got
    # word-salad corpora repeat 2-grams: the signal is non-degenerate
    assert any(v[1] > 0 for v in got.values())


def test_repetition_scores_boilerplate(spark):
    """A pathologically repetitive doc scores near 1 on both signals;
    an all-distinct doc scores 0 duplication."""
    from metacat_spark.llm.pipeline import repetition_scores
    df = spark.createDataFrame(
        [(1, ("spam ham " * 50).strip()), (2, "a b c d e f g h")],
        "doc_id long, text string")
    r = {x["doc_id"]: x for x in repetition_scores(df, n=2).collect()}
    assert r[1]["dup_ngram_frac"] > 0.97
    assert r[1]["top_ngram_frac"] == 1.0
    assert r[2]["dup_ngram_frac"] == 0.0
    assert r[2]["top_ngram_frac"] < 0.3


def test_drop_common_lines(spark):
    """CCNet-style boilerplate removal: lines shared by >= min_df
    DISTINCT docs vanish everywhere (within-doc repetition alone
    doesn't count), untouched docs pass through verbatim, fully
    boilerplate docs come back empty, null text propagates, and the
    delimiter is treated literally (regex metachars inert)."""
    from metacat_spark.llm.dedup import drop_common_lines
    df = spark.createDataFrame(
        [(1, "keep1\nCOMMON\nkeep2"),
         (2, "COMMON\nunique2"),
         (3, "solo\nsolo"),          # repeated WITHIN one doc only
         (4, "COMMON"),
         (5, None)],
        "doc_id long, text string")
    r = {x["doc_id"]: x for x in drop_common_lines(df).collect()}
    assert r[1]["text"] == "keep1\nkeep2"
    assert (r[1]["n_lines"], r[1]["n_lines_removed"]) == (3, 1)
    assert r[2]["text"] == "unique2"
    assert r[3]["text"] == "solo\nsolo"       # df counts DOCS
    assert r[3]["n_lines_removed"] == 0
    assert r[4]["text"] == "" and r[4]["n_lines_removed"] == 1
    assert r[5]["text"] is None and r[5]["n_lines_removed"] == 0
    # min_df=3: COMMON appears in 3 docs -> still dropped; raise to
    # 4 and everything survives
    r3 = {x["doc_id"]: x["n_lines_removed"]
          for x in drop_common_lines(df, min_df=3).collect()}
    assert r3[1] == 1 and r3[4] == 1
    r4 = {x["doc_id"]: x["n_lines_removed"]
          for x in drop_common_lines(df, min_df=4).collect()}
    assert set(r4.values()) == {0}
    # literal delimiter: '.' must not act as a regex wildcard
    dot = spark.createDataFrame(
        [(1, "a.BANNER.b"), (2, "BANNER.c")],
        "doc_id long, text string")
    rd = {x["doc_id"]: x["text"]
          for x in drop_common_lines(dot, delim=".").collect()}
    assert rd[1] == "a.b" and rd[2] == "c"
    with pytest.raises(ValueError):
        drop_common_lines(df, min_df=1)
    with pytest.raises(ValueError):
        drop_common_lines(df, delim="")
    # a delim containing the literal two chars \E must not escape the
    # \Q...\E quoting and turn the tail into live regex (ADVICE r8):
    # delim "\Ex" would otherwise leave a bare "x\E" pattern fragment
    esc = spark.createDataFrame(
        [(1, "a\\ExBANNER\\Exb"), (2, "BANNER\\Exc")],
        "doc_id long, text string")
    re_ = {x["doc_id"]: x["text"]
           for x in drop_common_lines(esc, delim="\\Ex").collect()}
    assert re_[1] == "a\\Exb" and re_[2] == "c"


def test_normalize_text(spark):
    """NFC composition, control stripping, and change accounting
    through the real Spark path: decomposed accents compose, C0
    controls (minus tab/newline/CR) and DEL are removed and counted,
    ASCII rows pass through unchanged (changed=false), and null text
    propagates as null."""
    import unicodedata

    from metacat_spark.llm.text import normalize_text
    decomposed = "café au lait"           # e + combining acute
    ctrl = "a\x00b\x07c\tok\x7fd"               # 3 strippable + tab
    df = spark.createDataFrame(
        [(1, decomposed), (2, ctrl), (3, "plain ascii"), (4, None)],
        "doc_id long, text string")
    r = {x["doc_id"]: x for x in normalize_text(df).collect()}
    assert r[1]["text_norm"] == unicodedata.normalize("NFC",
                                                      decomposed)
    assert r[1]["text_norm"] != decomposed      # actually composed
    assert r[1]["n_ctrl_removed"] == 0 and r[1]["changed"]
    assert r[2]["text_norm"] == "abc\tokd"      # tab survives
    assert r[2]["n_ctrl_removed"] == 3 and r[2]["changed"]
    assert r[3]["text_norm"] == "plain ascii"
    assert r[3]["n_ctrl_removed"] == 0 and not r[3]["changed"]
    assert r[4]["text_norm"] is None and r[4]["changed"] is None
    # NFKC is exposed too (compatibility fold: ligature fi -> fi)
    k = normalize_text(
        spark.createDataFrame([(1, "ﬁn")], "doc_id long, "
                              "text string"), form="NFKC").collect()
    assert k[0]["text_norm"] == "fin"
    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")


def test_chunk_tokens(spark):
    """Window arithmetic end-to-end: starts at multiples of stride,
    last window reaches the document end, short docs yield one
    chunk, chunk text is the exact token slice."""
    from metacat_spark.llm.text import chunk_tokens
    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = chunk_tokens(df, size=4, stride=3).collect()
    got = {(r["doc_id"], r["chunk_id"]):
           (r["n_chunk_tokens"], r["chunk_text"]) for r in out}
    # n=10, size=4, stride=3 -> 1 + ceil(6/3) = 3 chunks
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (4, "t3 t4 t5 t6")
    assert got[(1, 2)] == (4, "t6 t7 t8 t9")
    assert got[(2, 0)] == (2, "a b")            # short doc: 1 chunk
    # tokenizer edge: '' splits to [''] -> one empty chunk (same as
    # the shingle path; gated upstream by min_tokens in curation)
    assert got[(3, 0)] == (1, "")
    # null text -> NO chunks (greatest/least null-SKIP would
    # otherwise fabricate a phantom full-size chunk — review r7)
    assert not any(d == 4 for d, _ in got)
    assert len(got) == 5
    # contiguous windows (stride == size) tile exactly
    tile = chunk_tokens(df.where("doc_id = 1"), size=5,
                        stride=5).collect()
    assert {(r["chunk_id"], r["chunk_text"]) for r in tile} == \
        {(0, "t0 t1 t2 t3 t4"), (1, "t5 t6 t7 t8 t9")}
    # stride defaults to 3/4 of size (size-only callers keep the
    # standard overlap ratio — review r7)
    drv = chunk_tokens(df.where("doc_id = 1"), size=4).collect()
    assert {(r["chunk_id"], r["chunk_text"]) for r in drv} == \
        {(0, "t0 t1 t2 t3"), (1, "t3 t4 t5 t6"), (2, "t6 t7 t8 t9")}
    with pytest.raises(ValueError):
        chunk_tokens(df, size=0)
    with pytest.raises(ValueError):
        chunk_tokens(df, size=4, stride=5)   # gapped windows


# ------------------------------------------- corpus reporting/selection

_QUALITY_SQL = """
    round((case when (length(text) -
            (len(string_split_regex(text, '\\s+')) - 1))
            / len(string_split_regex(text, '\\s+'))
            between 3.0 and 10.0 then 1.0 else 0.5 end) * 0.5
      + least(len(list_filter(string_split_regex(text, '\\s+'),
                x -> x = 'the'))
              / len(string_split_regex(text, '\\s+')) * 5.0, 1.0) * 0.3
      + (1.0 - least((length(text) -
            length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
            / length(text) * 4.0, 1.0)) * 0.2, 6)
"""


def test_source_report_vs_duck(docs, duck):
    from metacat_spark.llm.pipeline import source_report
    got = sorted(tuple(r) for r in
                 source_report(docs)
                 .select("source", "n_docs", "n_tokens", "avg_quality",
                         "n_exact_dups").collect())
    want = sorted(tuple(r) for r in duck.execute(f"""
        with q as (select source,
                          len(string_split_regex(text, '\\s+'))
                            as n_tok,
                          md5(text) as h, {_QUALITY_SQL} as qv
                   from documents)
        select source, count(*) as n_docs,
               cast(sum(n_tok) as bigint) as n_tokens,
               round(avg(qv), 4) as avg_quality,
               count(*) - count(distinct h) as n_exact_dups
        from q group by source""").fetchall())
    assert got == want and got


def test_select_token_budget_vs_duck(docs, duck):
    """The distributed two-level cumsum must reproduce the sequential
    (score desc, doc_id) prefix exactly, cum_tok included."""
    from metacat_spark.llm.pipeline import select_token_budget
    total = docs.select(
        F.sum(F.size(F.split("text", r"\s+")))).collect()[0][0]
    budget = total // 2  # must split the corpus to be a real test
    got = sorted(tuple(r) for r in
                 select_token_budget(docs, budget).collect())
    want = sorted(tuple(r) for r in duck.execute(f"""
        with s as (select doc_id,
                          len(string_split_regex(text, '\\s+'))
                            as n_tok,
                          round({_QUALITY_SQL}, 3) as score
                   from documents),
        c as (select *, cast(sum(n_tok) over (
                order by score desc, doc_id
                rows between unbounded preceding and current row)
                as bigint) as cum_tok from s)
        select doc_id, n_tok, score, cum_tok from c
        where cum_tok <= {budget}""").fetchall())
    assert got == want and got
    total = sum(r[1] for r in got)
    assert total <= budget


def test_select_token_budget_prefix_maximality(docs):
    """Adding the single next-ranked excluded doc must overflow the
    budget (the selection is the MAXIMAL prefix, not just any
    subset under budget)."""
    from metacat_spark.llm.pipeline import select_token_budget
    total = docs.select(
        F.sum(F.size(F.split("text", r"\s+")))).collect()[0][0]
    budget = total // 2
    sel = select_token_budget(docs, budget)
    rows = sel.collect()
    total = sum(r["n_tok"] for r in rows)
    chosen = {r["doc_id"] for r in rows}
    from metacat_spark.llm.text import quality_score, token_count
    ranked = (docs.select("doc_id",
                          token_count(F.col("text")).alias("n_tok"),
                          F.round(quality_score(F.col("text")), 3)
                          .alias("score"))
              .collect())
    excluded = sorted((r for r in ranked if r["doc_id"] not in chosen),
                      key=lambda r: (-r["score"], r["doc_id"]))
    assert excluded, "budget should not cover the whole corpus"
    assert total + excluded[0]["n_tok"] > budget


def test_bigram_logprob_vs_duck(docs, duck):
    from metacat_spark.llm.text import bigram_logprob
    got = sorted((r["doc_id"], r["avg_logprob"], r["n_bigrams"])
                 for r in bigram_logprob(docs.limit(300))
                 .withColumnRenamed("id", "doc_id").collect())
    want = sorted(tuple(r) for r in duck.execute("""
        with lim as (select * from documents order by doc_id
                     limit 300),
        base as (select doc_id,
                        string_split_regex(text, '\\s+') as t
                 from lim),
        b0 as (select doc_id as id,
                      unnest([{'w1': lower(t[i]), 'w2': lower(t[i+1])}
                              for i in range(1, len(t))]) as p
               from base),
        b as (select id, p.w1 as w1, p.w2 as w2 from b0),
        bc as (select w1, w2, count(*) as c12 from b group by 1, 2),
        c1 as (select w1, sum(c12) as c1 from bc group by 1),
        c2 as (select w2, count(*) as c2 from b group by 1),
        tot as (select count(*) as t_occ,
                       count(distinct w2) as n_vocab from b)
        select id as doc_id,
               round(avg(ln(0.75 * c12 / c1
                 + 0.25 * (c2 + 1) / (t_occ + n_vocab))), 6)
                 as avg_logprob,
               count(*) as n_bigrams
        from b join bc using (w1, w2) join c1 using (w1)
          join c2 using (w2) cross join tot
        group by id""").fetchall())
    assert got == want and got


def test_bigram_logprob_orders_coherence(spark):
    """Within one corpus, a document with predictable transitions must
    outscore one whose words each precede many different successors —
    the property a perplexity gate ranks on.  (Note the failure mode a
    naive test hits: REPEATED gibberish is perfectly predictable and
    scores high; low bigram probability requires the same left-word to
    fan out over many right-words.)"""
    from metacat_spark.llm.text import bigram_logprob
    vocab = [f"v{i}" for i in range(10)]
    # every ordered pair once: each left word fans out over 9
    # successors uniformly ⇒ each transition ~1/18 likely
    soup = " ".join(w for a in vocab for b in vocab if a != b
                    for w in (a, b))
    common = "v0 v1 " * 30  # one dominant transition
    df = spark.createDataFrame(
        [(0, common.strip()), (1, soup)],
        "doc_id long, text string")
    got = {r["id"]: r["avg_logprob"]
           for r in bigram_logprob(df).collect()}
    assert got[0] > got[1] + 0.5


# ---------------------------------------- incremental + semantic dedup

def test_dedup_against(docs, spark):
    """Admission filter for a growing corpus: exact re-ingests are
    rejected, novel docs pass, within-batch dupes collapse, and the
    whole thing is idempotent."""
    from metacat_spark.llm import dedup as DD
    copies = (docs.limit(10)
              .select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                      "text"))
    novel = spark.createDataFrame(
        [(3_000_000, "genuinely new content alpha"),
         (3_000_001, "genuinely new content beta"),
         (3_000_002, "genuinely new content beta")],  # in-batch dup
        "doc_id long, text string")
    batch = copies.unionByName(novel)
    corpus = docs.select("doc_id", "text")
    admitted = DD.dedup_against(batch, corpus)
    got = sorted(r["doc_id"] for r in admitted.collect())
    assert got == [3_000_000, 3_000_001]  # min-id survivor of the dup
    # idempotent: admitting the batch against corpus+admitted = empty
    again = DD.dedup_against(batch, corpus.unionByName(admitted))
    assert again.count() == 0


def test_semantic_dedup_vs_duck(docs, embs, duck):
    """Survivors = canonical member of each cosine-threshold connected
    component, checked against the recursive-CTE oracle."""
    from metacat_spark.llm import dedup as DD
    out = DD.semantic_dedup(docs, embs, threshold=0.35)
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    want = sorted(r[0] for r in duck.execute("""
        with recursive pairs as (
          select a.vec_id as id_a, b.vec_id as id_b
          from embeddings a join embeddings b on a.vec_id < b.vec_id
          where round(list_cosine_similarity(a.embedding::double[],
                                             b.embedding::double[]), 6)
                >= 0.35),
        edges as (select id_a as a, id_b as b from pairs
                  union select id_b, id_a from pairs),
        reach as (
          select a, b from edges
          union
          select r.a, e.b from reach r join edges e on r.b = e.a),
        comp as (select a as vid, least(a, min(b)) as cluster_id
                 from reach group by a)
        select doc_id from documents d
        where not exists (select 1 from comp c
                          where c.vid = d.doc_id
                            and c.cluster_id <> d.doc_id)
        """).fetchall())
    assert got == want and got
    assert len(got) < docs.count()  # clusters exist at 0.35


def test_corpus_stats_vs_duck(docs, duck):
    from metacat_spark.llm.text import corpus_stats
    got = [tuple(r) for r in corpus_stats(docs).collect()]
    want = [tuple(r) for r in duck.execute("""
        with tok as (select doc_id as id, lower(t) as term from (
               select doc_id,
                      unnest(string_split_regex(text, '\\s+')) as t
               from documents) u where t <> ''),
        tf as (select term, count(*) as cnt from tok group by 1),
        d as (select count(distinct doc_id) as n_docs from documents)
        select n_docs, cast(sum(cnt) as bigint) as n_tokens,
               count(*) as n_vocab,
               round(count(*) / sum(cnt), 6) as type_token_ratio,
               round(sum(case when cnt = 1 then 1 else 0 end)
                     / count(*), 6) as hapax_frac,
               round(max(cnt) / sum(cnt), 6) as top_term_share
        from tf cross join d group by n_docs""").fetchall()]
    assert got == want and got[0][1] > 0


def test_ngram_containment_pairs_vs_duck(docs, duck):
    """Within-corpus subset detection: oriented contained→container,
    |∩|/|smaller| — must match the DuckDB replay."""
    from metacat_spark.llm import dedup as DD
    got = sorted(tuple(r) for r in
                 DD.ngram_containment_pairs(docs, n=3, threshold=0.5)
                 .collect())
    want = sorted(tuple(r) for r in duck.execute("""
        with sh as (
          select doc_id as id,
                 list_distinct(case when len(toks) >= 3 then
                   [array_to_string(toks[i:i+2], ' ')
                    for i in range(1, len(toks) - 1)]
                   else [array_to_string(toks, ' ')] end) as s
          from (select doc_id,
                       string_split_regex(text, '\\s+') as toks
                from documents)),
        ex0 as (select id, unnest(s) as shingle from sh),
        ex as (select * from ex0 where shingle in (
          select shingle from ex0 group by 1 having count(*) <= 1000)),
        sizes as (select id, count(*) as n from ex group by 1),
        inter as (
          select a.id as x, b.id as y, count(*) as n_inter
          from ex a join ex b
          on a.shingle = b.shingle and a.id < b.id group by 1, 2),
        j as (select x, y, n_inter, sa.n as nx, sb.n as ny
              from inter join sizes sa on sa.id = x
                join sizes sb on sb.id = y)
        select case when nx < ny or (nx = ny and x < y)
                    then x else y end as id_a,
               case when nx < ny or (nx = ny and x < y)
                    then y else x end as id_b,
               n_inter,
               round(n_inter / least(nx, ny), 6) as containment
        from j where n_inter / least(nx, ny) >= 0.5""").fetchall())
    assert got == want and got


def test_containment_pairs_orientation(spark):
    """id_a is always the contained (smaller-set) side: a short doc
    quoted inside a long one comes back as (short, long, 1.0)."""
    from metacat_spark.llm import dedup as DD
    short = "alpha bravo charlie delta echo foxtrot"
    longd = short + " " + " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(7, longd), (9, short)],
                               "doc_id long, text string")
    rows = DD.ngram_containment_pairs(df, n=3, threshold=0.9,
                                      max_df=None).collect()
    assert [(r["id_a"], r["id_b"], r["containment"])
            for r in rows] == [(9, 7, 1.0)]


def test_corpus_divergence_vs_duck(docs, duck):
    """JS divergence between the src0 and src1 sub-corpora must match
    the DuckDB replay of the same smoothed-union-vocab formula."""
    from metacat_spark.llm.text import corpus_divergence
    a = docs.where("source = 'src0'")
    b = docs.where("source = 'src1'")
    got = [tuple(r) for r in corpus_divergence(a, b).collect()]
    want = [tuple(r) for r in duck.execute("""
        with tok as (select source, lower(t) as term from (
               select source,
                      unnest(string_split_regex(text, '\\s+')) as t
               from documents
               where source in ('src0', 'src1')) u where t <> ''),
        ta as (select term, count(*) as ca from tok
               where source = 'src0' group by 1),
        tb as (select term, count(*) as cb from tok
               where source = 'src1' group by 1),
        u as (select coalesce(ta.term, tb.term) as term,
                     coalesce(ca, 0) as ca, coalesce(cb, 0) as cb
              from ta full outer join tb on ta.term = tb.term),
        tot as (select sum(ca) as na, sum(cb) as nb,
                       count(*) as v from u),
        w as (select (ca + 1) / (na + v) as pa,
                     (cb + 1) / (nb + v) as pb
              from u cross join tot)
        select count(*) as n_terms_union,
               round(sum(pa * ln(pa / ((pa + pb) / 2))), 6) as kl_a_m,
               round(sum(pb * ln(pb / ((pa + pb) / 2))), 6) as kl_b_m,
               round((sum(pa * ln(pa / ((pa + pb) / 2)))
                      + sum(pb * ln(pb / ((pa + pb) / 2)))) / 2, 6)
                 as js_divergence
        from w""").fetchall()]
    assert got == want and got
    assert 0 <= got[0][3] < math.log(2) + 1e-9


def test_corpus_divergence_properties(spark):
    """Identical corpora diverge ~0; disjoint-vocabulary corpora
    approach ln 2 (smoothing keeps them strictly below)."""
    from metacat_spark.llm.text import corpus_divergence
    # enough mass that add-one smoothing doesn't wash out the signal
    a = spark.createDataFrame(
        [(0, "alpha beta gamma delta " * 50)],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(0, "omega psi chi phi " * 50)],
        "doc_id long, text string")
    same = corpus_divergence(a, a).collect()[0]
    assert abs(same["js_divergence"]) < 1e-6
    diff = corpus_divergence(a, b).collect()[0]
    assert 0.4 < diff["js_divergence"] < math.log(2)


# ------------------------------------------- exact-substring span dedup

def test_duplicate_spans_planted(spark):
    """A 10-token phrase shared by two docs yields one maximal span in
    each, covering exactly the phrase (n=8 grams, islands merged);
    adjacent duplicated grams merge rather than emitting per-gram."""
    from metacat_spark.llm.dedup import duplicate_spans
    phrase = " ".join(f"p{i}" for i in range(10))
    rows = [
        (1, f"a b c d e {phrase} x y z"),          # phrase at pos 5..14
        (2, f"{phrase} q r s t u v w m n o"),      # phrase at pos 0..9
        (3, "entirely unique words only here today friends nothing"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_id): (r.span_start, r.span_end, r.span_tokens)
           for r in duplicate_spans(df, n=8, min_count=2).collect()}
    assert got == {1: (5, 15, 10), 2: (0, 10, 10)}


def test_duplicate_spans_within_doc_repeat(spark):
    """min_count counts occurrences corpus-wide INCLUDING within-doc
    repeats — a doc that repeats its own 8-gram is flagged."""
    from metacat_spark.llm.dedup import duplicate_spans
    gram = " ".join(f"g{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, f"{gram} filler one two three four five six {gram}")],
        ["doc_id", "text"])
    spans = duplicate_spans(df, n=8, min_count=2).collect()
    cover = {(r.span_start, r.span_end) for r in spans}
    assert cover == {(0, 8), (15, 23)}


def test_scrub_duplicate_spans_planted(spark):
    """Scrub removes exactly the duplicated tokens and keeps order;
    a fully-duplicated doc comes back with empty text, not dropped."""
    from metacat_spark.llm.dedup import scrub_duplicate_spans
    phrase = " ".join(f"p{i}" for i in range(10))
    rows = [(1, f"a b c d e {phrase} x y z"),
            (2, phrase),
            (3, f"{phrase} tail1 tail2")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.text, r.n_tok_before, r.n_tok_after)
           for r in scrub_duplicate_spans(df, n=8, min_count=2)
           .collect()}
    assert got[1] == ("a b c d e x y z", 18, 8)
    assert got[2] == ("", 10, 0)
    assert got[3] == ("tail1 tail2", 12, 2)


def test_duplicate_spans_vs_duck(docs, duck):
    """Corpus-level spans at n=8 match the DuckDB islands replay."""
    from metacat_spark.llm.dedup import duplicate_spans
    import __spark_entry__ as E
    got = sorted(tuple(r) for r in
                 duplicate_spans(docs, n=8, min_count=2).collect())
    want = sorted(tuple(r) for r in duck.execute(
        E.oracle_sql()["dedup_substring_spans"]).fetchall())
    assert got == want


def test_duplicate_char_spans_planted(spark):
    """Char-granularity spans land on CHARACTER offsets, not token
    boundaries: a repeated 12-char substring embedded mid-token is
    found with exact char edges (k=10 grams, islands merged); docs
    shorter than k with an exact twin are flagged whole."""
    from metacat_spark.llm.dedup import duplicate_char_spans
    dup = "XYZQWERTY123"                      # 12 chars, mid-word
    # filler chars are all-distinct runs: a repeated-char run of
    # >= k chars would legitimately self-duplicate its own grams
    rows = [
        (1, f"abcd{dup}efghijklmnop"),        # dup at chars 4..15
        (2, f"qrstuvwx{dup}yzabcdef"),        # dup at chars 8..19
        (3, "totally different content here with nothing shared x"),
        (4, "tiny twin"), (5, "tiny twin"),   # len 9 < k: whole-text
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.span_start, r.span_end, r.span_chars)
           for r in duplicate_char_spans(df, k=10,
                                         min_count=2).collect()}
    assert got == {1: (4, 16, 12), 2: (8, 20, 12),
                   4: (0, 9, 9), 5: (0, 9, 9)}


def test_duplicate_char_spans_within_doc_repeat(spark):
    """min_count counts occurrences corpus-wide INCLUDING within-doc
    repeats, as the token variant does."""
    from metacat_spark.llm.dedup import duplicate_char_spans
    rep = "0123456789"
    df = spark.createDataFrame(
        [(1, f"{rep}---filler-text---{rep}")], ["doc_id", "text"])
    cover = {(r.span_start, r.span_end)
             for r in duplicate_char_spans(df, k=10,
                                           min_count=2).collect()}
    assert cover == {(0, 10), (27, 37)}


def test_duplicate_char_spans_vs_duck(docs, duck):
    """Corpus-level char spans at k=30 match the DuckDB substring
    islands replay (the dedup_substring_chars oracle)."""
    from metacat_spark.llm.dedup import duplicate_char_spans
    import __spark_entry__ as E
    got = sorted(tuple(r) for r in
                 duplicate_char_spans(docs, k=30,
                                      min_count=2).collect())
    want = sorted(tuple(r) for r in duck.execute(
        E.oracle_sql()["dedup_substring_chars"]).fetchall())
    assert got == want and got


def test_duplicate_char_spans_hash_grams_parity(docs, spark):
    """hash_grams=True (xxhash64 count key — the narrow-exchange
    option for extreme scale, VERDICT r10 #3) returns span-for-span
    identical results to the string-key default, on the real corpus
    AND on the planted fixture."""
    from metacat_spark.llm.dedup import duplicate_char_spans
    plain = sorted(tuple(r) for r in
                   duplicate_char_spans(docs, k=30,
                                        min_count=2).collect())
    hashed = sorted(tuple(r) for r in
                    duplicate_char_spans(docs, k=30, min_count=2,
                                         hash_grams=True).collect())
    assert plain == hashed and plain
    dup = "XYZQWERTY123"
    df = spark.createDataFrame(
        [(1, f"abcd{dup}efghijklmnop"), (2, f"qrstuvwx{dup}yz")],
        ["doc_id", "text"])
    assert (sorted(tuple(r) for r in duplicate_char_spans(
                df, k=10, min_count=2).collect())
            == sorted(tuple(r) for r in duplicate_char_spans(
                df, k=10, min_count=2, hash_grams=True).collect()))


# ------------------------------------------------------------- IVF-PQ

def test_ivf_pq_rerank_matches_ivf_recall(embs):
    """With exact re-rank, the ADC shortlist must lose (almost)
    nothing vs plain IVF at the same list/probe settings — PQ prunes
    the GEMM, it doesn't change what survives it (measured equal at
    0.927 on sf0.01)."""
    from metacat_spark.llm import similarity as SIM
    exact = {(r["id"], r["neighbor_id"]) for r in
             SIM.topk_gemm(embs, k=3).collect()}
    ivf = {(r["id"], r["neighbor_id"]) for r in
           SIM.ivf_topk(embs, k=3, n_lists=8, n_probe=4).collect()}
    pq = {(r["id"], r["neighbor_id"]) for r in
          SIM.ivf_pq_topk(embs, k=3, n_lists=8, n_probe=4,
                          shortlist=24).collect()}
    r_ivf = len(ivf & exact) / len(exact)
    r_pq = len(pq & exact) / len(exact)
    assert r_pq >= r_ivf - 0.02, f"ADC shortlist lost recall: " \
        f"ivf={r_ivf:.3f} pq={r_pq:.3f}"


def test_ivf_pq_pure_adc_nontrivial(embs):
    """Pure-ADC mode (rerank=False, codes-only member rows) must
    still rank far above chance even on near-random vectors: the
    quantized scores carry real signal (measured ~0.53 at m=8/256
    codes; chance for k=3 of 500 is ~0.006)."""
    from metacat_spark.llm import similarity as SIM
    exact = {(r["id"], r["neighbor_id"]) for r in
             SIM.topk_gemm(embs, k=3).collect()}
    adc = {(r["id"], r["neighbor_id"]) for r in
           SIM.ivf_pq_topk(embs, k=3, n_lists=8, n_probe=6,
                           rerank=False).collect()}
    assert len(adc & exact) / len(exact) >= 0.25


def test_ivf_pq_codes_shape_deterministic(embs):
    """Same input → identical results (no RNG anywhere); the PQ
    codebook itself is shape-checked directly (the top-k output does
    not expose per-member codes — review r6 removed the docstring's
    unbacked claim)."""
    import numpy as np
    from metacat_spark.llm import similarity as SIM
    R = np.arange(64 * 16, dtype=float).reshape(16, 64) % 7 - 3
    CB = SIM._train_pq(R, m=8, n_codes=4)
    assert CB.shape == (8, 4, 8)     # (m, n_codes, dim/m)
    a = sorted((r["id"], r["neighbor_id"], r["cosine"]) for r in
               SIM.ivf_pq_topk(embs, k=2, n_lists=8, n_probe=4,
                               n_codes=64).collect())
    b = sorted((r["id"], r["neighbor_id"], r["cosine"]) for r in
               SIM.ivf_pq_topk(embs, k=2, n_lists=8, n_probe=4,
                               n_codes=64).collect())
    assert a == b


# -------------------------------------------------- corpus hash split

def test_split_corpus_partition_properties(docs):
    """Exhaustive + disjoint by construction; proportions near the
    80/10/10 recipe; and STABLE under growth — the split of any
    subset agrees with the split of the whole corpus."""
    from metacat_spark.llm.pipeline import split_corpus
    full = {r["doc_id"]: r["split"]
            for r in split_corpus(docs).select("doc_id",
                                               "split").collect()}
    assert len(full) == docs.count()
    n = len(full)
    frac_train = sum(1 for s in full.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9
    assert set(full.values()) == {"train", "val", "test"}
    sub = {r["doc_id"]: r["split"]
           for r in split_corpus(docs.limit(100))
           .select("doc_id", "split").collect()}
    assert all(full[i] == s for i, s in sub.items())


def test_split_corpus_salt_independence(docs):
    """A different salt derives a DIFFERENT (but still deterministic)
    partition from the same ids."""
    from metacat_spark.llm.pipeline import split_corpus
    a = {r["doc_id"]: r["split"] for r in
         split_corpus(docs).select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in
         split_corpus(docs, salt="v2").select("doc_id",
                                              "split").collect()}
    assert a != b
    b2 = {r["doc_id"]: r["split"] for r in
          split_corpus(docs, salt="v2").select("doc_id",
                                               "split").collect()}
    assert b == b2


# ------------------------------------------------- classifier scoring

def test_classifier_score_known_values(spark):
    """Hand-computable case: mean-pool over occurrences (multiplicity
    counts), OOV→0, sigmoid(bias + mean)."""
    import math
    from metacat_spark.llm.text import classifier_score
    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "unknown words only")],
        ["doc_id", "text"])
    w = spark.createDataFrame(
        [("good", 1.0), ("bad", -2.0)], ["term", "weight"])
    got = {r["doc_id"]: (r["n_terms"], r["raw"], r["score"])
           for r in classifier_score(docs, w, bias=0.5).collect()}
    assert got[1][0] == 3
    assert abs(got[1][1] - 0.0) < 1e-9          # (1+1-2)/3
    assert abs(got[1][2]
               - 1 / (1 + math.exp(-0.5))) < 1e-6
    assert got[2] == (3, 0.0, round(1 / (1 + math.exp(-0.5)), 6))


# ------------------------------------------- Gopher gate / C4 lines

def test_gopher_flags_known_cases(spark):
    from metacat_spark.llm.text import gopher_gate
    good = ("the quick brown fox jumps over the lazy dog and then "
            "some more words that have to be written with care " * 3)
    df = spark.createDataFrame(
        [(1, good), (2, "short text"), (3, "#### " * 60)],
        ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in gopher_gate(df).collect()}
    assert got[1]["gopher_pass"] is True
    assert got[2]["words_ok"] is False and not got[2]["gopher_pass"]
    assert got[3]["hash_ratio_ok"] is False


def test_c4_line_filter_known_case(spark):
    from metacat_spark.llm.text import c4_line_filter
    text = ("This line is long enough and ends properly.\n"
            "short\n"
            "var x = { javascript: true }\n"
            "Lorem ipsum dolor sit amet etc.\n"
            "Another good sentence survives here!")
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = c4_line_filter(df).collect()[0]
    assert r["text"] == ("This line is long enough and ends properly."
                         "\nAnother good sentence survives here!")
    assert r["n_lines_before"] == 5 and r["n_lines_after"] == 2


def test_curate_stream_equals_batch_stages(spark):
    """The streaming curation front half must produce exactly the
    batch stages' content set (gate -> redact -> exact dedup)."""
    from metacat_spark.llm.pipeline import curate_stream
    from metacat_spark.llm.text import (quality_score, redact_pii,
                                        token_count)
    src = f"{SF_DIR}/documents.parquet"
    got = {r["h"] for r in
           curate_stream(spark, src, min_quality=0.3,
                         table="curate_stream_eq")
           .select(F.md5("text").alias("h")).collect()}
    docs = spark.read.parquet(src)
    batch = (docs
             .withColumn("n_tok", token_count(F.col("text")))
             .withColumn("quality", quality_score(F.col("text")))
             .where((F.col("n_tok") >= 1) & (F.col("quality") >= 0.3))
             .withColumn("text", redact_pii(F.col("text"))))
    want = {r["h"] for r in
            batch.select(F.md5("text").alias("h")).distinct()
            .collect()}
    assert got == want and len(got) > 0


# --------------------------------------------- image perceptual dedup

def _gradient_rows(w, h, flip_one=False):
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            v = min(255, int(255 * x / max(1, w - 1)))
            row.append((v, v, v))
        rows.append(row)
    if flip_one:
        rows[0][0] = (255, 255, 255)  # single-pixel edit
    return rows


def test_image_dhash_and_near_dup(spark):
    """Near-identical images (single-pixel edit) land within Hamming
    3; a structurally different image (reversed gradient) does not
    pair with them; undecodable payloads are excluded."""
    from metacat_spark.llm import multimodal as MM
    w, h = 16, 12
    a = _bmp_bytes(w, h, _gradient_rows(w, h))
    b = _bmp_bytes(w, h, _gradient_rows(w, h, flip_one=True))
    c = _bmp_bytes(w, h, [list(reversed(r))
                          for r in _gradient_rows(w, h)])
    rows = [(1, "image", bytearray(a)), (2, "image", bytearray(b)),
            (3, "image", bytearray(c)),
            (4, "image", bytearray(b"not a bmp at all"))]
    df = spark.createDataFrame(
        rows, "asset_id long, modality string, content binary")
    sig = {r["asset_id"]: (r["dhash"], r["decode_ok"])
           for r in MM.image_dhash(df).collect()}
    assert sig[4] == (None, False)
    assert sig[1][1] and sig[2][1] and sig[3][1]
    assert sig[1][0] != sig[3][0]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in MM.image_near_dup_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_image_dhash_resize_invariance(spark):
    """The same gradient rendered at two sizes hashes within Hamming
    3 — the resilience that byte-level hashing lacks."""
    from metacat_spark.llm import multimodal as MM
    a = _bmp_bytes(16, 12, _gradient_rows(16, 12))
    b = _bmp_bytes(32, 24, _gradient_rows(32, 24))
    df = spark.createDataFrame(
        [(1, "image", bytearray(a)), (2, "image", bytearray(b))],
        "asset_id long, modality string, content binary")
    pairs = MM.image_near_dup_pairs(df).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] <= 3


def test_audio_fingerprint_near_dup(spark):
    """Same envelope at different gain (half volume) pairs within
    Hamming 3 (gain invariance); a reversed envelope does not; a
    non-WAV payload is excluded."""
    import math
    from metacat_spark.llm import multimodal as MM
    n = 6500
    ramp = [int(20000 * i / n * math.sin(i)) for i in range(n)]
    half = [v // 2 for v in ramp]
    rev = list(reversed(ramp))
    rows = [(1, "audio", bytearray(_wav_bytes(8000, ramp))),
            (2, "audio", bytearray(_wav_bytes(8000, half))),
            (3, "audio", bytearray(_wav_bytes(8000, rev))),
            (4, "audio", bytearray(b"RIFFnope"))]
    df = spark.createDataFrame(
        rows, "asset_id long, modality string, content binary")
    sig = {r["asset_id"]: (r["afp"], r["decode_ok"])
           for r in MM.audio_fingerprint(df).collect()}
    assert sig[4] == (None, False)
    assert sig[1][1] and sig[3][1] and sig[1][0] != sig[3][0]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in MM.audio_near_dup_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs


# ------------------------------------------------ hashed doc vectors

def test_hashed_doc_vectors_properties(spark):
    """Identical texts → identical unit vectors; disjoint vocab →
    ~orthogonal; high-overlap → high cosine; all rows unit-norm."""
    from metacat_spark.llm.similarity import hashed_doc_vectors
    df = spark.createDataFrame([
        (1, "apple banana cherry apple date fig grape"),
        (2, "apple banana cherry apple date fig grape"),
        (3, "apple banana cherry apple date fig grapefruit"),
        (4, "xq1 xq2 xq3 xq4 xq5 xq6 xq7"),
    ], ["doc_id", "text"])
    rows = {r["doc_id"]: r["vector"]
            for r in hashed_doc_vectors(df, dim=32).collect()}
    assert rows[1] == rows[2]
    for v in rows.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))
    assert cos(rows[1], rows[3]) > 0.8
    assert abs(cos(rows[1], rows[4])) < 0.5


def test_hashed_doc_vectors_feed_vector_ops(docs):
    """The hashed vectors plug straight into the vector operators:
    cosine_pairs over them finds the planted exact copy."""
    from metacat_spark.llm.similarity import (cosine_pairs,
                                              hashed_doc_vectors)
    base = docs.limit(50).select("doc_id", "text")
    copies = base.limit(5).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text")
    vecs = hashed_doc_vectors(base.unionByName(copies))
    pairs = cosine_pairs(vecs, threshold=0.999, vec_col="vector",
                         id_col="doc_id")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = {(r["doc_id"], r["doc_id"] + 1000000)
            for r in base.limit(5).collect()}
    assert want <= got


def test_asset_dedup_image_survivors(spark):
    """Perceptual asset dedup end-to-end: near-identical images
    collapse to the min-id survivor; distinct and undecodable
    assets survive untouched."""
    from metacat_spark.llm import multimodal as MM
    w, h = 16, 12
    a = _bmp_bytes(w, h, _gradient_rows(w, h))
    b = _bmp_bytes(w, h, _gradient_rows(w, h, flip_one=True))
    c = _bmp_bytes(w, h, [list(reversed(r))
                          for r in _gradient_rows(w, h)])
    rows = [(1, "image", bytearray(a)), (2, "image", bytearray(b)),
            (3, "image", bytearray(c)),
            (4, "image", bytearray(b"junk")),
            (5, "audio", bytearray(a))]
    df = spark.createDataFrame(
        rows, "asset_id long, modality string, content binary")
    kept = sorted(r["asset_id"]
                  for r in MM.asset_dedup(df, "image").collect())
    assert kept == [1, 3, 4]  # 2 collapsed into 1; audio excluded


def test_curate_v2_stages_monotone(docs):
    """curate_v2 invariants: survivors ⊆ gate survivors; scrubbed
    token counts never exceed pre-scrub; no empty-text survivors;
    no surviving pair above the near-dup threshold (recomputed)."""
    from metacat_spark.llm.dedup import ngram_jaccard_pairs
    from metacat_spark.llm.pipeline import curate_v2
    from metacat_spark.llm.text import quality_score, token_count
    out = curate_v2(docs).cache()
    rows = out.collect()
    assert rows and all(r["n_tok_after"] > 0 for r in rows)
    assert all(r["n_tok_after"] <= r["n_tok_before"] for r in rows)
    # survivors ⊆ gate survivors, recomputed INDEPENDENTLY on the
    # input (the docstring promised this but nothing asserted it —
    # review r6)
    c = F.col("text")
    gate_ids = {r["doc_id"] for r in docs.where(
        (quality_score(c) >= 0.3) & (token_count(c) >= 5))
        .select("doc_id").collect()}
    assert {r["doc_id"] for r in rows} <= gate_ids
    left = ngram_jaccard_pairs(out, n=3, threshold=0.12).collect()
    assert left == []


# ------------------------------------------------- corpus publishing

def test_export_corpus_manifest_roundtrip(docs, spark, tmp_path):
    """Published corpus reads back as the exact content set; the
    manifest's reader-side recheck passes; totals = sum of shards."""
    from metacat_spark.llm.export import export_corpus, verify_manifest
    dest = str(tmp_path / "pub")
    man = export_corpus(docs.select("doc_id", "text"), dest,
                        n_shards=4)
    assert man["rows"] == docs.count()
    assert man["rows"] == sum(s["rows"] for s in man["shards"].values())
    back = spark.read.parquet(dest)
    assert back.count() == man["rows"]
    a = {r["doc_id"] for r in back.select("doc_id").collect()}
    b = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert a == b
    assert verify_manifest(spark, dest)


def test_to_webdataset_deterministic_tars(docs, spark, tmp_path):
    """Tar shards contain every document exactly once, sorted by id
    within a shard, and two exports are byte-identical."""
    import hashlib
    import tarfile
    from metacat_spark.llm.export import to_webdataset
    sub = docs.limit(60).select("doc_id", "text")
    d1 = str(tmp_path / "wds1")
    d2 = str(tmp_path / "wds2")
    shards1 = to_webdataset(sub, d1, n_shards=3)
    shards2 = to_webdataset(sub, d2, n_shards=3)
    seen = {}
    for p in shards1:
        with tarfile.open(p) as tar:
            names = tar.getnames()
            assert names == sorted(names,
                                   key=lambda n: int(n[:-4]))
            for nm in names:
                seen[int(nm[:-4])] = tar.extractfile(nm).read()
    want = {r["doc_id"]: r["text"].encode()
            for r in sub.collect()}
    assert seen == want
    h1 = [hashlib.md5(open(p, "rb").read()).hexdigest()
          for p in shards1]
    h2 = [hashlib.md5(open(p, "rb").read()).hexdigest()
          for p in shards2]
    assert h1 == h2


def test_export_edge_cases_null_and_empty(spark, tmp_path):
    """Review-r7 export hardening: null text publishes as an EMPTY
    tar member (never the literal 'None'); no .tmp- attempt files
    survive a successful export (each attempt writes a temp name
    and commits by rename); an all-null corpus publishes a manifest
    with tokens/checksum 0 that verifies; an EMPTY corpus publishes
    a zero-row manifest instead of dying after the overwrite."""
    import os
    import tarfile

    from metacat_spark.llm.export import (export_corpus,
                                          to_webdataset,
                                          verify_manifest)
    df = spark.createDataFrame([(1, "real text"), (2, None)],
                               "doc_id long, text string")
    d = str(tmp_path / "wds_null")
    shards = to_webdataset(df, d, n_shards=1)
    with tarfile.open(shards[0]) as tar:
        members = {n: tar.extractfile(n).read() for n in tar.getnames()}
    assert members["1.txt"] == b"real text"
    assert members["2.txt"] == b""
    assert not [f for f in os.listdir(d) if ".tmp-" in f]

    nulls = spark.createDataFrame([(1, None), (2, None)],
                                  "doc_id long, text string")
    dn = str(tmp_path / "pub_nulls")
    man = export_corpus(nulls, dn, n_shards=1)
    # tokens: sum over all-null sizes is NULL -> coalesced to 0
    # (the pre-fix int(None) crash); checksum: xxhash64 hashes a
    # null column to the per-row seed hash, so it is nonzero but
    # CONSISTENT between manifest and recheck
    assert man["rows"] == 2 and man["tokens"] == 0
    assert verify_manifest(spark, dn)

    empty = spark.createDataFrame([], "doc_id long, text string")
    de = str(tmp_path / "pub_empty")
    man = export_corpus(empty, de, n_shards=2)
    assert man["rows"] == 0 and man["shards"] == {}
    assert verify_manifest(spark, de)


def test_export_zero_row_fallback_guarded_by_data_files(spark,
                                                        tmp_path):
    """ADVICE r8: the zero-row-manifest fallback fires only when the
    destination truly holds no data files — _has_data_files ignores
    _-/.-prefixed names (the _SUCCESS/_manifest convention) and sees
    through partition subdirectories, so a read-back failure over a
    NON-empty write re-raises instead of publishing rows=0."""
    import os

    from metacat_spark.llm.export import _has_data_files
    d = tmp_path / "dest"
    assert not _has_data_files(spark, str(d))          # no dir at all
    (d / "__shard=0").mkdir(parents=True)
    open(d / "_SUCCESS", "w").close()
    open(d / "__shard=0" / ".part.crc", "w").close()
    assert not _has_data_files(spark, str(d))          # markers only
    open(d / "__shard=0" / "part-0.parquet", "w").close()
    assert _has_data_files(spark, str(d))              # real data file
    os.remove(d / "__shard=0" / "part-0.parquet")


def test_export_corpus_json_format_ignores_manifest(docs, spark,
                                                    tmp_path):
    """json-format export must read back cleanly — the manifest is
    _-prefixed so Spark's listing skips it (a bare manifest.json
    would be parsed as data rows by spark.read.json)."""
    from metacat_spark.llm.export import export_corpus, verify_manifest
    dest = str(tmp_path / "pubj")
    man = export_corpus(docs.select("doc_id", "text"), dest,
                        fmt="json", n_shards=2)
    back = spark.read.json(dest)
    assert back.count() == man["rows"]
    assert verify_manifest(spark, dest)


def test_divergence_stream_matches_batch(docs, spark, tmp_path):
    """Each micro-batch's drift row equals the batch-mode
    corpus_divergence of that file against the reference."""
    from metacat_spark.llm.text import (corpus_divergence,
                                        divergence_stream)
    src = str(tmp_path / "stream_src")
    a = docs.where("doc_id % 2 = 0").select("doc_id", "text")
    b = docs.where("doc_id % 2 = 1").select("doc_id", "text")
    a.coalesce(1).write.parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    ref = docs.where("source = 'src0'").select("doc_id", "text")
    out = divergence_stream(spark, src, ref).collect()
    assert len(out) == 2
    assert all(r["js_divergence"] > 0 for r in out)
    # one batch is file A or file B — its row must match batch mode
    want = {round(corpus_divergence(x, ref).collect()[0]
                  ["js_divergence"], 6) for x in (a, b)}
    got = {r["js_divergence"] for r in out}
    assert got == want


def test_curate_v2_ledger_consistency(docs):
    """The ledger partitions ALL input docs; its 'kept' set equals
    curate_v2's survivors exactly."""
    from metacat_spark.llm.pipeline import curate_v2, curate_v2_ledger
    led = {r["doc_id"]: r["fate"]
           for r in curate_v2_ledger(docs).collect()}
    assert len(led) == docs.count()
    kept = {r["doc_id"] for r in curate_v2(docs).collect()}
    assert {i for i, f in led.items() if f == "kept"} == kept
    assert set(led.values()) <= {
        "kept", "dropped_gate", "dropped_exact_dup",
        "scrubbed_empty", "dropped_near_dup"}


def test_moore_lewis_ranks_target_like_docs_higher(spark):
    """Cross-entropy difference: a raw doc written in the target
    domain's vocabulary must outscore one written in the raw pool's
    own generic vocabulary; scores are finite for terms the target
    never saw (add-one backoff)."""
    from metacat_spark.llm.text import moore_lewis_scores
    target = spark.createDataFrame(
        [(100 + i, "quark lepton boson detector calorimeter")
         for i in range(5)], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "quark boson detector readings today"),
         (2, "cheap shoes sale discount coupon"),
         (3, "cheap shoes sale discount coupon"),
         (4, "unseenword1 unseenword2 unseenword3")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           moore_lewis_scores(raw, target).collect()}
    assert got[1]["ml_score"] > got[2]["ml_score"]
    assert got[1]["n_terms"] == 5
    # all-unseen doc gets a finite (smoothed) score
    assert got[4]["ml_score"] is not None


def test_cap_per_domain_keeps_top_n_by_quality(docs, spark):
    """Every domain keeps at most n survivors, ranks are contiguous
    from 1, survivors are that domain's top-quality docs, and ties
    break by id (deterministic replay)."""
    from metacat_spark.llm.pipeline import cap_per_domain
    out = cap_per_domain(docs, n=5).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    n_domains = docs.select("source").distinct().count()
    assert len(by_dom) == n_domains
    for dom, rows in by_dom.items():
        assert len(rows) <= 5
        assert sorted(r["rank"] for r in rows) \
            == list(range(1, len(rows) + 1))
        qs = [r["quality"] for r in
              sorted(rows, key=lambda r: r["rank"])]
        assert qs == sorted(qs, reverse=True)


def test_cap_per_domain_pre_reduce_parity(docs, spark):
    """The salted two-phase plan must return EXACTLY the one-window
    plan's rows — pre-reduction is a pure physical rewrite (top-n is
    closed under per-salt-bucket top-n with the same ordering key)."""
    from metacat_spark.llm.pipeline import cap_per_domain
    key = lambda r: (r["source"], r["rank"])
    two = sorted((r.asDict() for r in
                  cap_per_domain(docs, n=3).collect()), key=key)
    one = sorted((r.asDict() for r in
                  cap_per_domain(docs, n=3,
                                 pre_reduce_salts=1).collect()),
                 key=key)
    assert two == one


def test_curate_v3_stage_semantics(spark, docs):
    """The r8 seven-stage pipeline: normalization fires FIRST (a
    decomposed-accent doc exact-dedups against its composed twin),
    boilerplate lines shared across docs vanish before near-dup (so
    a shared banner can't fuse distinct docs into Jaccard pairs),
    and a doc that was ALL boilerplate gets the boilerplate_empty
    fate."""
    from metacat_spark.llm.pipeline import curate_v3, curate_v3_ledger
    banner = "subscribe to the newsletter today please"
    body_a = ("the cat sat on the mat and the dog ran through the "
              "park while the birds sang in the trees all morning")
    body_b = ("a completely different story about the sea and the "
              "ships that sail across the wide blue water at dawn")
    df = spark.createDataFrame(
        [(1, body_a + "\n" + banner),
         # decomposed é twin of doc 3's composed é: normalize-first
         # makes them EXACT duplicates (min-id 2 survives)
         (2, body_b + " café\n" + banner),
         (3, body_b + " café\n" + banner),
         (4, banner),                    # all boilerplate
         (5, "x")],                      # fails the token gate
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in curate_v3(df).collect()}
    assert set(out) == {1, 2}
    assert banner not in out[1] and banner not in out[2]
    assert "é" in out[2] and "́" not in out[2]
    led = {r["doc_id"]: r["fate"]
           for r in curate_v3_ledger(df).collect()}
    assert led == {1: "kept", 2: "kept", 3: "dropped_exact_dup",
                   4: "boilerplate_empty", 5: "dropped_gate"}
    # the sf corpus flows through with every fate accounted for
    led_sf = curate_v3_ledger(docs).groupBy("fate").count().collect()
    assert sum(r["count"] for r in led_sf) == docs.count()


def test_semantic_dedup_text_collapses_copies(docs, spark):
    """Text-only semantic dedup: planted exact copies collapse to
    the min-id survivor without any embeddings table."""
    from metacat_spark.llm.dedup import semantic_dedup_text
    base = docs.limit(40).select("doc_id", "text")
    copies = base.limit(6).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text")
    out = semantic_dedup_text(base.unionByName(copies))
    kept = {r["doc_id"] for r in out.collect()}
    assert len(kept) == 40
    assert all(i < 1000000 for i in kept)


def test_divergent_terms_decomposes_js(docs, spark):
    """Summing js_contrib over the FULL vocabulary reproduces
    corpus_divergence's js_divergence — it's a decomposition."""
    from metacat_spark.llm.text import (corpus_divergence,
                                        divergent_terms)
    a = docs.where("source = 'src0'")
    b = docs.where("source = 'src1'")
    full = divergent_terms(a, b, k=None)
    total = full.agg(F.sum("js_contrib").alias("s")).collect()[0]["s"]
    js = corpus_divergence(a, b).collect()[0]["js_divergence"]
    assert abs(total - js) < 1e-4


def test_quality_quantile_gate_fraction(docs):
    """Keeps ~the requested fraction (ties at the cutoff may push it
    slightly over, never under) and every survivor clears the
    cutoff."""
    from metacat_spark.llm.pipeline import quality_quantile_gate
    from metacat_spark.llm.text import quality_score
    n = docs.count()
    out = quality_quantile_gate(docs, keep_frac=0.75).collect()
    assert 0.75 * n <= len(out) <= 0.80 * n
    # survivor >= cutoff is the operator's own filter re-applied (it
    # cannot fail — review r6); pin the cutoff against an INDEPENDENT
    # quantile computation instead
    cutoff = out[0]["cutoff"]
    assert all(r["cutoff"] == cutoff for r in out)
    qs = sorted(r["q"] for r in docs.select(
        quality_score(F.col("text")).alias("q")).collect()
        if r["q"] is not None)
    below = sum(1 for q in qs if q < cutoff)
    # at most 25% of the corpus scores below the cutoff, and the
    # cutoff is a real attained percentile, not 0
    assert below <= 0.25 * n and cutoff > 0


def test_cluster_stats_accounts_for_all_docs(docs):
    """Σ size × count == corpus size (every doc in exactly one
    cluster, singletons included)."""
    from metacat_spark.llm.dedup import (cluster_stats,
                                         ngram_jaccard_pairs)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.12)
    rows = cluster_stats(docs, pairs).collect()
    assert sum(r["cluster_size"] * r["n_clusters"]
               for r in rows) == docs.count()
    assert any(r["cluster_size"] > 1 for r in rows)


def test_scrub_preserves_untouched_whitespace(spark):
    """Documents with NO duplicated span pass through with their
    ORIGINAL text — newlines and space runs intact — rather than a
    single-space-rejoined rendering (ADVICE r5: corpus-wide
    whitespace normalization breaks line-oriented stages like
    c4_line_filter downstream). Touched docs are still rebuilt."""
    from metacat_spark.llm.dedup import scrub_duplicate_spans
    phrase = " ".join(f"p{i}" for i in range(10))
    keepme = "line one.\nline two has  double  spaces.\n\tindented"
    rows = [(1, f"a b c d e {phrase} x y z"),
            (2, phrase),
            (3, keepme)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.text, r.n_tok_before, r.n_tok_after)
           for r in scrub_duplicate_spans(df, n=8, min_count=2)
           .collect()}
    assert got[1] == ("a b c d e x y z", 18, 8)
    assert got[2] == ("", 10, 0)
    assert got[3] == (keepme, 8, 8)      # verbatim, tokens uncut


def test_hamming_pairs_bands_follow_max_hamming(spark):
    """Band count derives from max_hamming (bands = max_hamming + 1),
    so recall holds for ANY threshold — the old fixed 4-band split
    only guaranteed distance <= 3 and silently missed pairs beyond
    (ADVICE r5). Plant pairs at distances 5 and 7 spread across all
    four 16-bit quarters so no single quarter matches."""
    from metacat_spark.llm.dedup import hamming_pairs
    base = 0x0123456789ABCDEF
    # flip one bit in each 16-bit quarter + one more (distance 5)
    d5 = base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)
                 | (1 << 1))
    # distance 7: two bits in three quarters, one in the fourth
    d7 = base ^ ((1 << 2) | (1 << 3) | (1 << 17) | (1 << 18)
                 | (1 << 33) | (1 << 34) | (1 << 49))
    def s64(v):  # to signed 64-bit
        return v - (1 << 64) if v >= (1 << 63) else v
    df = spark.createDataFrame(
        [(1, s64(base)), (2, s64(d5)), (3, s64(d7))],
        "id long, sig long")
    got5 = {(r.id_a, r.id_b, r.hamming) for r in hamming_pairs(
        df, sig_col="sig", max_hamming=5).collect()}
    assert (1, 2, 5) in got5
    assert not any(p[:2] == (1, 3) for p in got5)
    got7 = {(r.id_a, r.id_b) for r in hamming_pairs(
        df, sig_col="sig", max_hamming=7).collect()}
    assert {(1, 2), (1, 3)} <= got7
    # distance-0 degenerate case still works (1 band = whole word)
    got0 = {(r.id_a, r.id_b) for r in hamming_pairs(
        df.unionByName(spark.createDataFrame([(4, s64(base))],
                                             "id long, sig long")),
        sig_col="sig", max_hamming=0).collect()}
    assert got0 == {(1, 4)}


def test_ivf_pq_rejects_indivisible_m(embs):
    """dim % m != 0 must raise instead of silently dropping the
    trailing dimensions from the codebooks (ADVICE r5)."""
    import pytest as _pt
    from metacat_spark.llm import similarity as SIM
    with _pt.raises(ValueError, match="not divisible"):
        SIM.ivf_pq_topk(embs, k=2, n_lists=4, n_probe=2, m=7).count()


def _png_bytes(rows, color=2, filters=None, depth=8, interlace=0,
               palette=None):
    """Minimal PNG encoder for fixtures: depths 1/2/4/8/16, color
    type 0 (gray, rows of ints), 2 (RGB, rows of (r,g,b)), or 3
    (palette, rows of indices + ``palette`` list of (r,g,b)),
    per-row filter type chosen by ``filters`` (default all 0) with
    the filtered bytes computed properly — so decode exercises every
    unfilter path. 16-bit samples encode big-endian; sub-byte
    samples pack MSB-first with the row padded to a byte boundary;
    filtering steps one PIXEL of bytes (bpp, rounded up to 1) per
    RFC 2083 §6.2 and operates on the PACKED bytes. ``interlace=1``
    writes Adam7: seven independently-filtered sub-images in pass
    order (filters then index the CONCATENATED pass scanline
    sequence)."""
    import struct
    import zlib
    h = len(rows)
    nch = {0: 1, 2: 3, 3: 1}[color]
    nbytes = depth // 8

    def sample(v):
        return (struct.pack(">H", v) if depth == 16
                else bytes([v]))

    if depth < 8:
        def line_of(row):
            out, acc, nbits = bytearray(), 0, 0
            for v in row:
                acc = (acc << depth) | (v & ((1 << depth) - 1))
                nbits += depth
                if nbits == 8:
                    out.append(acc)
                    acc, nbits = 0, 0
            if nbits:
                out.append(acc << (8 - nbits))
            return bytes(out)
    elif color == 2:
        def line_of(row):
            return b"".join(sample(v) for px in row for v in px)
    else:
        def line_of(row):
            return b"".join(sample(v) for v in row)
    w = len(rows[0])

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    bpp = max(1, nch * nbytes)
    if interlace:
        # Adam7 pass scanline sequences: each pass is its own image
        passes = []
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8),
                               (0, 4, 4, 8), (2, 0, 4, 4),
                               (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            sub = [row[x0::dx] for row in rows[y0::dy]]
            if sub and sub[0]:
                passes.append(sub)
    else:
        passes = [rows]

    raw, li = b"", 0
    for sub in passes:
        wp = len(sub[0])
        stride = ((wp * depth + 7) // 8 if depth < 8
                  else wp * bpp)
        prev = bytes(stride)
        for row in sub:
            line = line_of(row)
            ft = filters[li] if filters else 0
            li += 1
            out = bytearray()
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b_ = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 0:
                    v = line[x]
                elif ft == 1:
                    v = (line[x] - a) & 0xFF
                elif ft == 2:
                    v = (line[x] - b_) & 0xFF
                elif ft == 3:
                    v = (line[x] - (a + b_) // 2) & 0xFF
                else:
                    p = a + b_ - c
                    pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else \
                        (b_ if pb <= pc else c)
                    v = (line[x] - pr) & 0xFF
                out.append(v)
            raw += bytes([ft]) + bytes(out)
            prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       interlace)
    plte = (chunk(b"PLTE", b"".join(bytes(p) for p in palette))
            if palette is not None else b"")
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + plte
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png_decode_kernel_all_filters():
    """The stdlib PNG kernel recovers exact pixels through EVERY
    filter type (None/Sub/Up/Average/Paeth) for RGB and grayscale;
    malformed/unsupported containers raise."""
    import numpy as np
    import pytest as _pt

    from metacat_spark.llm import multimodal as MM
    rows = [[((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 7) % 256)
             for x in range(6)] for y in range(5)]
    for filters in (None, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                    [0, 1, 2, 3, 4]):
        px = MM._png_pixels(_png_bytes(rows, filters=filters))
        want = np.array(rows, dtype=np.uint8)
        assert (px == want).all(), f"filters={filters}"
    gray = [[(x * 13 + y) % 256 for x in range(4)] for y in range(3)]
    px = MM._png_pixels(_png_bytes(gray, color=0, filters=[4, 2, 1]))
    assert (px[:, :, 0] == np.array(gray, dtype=np.uint8)).all()
    assert (px[:, :, 0] == px[:, :, 2]).all()      # gray expanded
    with _pt.raises(ValueError):
        MM._png_pixels(b"\x89PNG\r\n\x1a\n" + b"junk" * 10)
    with _pt.raises(ValueError):
        MM.decode_png(b"not a png")
    f = MM.decode_png(_png_bytes([[(255, 0, 0), (0, 255, 0)],
                                  [(0, 0, 255), (255, 255, 255)]]))
    assert f[:3] == [2.0, 2.0, 3.0] and f[7] == 4.0
    assert abs(f[3] - 0.5) < 1e-6 and abs(f[6] - 0.5) < 1e-6


def test_png_decode_16bit_depth():
    """16-bit PNGs decode through every filter type to exactly the
    high byte of each big-endian sample (the standard 16→8
    reduction), for RGB and gray; a 16-bit gradient decodes
    byte-identically to the 8-bit encode of the same high bytes
    (the reference decode); invalid 16-bit palette PNGs raise
    (VERDICT r6 #6)."""
    import numpy as np
    import pytest as _pt

    from metacat_spark.llm import multimodal as MM
    h, w = 5, 6
    rows = [[((x * 9973 + y * 257) % 65536,
              (x * 123) % 65536, (y * 511) % 65536)
             for x in range(w)] for y in range(h)]
    want = (np.array(rows, dtype=np.uint32) >> 8).astype(np.uint8)
    for filters in (None, [1] * h, [2] * h, [3] * h, [4] * h,
                    [0, 1, 2, 3, 4]):
        px = MM._png_pixels(_png_bytes(rows, depth=16,
                                       filters=filters))
        assert (px == want).all(), f"filters={filters}"
    gray = [[(x * 300 + y * 7) % 65536 for x in range(4)]
            for y in range(3)]
    px = MM._png_pixels(_png_bytes(gray, color=0, depth=16,
                                   filters=[4, 2, 1]))
    gwant = (np.array(gray, dtype=np.uint32) >> 8).astype(np.uint8)
    assert (px[:, :, 0] == gwant).all()
    assert (px[:, :, 0] == px[:, :, 2]).all()
    # the same image's high bytes encoded at 8-bit must decode
    # byte-identically — pins the 16-bit path to the 8-bit reference
    px8 = MM._png_pixels(_png_bytes(
        [[tuple(want[y, x]) for x in range(w)] for y in range(h)]))
    px16 = MM._png_pixels(_png_bytes(rows, depth=16,
                                     filters=[3] * h))
    assert (px8 == px16).all()
    # 16-bit palette is invalid per spec
    import struct as _st
    import zlib as _zl

    def _chunk(t, b):
        return (_st.pack(">I", len(b)) + t + b
                + _st.pack(">I", _zl.crc32(t + b) & 0xFFFFFFFF))
    ihdr = _st.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"PLTE", bytes(3))
           + _chunk(b"IDAT", _zl.compress(b"\x00\x00\x00"))
           + _chunk(b"IEND", b""))
    with _pt.raises(ValueError):
        MM._png_pixels(bad)


def test_png_decode_adam7_interlace():
    """Adam7-interlaced PNGs decode to the SAME pixels as the
    non-interlaced encode of the same image. 9×10 exercises partial
    passes (odd width/height), the filter list cycles through every
    filter type across the concatenated pass scanlines (each pass an
    independent filter sequence), and 8-bit RGB / 16-bit gray /
    tiny-image (empty passes) cases all pin interlaced ≡ straight."""
    from metacat_spark.llm import multimodal as MM

    w, h = 9, 10
    rgb = [[(((y * 31 + x * 7) % 256), (x * 13) % 256,
             (y * 17 + x) % 256) for x in range(w)]
           for y in range(h)]
    # 20 pass scanlines for 9×10 (2+2+1+3+2+5+5) — cycle the filters
    filt = [i % 5 for i in range(20)]
    straight = MM._png_pixels(_png_bytes(rgb))
    inter = MM._png_pixels(_png_bytes(rgb, filters=filt, interlace=1))
    assert (straight == inter).all()

    gray16 = [[(y * 4096 + x * 257) % 65536 for x in range(w)]
              for y in range(h)]
    s16 = MM._png_pixels(_png_bytes(gray16, color=0, depth=16))
    i16 = MM._png_pixels(_png_bytes(gray16, color=0, depth=16,
                                    filters=filt, interlace=1))
    assert (s16 == i16).all()

    # 2×2: passes 2-5 are EMPTY (no scanlines, not even filter
    # bytes) — the decoder must not consume anything for them
    tiny = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    st = MM._png_pixels(_png_bytes(tiny))
    it = MM._png_pixels(_png_bytes(tiny, interlace=1))
    assert (st == it).all()


def test_png_decode_subbyte_depths():
    """1/2/4-bit PNGs decode exactly: gray scales by 255/(2^d−1)
    (an integer for all three depths, so the expansion is exact),
    palette indices look up PLTE entries, every filter type
    unfilters the PACKED row bytes with bpp=1 (the spec round-up),
    Adam7 sub-byte passes bit-pack to their OWN byte-padded row
    width (interlaced ≡ straight), and illegal depth/color
    combinations raise. Closes the PNG kernel's last documented
    gap (r7)."""
    import numpy as np
    import pytest as _pt

    from metacat_spark.llm import multimodal as MM

    # width 11 pads mid-byte at every depth (11/22/44 bits per row)
    w, h = 11, 7
    for d in (1, 2, 4):
        mx = (1 << d) - 1
        rows = [[(x * 3 + y * 5) % (mx + 1) for x in range(w)]
                for y in range(h)]
        want = np.array(rows, dtype=np.uint8) * (255 // mx)
        for filters in (None, [1] * h, [2] * h, [3] * h, [4] * h,
                        [0, 1, 2, 3, 4, 1, 2]):
            px = MM._png_pixels(_png_bytes(rows, color=0, depth=d,
                                           filters=filters))
            assert (px[:, :, 0] == want).all(), (d, filters)
            assert (px[:, :, 0] == px[:, :, 2]).all()
        # Adam7 ≡ straight, with filters cycling across the
        # concatenated pass scanlines (each pass pads independently)
        n_lines = sum(hp for x0, y0, dx, dy in MM._ADAM7
                      if (wp := (w - x0 + dx - 1) // dx) > 0
                      and (hp := (h - y0 + dy - 1) // dy) > 0)
        filt = [i % 5 for i in range(n_lines)]
        straight = MM._png_pixels(_png_bytes(rows, color=0, depth=d))
        inter = MM._png_pixels(_png_bytes(rows, color=0, depth=d,
                                          filters=filt, interlace=1))
        assert (straight == inter).all(), f"adam7 depth={d}"

    # palette at depth 4 and 2: indices look up PLTE triples
    pal = [(i * 16, 255 - i * 16, (i * 37) % 256) for i in range(16)]
    rows4 = [[(x + y) % 16 for x in range(5)] for y in range(4)]
    px = MM._png_pixels(_png_bytes(rows4, color=3, depth=4,
                                   palette=pal))
    want = np.array(pal, dtype=np.uint8)[np.array(rows4)]
    assert (px == want).all()
    rows2 = [[(x * y) % 4 for x in range(9)] for y in range(3)]
    px = MM._png_pixels(_png_bytes(rows2, color=3, depth=2,
                                   palette=pal[:4],
                                   filters=[1, 4, 2]))
    want = np.array(pal[:4], dtype=np.uint8)[np.array(rows2)]
    assert (px == want).all()
    # palette index past PLTE still raises at sub-byte depths
    with _pt.raises(ValueError):
        MM._png_pixels(_png_bytes([[3]], color=3, depth=2,
                                  palette=pal[:2]))

    # illegal depth/color combinations raise (PNG spec §11.2.2);
    # sub-byte rows encode as scalars regardless of declared color
    with _pt.raises(ValueError):
        MM._png_pixels(_png_bytes([[1]], color=2, depth=4))
    with _pt.raises(ValueError):
        MM._png_pixels(_png_bytes([[1]], color=0, depth=3))


def test_png_rides_dhash_dedup_path(spark):
    """A PNG re-encode of a BMP image produces the IDENTICAL dHash
    (same pixels, container-independent) and pairs with it through
    image_near_dup_pairs; extract_features marks PNGs
    decode_ok=true (VERDICT r5 #6: a compressed format genuinely
    exercises the decode path)."""
    from metacat_spark.llm import multimodal as MM
    w, h = 16, 12
    grads = _gradient_rows(w, h)
    bmp = _bmp_bytes(w, h, grads)
    png = _png_bytes(grads, filters=[x % 5 for x in range(h)])
    df = spark.createDataFrame(
        [(1, "image", bytearray(bmp)), (2, "image", bytearray(png))],
        "asset_id long, modality string, content binary")
    sig = {r["asset_id"]: (r["dhash"], r["decode_ok"])
           for r in MM.image_dhash(df).collect()}
    assert sig[1][1] and sig[2][1]
    assert sig[1][0] == sig[2][0]
    pairs = MM.image_near_dup_pairs(df).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0
    feats = {r["asset_id"]: r for r in MM.extract_features(
        df.select("asset_id", F.lit("image").alias("modality"),
                  "content",
                  F.lit(None).cast("string").alias("mime"),
                  F.lit(None).cast("int").alias("width"),
                  F.lit(None).cast("int").alias("height"),
                  F.lit(None).cast("long").alias("duration_ms")))
        .collect()}
    assert feats[2]["decode_ok"] is True
    assert feats[2]["feature"][0] == float(w)


def test_corrupt_png_is_decode_miss_not_crash(spark):
    """A payload with a valid PNG signature but corrupt internals
    (bad deflate stream, short IHDR) must surface as
    decode_ok=false / null-hash, never crash the Spark task
    (review r6: zlib.error and struct.error escaped the
    except-ValueError handlers)."""
    import struct
    import zlib
    from metacat_spark.llm import multimodal as MM

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad_idat = sig + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", b"\x00not deflate\xff") + chunk(b"IEND", b"")
    short_ihdr = sig + chunk(b"IHDR", ihdr[:9]) + \
        chunk(b"IDAT", zlib.compress(b"\x00" * 14)) + chunk(b"IEND", b"")
    feats, ok = MM._decode_any(bad_idat)
    assert ok is False and len(feats) == 8
    feats, ok = MM._decode_any(short_ihdr)
    assert ok is False
    df = spark.createDataFrame(
        [(1, "image", bytearray(bad_idat)),
         (2, "image", bytearray(short_ihdr))],
        "asset_id long, modality string, content binary")
    rows = {r["asset_id"]: r for r in MM.image_dhash(df).collect()}
    assert rows[1]["decode_ok"] is False and rows[1]["dhash"] is None
    assert rows[2]["decode_ok"] is False


def test_lsh_bands_must_divide_k(docs):
    """bands > k (or not dividing k) must raise: rows = k//bands = 0
    makes every band signature the empty string, degenerating the
    banded join into the full O(n^2) cross join (review r6)."""
    import pytest as _pt
    from metacat_spark.llm import dedup as DD
    with _pt.raises(ValueError, match="bands"):
        DD.minhash_lsh_pairs(docs, k=8, bands=16)
    with _pt.raises(ValueError, match="bands"):
        DD.minhash_lsh_pairs(docs, k=32, bands=7)
    with _pt.raises(ValueError, match="bands"):
        DD.cross_corpus_lsh(docs.limit(5), docs.limit(5),
                            k=8, bands=16)


def test_asset_dedup_rejects_unknown_modality(docs, spark):
    """A typo'd modality must not silently ride the audio path and
    report zero duplicates (review r6). 'video' is SUPPORTED since
    r13 (animation frame-hash pairs): synthetic video payloads are
    not decodable GIFs, so every asset survives as a singleton."""
    import pytest as _pt
    from metacat_spark.llm import multimodal as MM
    assets = MM.synthesize_assets(docs)
    with _pt.raises(ValueError, match="modality"):
        MM.asset_dedup(assets, modality="Image")
    with _pt.raises(ValueError, match="modality"):
        MM.asset_dedup(assets, modality="gif")
    vid = assets.where("modality = 'video'")
    assert MM.asset_dedup(assets, modality="video").count() \
        == vid.count()


def test_signatures_shuffle_is_narrow_by_default(docs):
    """minhash_signatures must NOT drag the shingle text through the
    shuffle unless diagnostics ask for it (review r6)."""
    from metacat_spark.llm import dedup as DD
    cols = DD.minhash_signatures(docs, n=2, k=8).columns
    assert "sh" not in cols
    cols = DD.minhash_signatures(docs, n=2, k=8,
                                 include_shingles=True).columns
    assert "sh" in cols


# ----------------------------------------------------------------- JPEG

from metacat_spark.llm.multimodal import \
    encode_jpeg_baseline as _jpeg_bytes  # noqa: E402


def _smooth_rows(w, h):
    """Low-frequency RGB content — JPEG quantization error stays in
    single digits here, so round-trip tolerances can be tight."""
    return [[(min(255, 10 + 4 * x), min(255, 20 + 4 * y), 128)
             for x in range(w)] for y in range(h)]


def test_jpeg_decode_roundtrip_444_and_gray():
    import numpy as np
    from metacat_spark.llm import multimodal as MM
    w, h = 24, 17                        # non-multiples exercise crop
    orig = np.array(_smooth_rows(w, h), dtype=float)
    px = MM._jpeg_pixels(_jpeg_bytes(_smooth_rows(w, h)))
    assert px.shape == (h, w, 3) and px.dtype == np.uint8
    err = np.abs(px.astype(float) - orig)
    assert err.mean() < 3 and err.max() < 16
    gray_rows = [[min(255, 8 * x + 2 * y) for x in range(w)]
                 for y in range(h)]
    gx = MM._jpeg_pixels(_jpeg_bytes(gray_rows, sub="gray"))
    assert gx.shape == (h, w, 3)
    assert (gx[:, :, 0] == gx[:, :, 1]).all()
    gerr = np.abs(gx[:, :, 0].astype(float) - np.array(gray_rows))
    assert gerr.mean() < 3 and gerr.max() < 16


def test_jpeg_flat_color_near_exact():
    import numpy as np
    from metacat_spark.llm import multimodal as MM
    rows = [[(57, 200, 33)] * 16 for _ in range(8)]
    px = MM._jpeg_pixels(_jpeg_bytes(rows))
    err = np.abs(px.astype(float) - np.array(rows, dtype=float))
    assert err.max() <= 4                # DC quantization + rounding


def test_jpeg_420_subsampling():
    import numpy as np
    from metacat_spark.llm import multimodal as MM
    w, h = 32, 24
    orig = np.array(_smooth_rows(w, h), dtype=float)
    px = MM._jpeg_pixels(_jpeg_bytes(_smooth_rows(w, h), sub="420"))
    assert px.shape == (h, w, 3)
    # luma must stay tight; chroma pays the 2x2 averaging
    luma = lambda a: (0.299 * a[..., 0] + 0.587 * a[..., 1]
                      + 0.114 * a[..., 2])
    assert np.abs(luma(px.astype(float)) - luma(orig)).mean() < 3
    assert np.abs(px.astype(float) - orig).mean() < 6


def test_jpeg_restart_intervals_decode_identically():
    import numpy as np
    from metacat_spark.llm import multimodal as MM
    rows = _smooth_rows(32, 32)
    plain = MM._jpeg_pixels(_jpeg_bytes(rows))
    restarted = MM._jpeg_pixels(_jpeg_bytes(rows, restart=2))
    # restart markers only reset predictors — identical pixels
    assert np.array_equal(plain, restarted)


def test_jpeg_rejects_nonhuffman_and_feature_contract():
    import pytest as _pytest
    from metacat_spark.llm import multimodal as MM
    data = _jpeg_bytes(_smooth_rows(16, 16))
    # flip SOF0 -> SOF2 on a BASELINE stream: the scan script is
    # illegal progressive (Ss=0 with Se=63) — a clean decode MISS,
    # not a garbage decode
    fake_prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError, match="progressive scan"):
        MM._jpeg_pixels(fake_prog)
    feats, ok = MM._decode_any(fake_prog)
    assert not ok and len(feats) == 8          # histogram fallback
    # arithmetic-coded SOF markers stay rejected
    arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with _pytest.raises(ValueError, match="Huffman JPEG"):
        MM._jpeg_pixels(arith)
    with _pytest.raises(ValueError):
        MM._jpeg_pixels(b"\xff\xd8\xff\xd9")   # no frame
    f = MM.decode_jpeg(data)
    assert f[0] == 16.0 and f[1] == 16.0 and f[2] == 3.0
    assert f[7] == 256.0 and 0.0 < f[6] < 1.0
    feats2, ok2 = MM._decode_any(data)
    assert ok2 and feats2 == f


def _noisy_rows(w, h, seed=42):
    import numpy as np
    rng = np.random.RandomState(seed)
    return [[tuple(int(v) for v in rng.randint(0, 256, 3))
             for _ in range(w)] for _ in range(h)]


def test_jpeg_progressive_equals_baseline():
    """The round-trip certificate for the progressive kernel: the
    progressive encoder writes the IDENTICAL quantized coefficients
    as the baseline encoder, so decoding its SOF2 stream (spectral
    selection + successive approximation + EOB runs, the libjpeg
    default script) must reproduce the baseline decode
    pixel-for-pixel — on smooth, noisy, subsampled, grayscale,
    sparse/dense-coefficient, and restart-interval content."""
    import numpy as np
    from metacat_spark.llm import multimodal as MM
    noisy = _noisy_rows(40, 33)
    cases = [
        (_smooth_rows(24, 17), {}),
        (noisy, {}),
        (noisy, {"sub": "420"}),
        (noisy, {"qscale": 1.0}),     # sparse coefs → long EOB runs
        (noisy, {"qscale": 0.05}),    # dense coefs → ZRL/refine heavy
        (noisy, {"restart": 2}),
        ([[(57, 200, 33)] * 32 for _ in range(24)], {}),  # flat
    ]
    for rows, kw in cases:
        base = MM._jpeg_pixels(MM.encode_jpeg_baseline(
            rows, **{k: v for k, v in kw.items() if k != "restart"}))
        prog = MM._jpeg_pixels(MM.encode_jpeg_progressive(rows, **kw))
        assert np.array_equal(base, prog), kw
    gray = [[(7 * x * y + 13 * x) % 256 for x in range(24)]
            for y in range(17)]
    gb = MM._jpeg_pixels(MM.encode_jpeg_baseline(gray, sub="gray"))
    gp = MM._jpeg_pixels(MM.encode_jpeg_progressive(gray, sub="gray"))
    assert np.array_equal(gb, gp)


def test_jpeg_progressive_corruption_never_escapes_valueerror():
    """Single-byte corruption of a progressive stream's Huffman
    tables or entropy data must stay inside the ValueError-only
    fallback contract — a corrupt DHT once built an arbitrarily wide
    DC category that overflowed the int64 coefficient store as
    OverflowError, crashing the whole Arrow task instead of marking
    one asset decode_ok=false (review r11 fuzz finding)."""
    from metacat_spark.llm import multimodal as MM
    data = bytearray(MM.encode_jpeg_progressive(_smooth_rows(16, 16)))
    # locate the DHT segment and the first scan's entropy region
    dht = data.find(b"\xff\xc4")
    dht_len = (data[dht + 2] << 8) | data[dht + 3]
    sos = data.find(b"\xff\xda")
    targets = list(range(dht + 4, dht + 2 + dht_len)) \
        + list(range(sos + 14, min(sos + 74, len(data) - 2)))
    for off in targets:
        for mask in (0xFF, 0x81, 0x10):
            mutated = bytearray(data)
            mutated[off] ^= mask
            feats, ok = MM._decode_any(bytes(mutated))
            assert len(feats) == 8  # decoded or fell back — no raise


def test_jpeg_progressive_custom_script_and_features():
    """A deeper successive-approximation script (Al down from 3,
    chroma bands split differently) still reconstructs exactly, and
    the feature/dispatch surfaces treat progressive as a real decode
    (decode_ok=True, identical features to the baseline encode of
    the same pixels)."""
    import numpy as np
    from metacat_spark.llm import multimodal as MM
    rows = _noisy_rows(32, 18, seed=7)
    script = [((0, 1, 2), 0, 0, 0, 2), ((0, 1, 2), 0, 0, 1, 1),
              ((0, 1, 2), 0, 0, 1, 0),
              ((0,), 1, 2, 0, 3), ((0,), 3, 63, 0, 3),
              ((0,), 1, 63, 2, 2), ((0,), 1, 63, 1, 1),
              ((0,), 1, 63, 1, 0),
              ((1,), 1, 63, 0, 0),
              ((2,), 1, 63, 0, 2), ((2,), 1, 63, 1, 1),
              ((2,), 1, 63, 1, 0)]
    base = MM._jpeg_pixels(MM.encode_jpeg_baseline(rows))
    prog_bytes = MM.encode_jpeg_progressive(rows, script=script)
    assert b"\xff\xc2" in prog_bytes           # really SOF2
    assert np.array_equal(base, MM._jpeg_pixels(prog_bytes))
    feats, ok = MM._decode_any(prog_bytes)
    assert ok and feats == MM.decode_jpeg(
        MM.encode_jpeg_baseline(rows))
    # truncating mid-scan is still a clean miss, not a crash
    feats3, ok3 = MM._decode_any(prog_bytes[:len(prog_bytes) // 2])
    assert not ok3 and len(feats3) == 8


def test_jpeg_dhash_cross_container(spark):
    """A JPEG re-encode of a BMP's pixels must land within the
    near-dup Hamming threshold — the cross-container dedup the
    perceptual hash exists for (quantization loss absorbed)."""
    from metacat_spark.llm import multimodal as MM
    w, h = 16, 12
    rows = _gradient_rows(w, h)
    bmp = _bmp_bytes(w, h, rows)
    jpg = _jpeg_bytes(rows)
    df = spark.createDataFrame(
        [(1, "image", bytearray(bmp)), (2, "image", bytearray(jpg))],
        "asset_id long, modality string, content binary")
    sig = {r["asset_id"]: r for r in MM.image_dhash(df).collect()}
    assert sig[1]["decode_ok"] and sig[2]["decode_ok"]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in MM.image_near_dup_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3


def test_jpeg_truncated_payload_is_decode_miss(spark):
    """A truncated JPEG must surface as decode_ok=false in BOTH
    mapInPandas paths (features and dHash), never as a task-killing
    IndexError — the kernel converts its internal IndexErrors to
    ValueError (review r9)."""
    from metacat_spark.llm import multimodal as MM
    data = _jpeg_bytes(_smooth_rows(16, 16))
    df = spark.createDataFrame(
        [(1, "image", bytearray(data[:len(data) // 2])),
         (2, "image", bytearray(data))],
        "asset_id long, modality string, content binary")
    sig = {r["asset_id"]: r["decode_ok"]
           for r in MM.image_dhash(df).collect()}
    assert sig == {1: False, 2: True}
    feats = {r["asset_id"]: r["decode_ok"]
             for r in MM.extract_features(df).collect()}
    assert feats == {1: False, 2: True}


def test_jpeg_zero_sampling_factor_rejected():
    """A crafted SOF with a zero sampling factor must be a clean
    ValueError (histogram fallback), not a ZeroDivisionError in the
    upsample (review r9)."""
    import pytest as _pytest
    from metacat_spark.llm import multimodal as MM
    data = bytearray(_jpeg_bytes(_smooth_rows(16, 16)))
    i = bytes(data).index(b"\xff\xc0")
    data[i + 11] = 0x01                       # comp 1: h=0, v=1
    with _pytest.raises(ValueError, match="sampling"):
        MM._jpeg_pixels(bytes(data))
    feats, ok = MM._decode_any(bytes(data))
    assert not ok and len(feats) == 8


def test_perplexity_buckets_ccnet_partition(spark):
    """CCNet head/middle/tail: reference-like docs land in head,
    alien-vocabulary docs in tail; every doc is bucketed exactly
    once; a numpy replay of the add-one model + 1/3-2/3 quantile
    thresholds reproduces the assignment exactly."""
    import math

    from metacat_spark.llm.text import perplexity_buckets
    ref = spark.createDataFrame(
        [(100 + i, "quark lepton boson detector calorimeter")
         for i in range(5)], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "quark boson detector"),
         (2, "quark lepton calorimeter boson"),
         (3, "cheap shoes sale discount"),
         (4, "boson detector shoes"),
         (5, "zzz yyy xxx www"),
         (6, "lepton lepton quark")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           perplexity_buckets(docs, ref).collect()}
    assert len(got) == 6
    assert set(r["bucket"] for r in got.values()) == {
        "head", "middle", "tail"}
    # replay: model = add-one over ref counts (each term 5x, 5 terms)
    cnt = {t: 5 for t in ("quark", "lepton", "boson", "detector",
                          "calorimeter")}
    n_total, n_vocab = 25, 5

    def score(text):
        ws = text.split()
        return round(sum(math.log((cnt.get(w, 0) + 1)
                                  / (n_total + n_vocab))
                         for w in ws) / len(ws), 6)

    scores = {i: score(t) for i, t in
              [(1, "quark boson detector"),
               (2, "quark lepton calorimeter boson"),
               (3, "cheap shoes sale discount"),
               (4, "boson detector shoes"),
               (5, "zzz yyy xxx www"),
               (6, "lepton lepton quark")]}
    xs = sorted(scores.values())

    def q(p):
        h = (len(xs) - 1) * p
        lo = math.floor(h)
        return xs[lo] + (h - lo) * (xs[min(lo + 1, len(xs) - 1)]
                                    - xs[lo])

    t1, t2 = q(1.0 / 3.0), q(2.0 / 3.0)
    for i, s in scores.items():
        want = ("head" if s >= t2
                else "middle" if s >= t1 else "tail")
        assert got[i]["bucket"] == want, (i, s, t1, t2)
        assert got[i]["score"] == pytest.approx(s, abs=1e-9)
    # pure-reference vocab docs beat the all-alien doc
    assert got[2]["bucket"] == "head"
    assert got[5]["bucket"] == "tail"


def test_perplexity_stream_equals_batch(docs, spark):
    """Streaming CCNet bucketing: with the model from src0 and
    thresholds calibrated on the full corpus (the same quantiles the
    batch op computes), streaming that corpus must reproduce the
    batch (score, bucket) row-for-row — the scoring plan is shared,
    so scores are bit-identical, and fixed thresholds equal the
    batch's moving ones exactly when the threshold corpus IS the
    scored corpus. Empty threshold corpus is a clean error."""
    from conftest import SF_DIR

    from metacat_spark.llm.text import (perplexity_buckets,
                                        perplexity_stream)
    ref = docs.where(F.col("source") == "src0")
    batch = {r["doc_id"]: (r["score"], r["bucket"])
             for r in perplexity_buckets(docs, ref).collect()}
    streamed = {r["doc_id"]: (r["score"], r["bucket"])
                for r in perplexity_stream(
                    spark, f"{SF_DIR}/documents.parquet", ref,
                    threshold_corpus=docs).collect()}
    assert streamed == batch and batch
    with pytest.raises(ValueError, match="no scores"):
        perplexity_stream(spark, f"{SF_DIR}/documents.parquet", ref,
                          threshold_corpus=docs.where("doc_id < 0"))


def test_strip_markup_planted_html(spark):
    """Markup stripping on planted HTML: script/style payload
    vanishes, block tags become line breaks, inline tags become
    spaces, entities unescape, plain text passes through unchanged;
    DuckDB replaying the generated chain agrees on the planted rows
    too (the entry pins it on the fixture corpus)."""
    import duckdb

    from metacat_spark.llm.text import strip_markup
    rows = [
        (1, "<html><head><script>var x = 1;</script>"
            "<style>p{color:red}</style></head><body>"
            "<h1>Title</h1><p>Hello &amp; welcome</p>"
            "<!-- hidden --><div>A &lt;tag&gt; &quot;q&quot; "
            "&#39;a&#39;</div><br>end</body></html>"),
        (2, "plain text stays"),
        (3, "spaced   out\ttext"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in strip_markup(docs).collect()}
    assert got[1]["text_clean"] == (
        "Title\nHello & welcome\nA <tag> \"q\" 'a'\nend")
    assert "var x" not in got[1]["text_clean"]
    assert "color" not in got[1]["text_clean"]
    assert got[1]["changed"] and got[1]["n_chars_removed"] > 0
    assert got[2]["text_clean"] == "plain text stays"
    assert not got[2]["changed"] and got[2]["n_chars_removed"] == 0
    assert got[3]["text_clean"] == "spaced out text"
    # double-escaped entities unescape exactly ONE level: the
    # literal text "&lt;" stays "&lt;", it does not become "<"
    esc = spark.createDataFrame(
        [(9, "a &amp;lt; b &amp;amp; c")],
        "doc_id long, text string")
    assert strip_markup(esc).collect()[0]["text_clean"] == \
        "a &lt; b &amp; c"
    # DuckDB replay of the generated chain on the same rows
    import __spark_entry__ as entrymod
    sql = entrymod.oracle_sql()["doc_strip_markup"]
    con = duckdb.connect()
    con.execute("create table documents(doc_id bigint, text text)")
    con.executemany("insert into documents values (?, ?)", rows)
    want = {r[0]: r for r in con.execute(sql).fetchall()}
    for i in (1, 2, 3):
        assert want[i][1] == got[i]["text_clean"]
        assert want[i][2] == got[i]["n_chars_removed"]
        assert want[i][3] == got[i]["changed"]


def test_dedup_pair_metrics_gauge(docs):
    """Pair precision/recall gauge: exact-vs-itself is perfect;
    verified MinHash-LSH has precision exactly 1.0 (candidates are
    exactly verified) and recall in (0, 1]; counts replayed by hand
    on a crippled approximate set."""
    from metacat_spark.llm.dedup import (dedup_pair_metrics,
                                         minhash_lsh_pairs,
                                         ngram_jaccard_pairs)
    exact = ngram_jaccard_pairs(docs, threshold=0.5)
    row = dedup_pair_metrics(exact, exact).collect()[0]
    n = exact.count()
    assert (row["n_exact"], row["n_approx"], row["n_hits"]) \
        == (n, n, n) and n > 0
    assert row["recall"] == 1.0 and row["precision"] == 1.0
    lsh = minhash_lsh_pairs(docs, threshold=0.5)
    lrow = dedup_pair_metrics(lsh, exact).collect()[0]
    assert lrow["precision"] == 1.0          # exact-verified
    assert 0.0 < lrow["recall"] <= 1.0
    # cripple: drop one exact pair from the approximate side
    one = exact.limit(1)
    crow = dedup_pair_metrics(exact.subtract(one), exact) \
        .collect()[0]
    assert crow["n_hits"] == n - 1
    assert crow["recall"] == round((n - 1) / n, 6)


def _gif_bytes(rows, interlace=False):
    """Minimal GIF89a encoder for fixtures: global color table from
    the unique colors, literal-code LZW whose code-size growth
    mirrors the decoder's dictionary growth exactly (the encoder
    never emits dictionary codes — simplest valid stream), optional
    4-pass interlace row order."""
    import struct
    h, w = len(rows), len(rows[0])
    colors = sorted({c for row in rows for c in row})
    cmap = {c: i for i, c in enumerate(colors)}
    bits = max(1, (len(colors) - 1).bit_length())
    n_field = max(0, bits - 1)              # 2^(n+1) table entries
    entries = 2 << n_field
    min_code = max(2, bits)
    if interlace:
        order = [y for step, start in ((8, 0), (8, 4), (4, 2), (2, 1))
                 for y in range(start, h, step)]
    else:
        order = range(h)
    flat = [cmap[c] for y in order for c in rows[y]]
    clear, end_code = 1 << min_code, (1 << min_code) + 1
    cs, nxt, first = min_code + 1, end_code + 1, True
    codes = [(clear, min_code + 1)]
    for idx in flat:
        codes.append((idx, cs))
        if first:
            first = False
        else:
            nxt += 1
            if nxt == (1 << cs) and cs < 12:
                cs += 1
            if nxt >= 3500:
                codes.append((clear, cs))
                cs, nxt, first = min_code + 1, end_code + 1, True
    codes.append((end_code, cs))
    acc = nacc = 0
    data = bytearray()
    for code, size in codes:
        acc |= code << nacc
        nacc += size
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    gct = b"".join(bytes(c) for c in colors)
    gct += b"\x00" * (entries * 3 - len(gct))
    out = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | n_field,
                                   0, 0) + gct
           + b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
           + bytes([0x40 if interlace else 0, min_code]))
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    return out + b"\x00\x3B"


def test_multimodal_real_gif_decode(spark):
    """The GIF kernel (r12) decodes REAL LZW-compressed containers —
    plain and interlaced — through the Arrow stage with exact pixel
    recovery; the KwKwK LZW corner case and truncation are covered
    at the kernel level; GIFs join the dHash family so a GIF
    re-encode dedups against its BMP twin."""
    import numpy as np

    from metacat_spark.llm import multimodal as MM
    rows = [[((x * 37) % 256 // 64 * 64, (y * 53) % 256 // 64 * 64,
              ((x + y) * 11) % 256 // 64 * 64)
             for x in range(7)] for y in range(9)]
    gif = _gif_bytes(rows)
    px = MM._gif_pixels(gif)
    assert px.shape == (9, 7, 3)
    assert [tuple(p) for r in px for p in r] \
        == [c for r in rows for c in r]
    # interlaced variant stores rows in pass order; decode restores
    lac = _gif_bytes(rows, interlace=True)
    assert np.array_equal(MM._gif_pixels(lac), px)
    # feature vector through the Arrow stage, means hand-checked
    feats = {r["asset_id"]: r for r in MM.extract_features(
        spark.createDataFrame(
            [(1, "image", bytearray(gif)),
             (2, "image", bytearray(gif[:40]))],
            "asset_id long, modality string, content binary"))
        .collect()}
    assert feats[1]["decode_ok"]
    f = feats[1]["feature"]
    arr = np.array([c for r in rows for c in r], dtype=float) / 255.0
    assert (f[0], f[1], f[2]) == (7.0, 9.0, 3.0)
    assert abs(f[3] - arr[:, 0].mean()) < 1e-5
    assert abs(f[4] - arr[:, 1].mean()) < 1e-5
    assert abs(f[5] - arr[:, 2].mean()) < 1e-5
    assert not feats[2]["decode_ok"]       # truncated → fallback
    # KwKwK: code == next_code must emit prev + prev[0]
    # stream: CLEAR(4), 1, 6 at 3 bits LSB-first = 0x8C 0x01
    assert MM._gif_lzw(bytes([0x8C, 0x01]), 2, 3) == [1, 1, 1]
    with pytest.raises(ValueError, match="truncated"):
        MM._gif_lzw(bytes([0x8C]), 2, 30)
    # dHash parity: identical pixels through BMP and GIF containers
    bgr_rows = [[c for c in r] for r in rows]
    bmp = _bmp_bytes(7, 9, bgr_rows)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(bmp)), (2, "image", bytearray(gif))],
        "asset_id long, modality string, content binary")
    hashes = {r["asset_id"]: r["dhash"]
              for r in MM.image_dhash(assets).collect()}
    assert hashes[1] == hashes[2]


def _gif_lzw_encode(flat, min_code):
    """Literal-code LZW byte stream (same scheme as _gif_bytes)."""
    clear, end_code = 1 << min_code, (1 << min_code) + 1
    cs, nxt, first = min_code + 1, end_code + 1, True
    codes = [(clear, min_code + 1)]
    for idx in flat:
        codes.append((idx, cs))
        if first:
            first = False
        else:
            nxt += 1
            if nxt == (1 << cs) and cs < 12:
                cs += 1
            if nxt >= 3500:
                codes.append((clear, cs))
                cs, nxt, first = min_code + 1, end_code + 1, True
    codes.append((end_code, cs))
    acc = nacc = 0
    data = bytearray()
    for code, size in codes:
        acc |= code << nacc
        nacc += size
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    return bytes(data)


def _gif_anim_bytes(sw, sh, pal, frames, bg_idx=0):
    """Animated GIF89a fixture encoder: one shared global color
    table (``pal`` = list of RGB tuples), one image per entry of
    ``frames`` = (left, top, idx_rows, transp_idx_or_None,
    disposal). Each frame gets its own GCE when transparency or a
    disposal method applies."""
    import struct
    bits = max(1, (len(pal) - 1).bit_length())
    n_field = max(0, bits - 1)
    entries = 2 << n_field
    min_code = max(2, bits)
    gct = b"".join(bytes(c) for c in pal)
    gct += b"\x00" * (entries * 3 - len(gct))
    out = (b"GIF89a"
           + struct.pack("<HHBBB", sw, sh, 0x80 | n_field, bg_idx, 0)
           + gct)
    for left, top, rows, transp, disposal in frames:
        h, w = len(rows), len(rows[0])
        if transp is not None or disposal:
            packed = (disposal & 7) << 2 | (1 if transp is not None
                                            else 0)
            out += (b"\x21\xf9\x04"
                    + bytes([packed, 0, 0, transp or 0]) + b"\x00")
        out += (b"\x2C" + struct.pack("<HHHH", left, top, w, h)
                + bytes([0, min_code]))
        data = _gif_lzw_encode([i for r in rows for i in r],
                               min_code)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + bytes(chunk)
        out += b"\x00"
    return out + b"\x3B"


def test_multimodal_animated_gif_compositing(spark):
    """Animated-GIF frame sampling (r13 — VERDICT r12 #7): frame N
    is the COMPOSITED viewer state (offsets, GCE transparency,
    disposal 2/3), gif_n_frames counts without decoding, and
    sample_gif_frames fans each payload out to bounded per-frame
    feature rows through one Arrow stage, degrading (never
    crashing) on junk."""
    import numpy as np

    from metacat_spark.llm import multimodal as MM
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # frame 0: full 4x4 red field; frame 1: 2x2 green patch at
    # (1,1) with transparent holes; frame 2: blue row at top,
    # after frame 1 disposed to background
    f0 = [[1] * 4 for _ in range(4)]
    f1 = [[2, 0], [0, 2]]                 # 0 = transparent index
    f2 = [[3, 3, 3, 3]]
    gif = _gif_anim_bytes(4, 4, pal, [
        (0, 0, f0, None, 0),
        (1, 1, f1, 0, 2),                 # transp idx 0, disposal 2
        (0, 0, f2, None, 0)])
    assert MM.gif_n_frames(gif) == 3
    # frame 0: all red
    p0 = MM._gif_pixels(gif, 0)
    assert p0.shape == (4, 4, 3)
    assert (p0 == np.array([255, 0, 0])).all()
    # frame 1: red canvas, green at (1,1) and (2,2); transparent
    # holes show the red underneath
    p1 = MM._gif_pixels(gif, 1)
    want = np.tile(np.array([255, 0, 0], np.uint8), (4, 4, 1))
    want[1, 1] = want[2, 2] = (0, 255, 0)
    assert (p1 == want).all()
    # frame 2: frame 1's rect restored to BACKGROUND (pal[0] =
    # black), then a blue top row
    p2 = MM._gif_pixels(gif, 2)
    want2 = np.tile(np.array([255, 0, 0], np.uint8), (4, 4, 1))
    want2[1:3, 1:3] = (0, 0, 0)
    want2[0] = (0, 0, 255)
    assert (p2 == want2).all()
    with pytest.raises(ValueError, match="only 3 frame"):
        MM._gif_pixels(gif, 3)
    # disposal 3 (restore previous): the patch vanishes entirely
    gif3 = _gif_anim_bytes(4, 4, pal, [
        (0, 0, f0, None, 0),
        (1, 1, f1, 0, 3),
        (0, 0, f2, None, 0)])
    p2b = MM._gif_pixels(gif3, 2)
    want3 = np.tile(np.array([255, 0, 0], np.uint8), (4, 4, 1))
    want3[0] = (0, 0, 255)
    assert (p2b == want3).all()
    # the Arrow stage: per-frame rows, junk degrades to one fallback
    assets = spark.createDataFrame(
        [(1, "image", bytearray(gif)),
         (2, "image", bytearray(b"GIF89a" + b"\x00" * 10)),
         (3, "image", bytearray(b"not a gif at all"))],
        "asset_id long, modality string, content binary")
    rows = {(r["asset_id"], r["frame_idx"]): r
            for r in MM.sample_gif_frames(assets).collect()}
    assert {(1, 0), (1, 1), (1, 2), (2, 0), (3, 0)} == set(rows)
    assert all(rows[(1, i)]["decode_ok"]
               and rows[(1, i)]["n_frames"] == 3 for i in range(3))
    # frame-1 feature: mean_G = 2 green px / 16
    assert abs(rows[(1, 1)]["feature"][4] - 2 / 16) < 1e-6
    assert rows[(1, 1)]["feature"][0] == 4.0    # canvas-sized
    assert not rows[(2, 0)]["decode_ok"]
    assert not rows[(3, 0)]["decode_ok"]
    # every_n sampling + the fan-out bound
    half = {r["frame_idx"] for r in
            MM.sample_gif_frames(assets, every_n=2).collect()
            if r["asset_id"] == 1}
    assert half == {0, 2}
    one = [r for r in
           MM.sample_gif_frames(assets, max_frames=1).collect()
           if r["asset_id"] == 1]
    assert len(one) == 1 and one[0]["frame_idx"] == 0
    with pytest.raises(ValueError, match="every_n"):
        MM.sample_gif_frames(assets, every_n=0)
    # single-frame decode path unchanged: decode_gif == frame 0
    single = _gif_bytes([[(0, 0, 0), (255, 255, 255)],
                         [(255, 255, 255), (0, 0, 0)]])
    assert MM.decode_gif(single)[:3] == [2.0, 2.0, 3.0]


def test_animation_near_dup_pairs(spark):
    """Video-level perceptual dedup (r13): a re-encode of the same
    animation (different palette ORDER, identical pixels) matches
    frame-for-frame through the shared dHash kernel; different
    content does not pair; corpus-wide stop-frames are pruned by the
    max-df cap before the join."""
    from metacat_spark.llm import multimodal as MM
    grays = [(v, v, v) for v in (0, 64, 128, 255)]

    def anim(patterns, pal):
        frames = [(0, 0, [[p(x, y) for x in range(16)]
                          for y in range(16)], None, 0)
                  for p in patterns]
        return _gif_anim_bytes(16, 16, pal, frames)

    pats_a = [lambda x, y, k=k: (x * (k + 1) + y) % 4
              for k in range(3)]
    pats_c = [lambda x, y, k=k: (x * 7 + y * (k + 2) + 5) % 4
              for k in range(3)]
    gif_a = anim(pats_a, grays)
    # same pixels, palette stored in reverse order -> different
    # payload bytes, identical decoded frames
    rev = list(reversed(grays))
    frames_b = [(0, 0, [[3 - p(x, y) for x in range(16)]
                        for y in range(16)], None, 0)
                for p in pats_a]
    gif_b = _gif_anim_bytes(16, 16, rev, frames_b)
    gif_c = anim(pats_c, grays)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(gif_a)),
         (2, "image", bytearray(gif_b)),
         (3, "image", bytearray(gif_c)),
         (4, "image", bytearray(b"junk not a gif"))],
        "asset_id long, modality string, content binary")
    sig = MM.gif_frame_dhash(assets)
    rows = sig.collect()
    assert {r["asset_id"] for r in rows} == {1, 2, 3}
    h1 = {r["frame_idx"]: r["dhash"] for r in rows
          if r["asset_id"] == 1}
    h2 = {r["frame_idx"]: r["dhash"] for r in rows
          if r["asset_id"] == 2}
    assert h1 == h2 and len(h1) == 3       # re-encode == original
    pairs = {(r["asset_a"], r["asset_b"]): r["match_frac"]
             for r in MM.animation_near_dup_pairs(assets).collect()}
    assert pairs == {(1, 2): 1.0}
    # stop-frame cap: with max_hash_df=1 every shared hash is
    # pruned, so nothing can pair
    assert not MM.animation_near_dup_pairs(
        assets, max_hash_df=1).collect()
    with pytest.raises(ValueError, match="min_match_frac"):
        MM.animation_near_dup_pairs(assets, min_match_frac=0.0)


from hypothesis import given as _hyp_given, settings as _hyp_settings
from hypothesis import strategies as _hyp_st


def _anim_strategy():
    def build(draw):
        sw = draw(_hyp_st.integers(1, 9))
        sh = draw(_hyp_st.integers(1, 9))
        npal = draw(_hyp_st.integers(2, 8))
        pal = [tuple(draw(_hyp_st.integers(0, 255))
                     for _ in range(3)) for _ in range(npal)]
        frames = []
        for _ in range(draw(_hyp_st.integers(1, 4))):
            w = draw(_hyp_st.integers(1, sw))
            h = draw(_hyp_st.integers(1, sh))
            left = draw(_hyp_st.integers(0, sw - w))
            top = draw(_hyp_st.integers(0, sh - h))
            rows = [[draw(_hyp_st.integers(0, npal - 1))
                     for _ in range(w)] for _ in range(h)]
            transp = draw(_hyp_st.none()
                          | _hyp_st.integers(0, npal - 1))
            disposal = draw(_hyp_st.integers(0, 3))
            frames.append((left, top, rows, transp, disposal))
        return sw, sh, pal, frames
    return _hyp_st.composite(build)()


@_hyp_settings(max_examples=40, deadline=None)
@_hyp_given(anim=_anim_strategy())
def test_gif_codec_roundtrip_property(anim):
    """encode_gif → _gif_pixels(frame=k) equals an INDEPENDENT numpy
    compositor for every frame of a random animation (random canvas,
    palette, offsets, transparency, disposal) — the codec pair's
    differential oracle, same posture as the predicate-compiler
    hypothesis suite."""
    import numpy as np

    from metacat_spark.llm import multimodal as MM
    sw, sh, pal, frames = anim
    payload = MM.encode_gif(sw, sh, pal, frames)
    assert MM.gif_n_frames(payload) == len(frames)
    pal_arr = np.array(pal, dtype=np.uint8)
    canvas = np.tile(pal_arr[0], (sh, sw, 1))
    for k, (left, top, rows, transp, disposal) in enumerate(frames):
        h, w = len(rows), len(rows[0])
        prev = canvas[top:top + h, left:left + w].copy()
        for y in range(h):
            for x in range(w):
                if transp is None or rows[y][x] != transp:
                    canvas[top + y, left + x] = pal_arr[rows[y][x]]
        got = MM._gif_pixels(payload, frame=k)
        assert got.shape == (sh, sw, 3)
        assert (got == canvas).all(), k
        if disposal == 2:
            canvas[top:top + h, left:left + w] = pal_arr[0]
        elif disposal == 3:
            canvas[top:top + h, left:left + w] = prev


def test_asset_dedup_video_collapses_reencodes(spark):
    """asset_dedup('video', r13): an animation and its re-encode
    collapse to one survivor (min asset_id) through the frame-hash
    pair path; distinct animations survive."""
    from metacat_spark.llm import multimodal as MM
    grays = [(v, v, v) for v in (0, 64, 128, 255)]
    pats = [lambda x, y, k=k: (x * (k + 1) + y) % 4 for k in range(3)]
    frames = [(0, 0, [[p(x, y) for x in range(16)]
                      for y in range(16)], None, 0) for p in pats]
    gif_a = _gif_anim_bytes(16, 16, grays, frames)
    rev = list(reversed(grays))
    frames_b = [(0, 0, [[3 - p(x, y) for x in range(16)]
                        for y in range(16)], None, 0) for p in pats]
    gif_b = _gif_anim_bytes(16, 16, rev, frames_b)
    pats_c = [lambda x, y, k=k: (x * 7 + y * (k + 2) + 5) % 4
              for k in range(3)]
    frames_c = [(0, 0, [[p(x, y) for x in range(16)]
                        for y in range(16)], None, 0) for p in pats_c]
    gif_c = _gif_anim_bytes(16, 16, grays, frames_c)
    assets = spark.createDataFrame(
        [(1, "video", bytearray(gif_a)),
         (2, "video", bytearray(gif_b)),
         (3, "video", bytearray(gif_c))],
        "asset_id long, modality string, content binary")
    kept = {r["asset_id"] for r in
            MM.asset_dedup(assets, modality="video").collect()}
    assert kept == {1, 3}


def test_multimodal_real_tiff_decode(spark):
    """Baseline-TIFF kernel (r13): both byte orders, RGB + grayscale
    (WhiteIsZero inverted), multi-strip, PackBits — exact pixel
    recovery through the Arrow stage; beyond-baseline variants (LZW)
    and truncation degrade to the histogram fallback; a TIFF
    re-encode dedups against its BMP twin through the shared dHash
    kernel."""
    import numpy as np

    from metacat_spark.llm import multimodal as MM
    rows = [[((x * 37) % 256, (y * 53) % 256, ((x + y) * 11) % 256)
             for x in range(7)] for y in range(9)]
    tif = MM.encode_tiff(rows, endian=">", packbits=True,
                         rows_per_strip=4)
    px = MM._tiff_pixels(tif)
    assert px.shape == (9, 7, 3)
    assert [tuple(p) for r in px for p in r] \
        == [c for r in rows for c in r]
    # real LZW (+ predictor) round-trips exactly; JPEG-in-TIFF
    # (compression 7) is beyond the baseline kernel -> loud at the
    # kernel, fallback at the feature stage
    import numpy as np
    tl = MM.encode_tiff(rows, lzw=True, predictor=True,
                        rows_per_strip=4)
    assert (MM._tiff_pixels(tl) == np.array(rows, np.uint8)).all()
    lzw = bytearray(MM.encode_tiff(rows))
    n = int.from_bytes(lzw[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        if int.from_bytes(lzw[off:off + 2], "little") == 259:
            lzw[off + 8] = 7
    with pytest.raises(ValueError, match="compressed TIFF"):
        MM._tiff_pixels(bytes(lzw))
    with pytest.raises(ValueError, match="pick one"):
        MM.encode_tiff(rows, packbits=True, lzw=True)
    feats = {r["asset_id"]: r for r in MM.extract_features(
        spark.createDataFrame(
            [(1, "image", bytearray(tif)),
             (2, "image", bytearray(tif[:30])),
             (3, "image", bytearray(bytes(lzw)))],
            "asset_id long, modality string, content binary"))
        .collect()}
    assert feats[1]["decode_ok"]
    f = feats[1]["feature"]
    arr = np.array([c for r in rows for c in r], dtype=float) / 255.0
    assert (f[0], f[1], f[2]) == (7.0, 9.0, 3.0)
    assert abs(f[3] - arr[:, 0].mean()) < 1e-5
    assert not feats[2]["decode_ok"]       # truncated -> fallback
    assert not feats[3]["decode_ok"]       # LZW -> fallback
    # dHash parity: identical pixels through BMP and TIFF containers
    bmp = _bmp_bytes(7, 9, [[c for c in r] for r in rows])
    assets = spark.createDataFrame(
        [(1, "image", bytearray(bmp)), (2, "image", bytearray(tif))],
        "asset_id long, modality string, content binary")
    hashes = {r["asset_id"]: r["dhash"]
              for r in MM.image_dhash(assets).collect()}
    assert hashes[1] == hashes[2]


@_hyp_settings(max_examples=40, deadline=None)
@_hyp_given(
    w=_hyp_st.integers(1, 12), h=_hyp_st.integers(1, 12),
    endian=_hyp_st.sampled_from(["<", ">"]),
    comp=_hyp_st.sampled_from(["none", "packbits", "lzw"]),
    predictor=_hyp_st.booleans(),
    rps=_hyp_st.one_of(_hyp_st.none(), _hyp_st.integers(1, 13)),
    gray=_hyp_st.booleans(),
    depth=_hyp_st.sampled_from([8, 16]),
    tiles=_hyp_st.one_of(
        _hyp_st.none(),
        _hyp_st.tuples(_hyp_st.integers(1, 8),
                       _hyp_st.integers(1, 8))),
    seed=_hyp_st.integers(0, 2**31 - 1))
def test_tiff_codec_roundtrip_property(w, h, endian, comp,
                                       predictor, rps, gray, depth,
                                       tiles, seed):
    """encode_tiff -> _tiff_pixels is pixel-exact over random sizes,
    content, byte order, strip layout, PackBits/LZW, the
    differencing predictor, grayscale, (r14) 16-bit depth (the
    v*257 upconvert / high-byte downconvert pair), and (r14) the
    tiled layout (padded edge tiles, per-tile compression and
    differencing) — the TIFF pair's differential oracle."""
    import numpy as np

    from metacat_spark.llm import multimodal as MM
    rng = np.random.RandomState(seed)
    if gray:
        rows = [[int(v) for v in rng.randint(0, 256, w)]
                for _ in range(h)]
        want = np.repeat(np.array(rows, np.uint8)[:, :, None], 3,
                         axis=2)
    else:
        rows = [[tuple(int(v) for v in rng.randint(0, 256, 3))
                 for _ in range(w)] for _ in range(h)]
        want = np.array(rows, np.uint8)
    t = MM.encode_tiff(rows, endian=endian, gray=gray,
                       packbits=comp == "packbits",
                       lzw=comp == "lzw", predictor=predictor,
                       rows_per_strip=None if tiles else rps,
                       depth=depth, tiles=tiles)
    assert (MM._tiff_pixels(t) == want).all()


def test_codec_hostile_payloads_degrade(spark):
    """Review-r13 regressions: payload-controlled geometry must be a
    ValueError (histogram fallback), never an IndexError/MemoryError
    escaping the Arrow task — a 14-byte GIF declaring a 65535x65535
    screen, a TIFF with a zero-count IFD tag; broken-encoder GIF
    geometry (zero screen, overhanging rect) decodes like viewers
    do: first-frame extent, clipped rects."""
    import struct as _st

    import numpy as np

    from metacat_spark.llm import multimodal as MM
    # canvas bomb: tiny payload, huge declared screen (global color
    # table present so the size bound is what fires)
    bomb = (b"GIF89a" + _st.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)
            + b"\x00" * 6
            + b"\x2C" + _st.pack("<HHHH", 0, 0, 65535, 65535)
            + bytes([0, 2]) + b"\x00\x3B")
    with pytest.raises(ValueError, match="16M-pixel"):
        MM._gif_pixels(bomb)
    # zero-count IFD tag: treated as absent -> missing-tag ValueError
    t = bytearray(MM.encode_tiff([[(1, 2, 3)]]))
    n = int.from_bytes(t[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        if int.from_bytes(t[off:off + 2], "little") == 256:
            t[off + 4:off + 8] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="missing required tag"):
        MM._tiff_pixels(bytes(t))
    # both degrade (not crash) through the Arrow stage
    feats = {r["asset_id"]: r["decode_ok"] for r in
             MM.extract_features(spark.createDataFrame(
                 [(1, "image", bytearray(bomb)),
                  (2, "image", bytearray(bytes(t)))],
                 "asset_id long, modality string, content binary"))
             .collect()}
    assert feats == {1: False, 2: False}
    rows = MM.sample_gif_frames(spark.createDataFrame(
        [(1, "image", bytearray(bomb))],
        "asset_id long, modality string, content binary")).collect()
    assert len(rows) == 1 and not rows[0]["decode_ok"]
    # zero logical screen: first frame's extent wins (viewer rule)
    z = bytearray(_gif_bytes([[(10, 20, 30), (40, 50, 60)],
                              [(1, 2, 3), (4, 5, 6)]]))
    z[6:10] = _st.pack("<HH", 0, 0)
    px = MM._gif_pixels(bytes(z))
    assert px.shape == (2, 2, 3) and tuple(px[0, 0]) == (10, 20, 30)
    # overhanging rect: clipped, not rejected
    o = bytearray(_gif_bytes([[(10, 20, 30), (40, 50, 60)],
                              [(1, 2, 3), (4, 5, 6)]]))
    o[6:10] = _st.pack("<HH", 1, 1)        # screen 1x1, image 2x2
    px = MM._gif_pixels(bytes(o))
    assert px.shape == (1, 1, 3) and tuple(px[0, 0]) == (10, 20, 30)
    # single-pass samplers still agree with per-frame decodes
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0)]
    anim = _gif_anim_bytes(4, 4, pal, [
        (0, 0, [[1] * 4 for _ in range(4)], None, 0),
        (1, 1, [[2, 0], [0, 2]], 0, 2),
        (0, 0, [[2] * 4], None, 0)])
    per_frame = [MM._gif_pixels(anim, frame=k) for k in range(3)]
    for k, px in MM._gif_frame_iter(anim):
        assert (px == per_frame[k]).all(), k
    with pytest.raises(ValueError, match="max_frames"):
        MM.sample_gif_frames(spark.createDataFrame(
            [(1, "image", bytearray(anim))],
            "asset_id long, modality string, content binary"),
            max_frames=0)


def test_animation_near_dup_hot_frames_and_loud_flags(spark):
    """Review-r13 regressions: identical animations sharing
    corpus-hot stop-frames still pair at match_frac 1.0 (the
    denominators count PRUNED hashes), and asset_dedup('video')
    rejects max_hamming loudly instead of dropping it."""
    from metacat_spark.llm import multimodal as MM
    grays = [(v, v, v) for v in (0, 64, 128, 255)]

    def anim(patterns):
        frames = [(0, 0, [[p(x, y) for x in range(16)]
                          for y in range(16)], None, 0)
                  for p in patterns]
        return _gif_anim_bytes(16, 16, grays, frames)

    stop = lambda x, y: (x + y) % 4           # the shared stop-frame
    pats = [lambda x, y, k=k: (x * (k + 1) + y * 3) % 4
            for k in range(3)]
    dup_a = anim([stop] + pats)
    dup_b = anim([stop] + pats)               # identical animation
    # 5 other assets carry the stop-frame too -> its hash df = 7
    others = [anim([stop, lambda x, y, j=j: (x * 5 + y * (j + 7)) % 4])
              for j in range(5)]
    assets = spark.createDataFrame(
        [(1, "video", bytearray(dup_a)),
         (2, "video", bytearray(dup_b))]
        + [(10 + j, "video", bytearray(g))
           for j, g in enumerate(others)],
        "asset_id long, modality string, content binary")
    pairs = {(r["asset_a"], r["asset_b"]): r["match_frac"]
             for r in MM.animation_near_dup_pairs(
                 assets, max_hash_df=3).collect()}
    # the stop-frame hash (df=7 > 3) is pruned; the two identical
    # animations still read 1.0 over their remaining frames
    assert pairs[(1, 2)] == 1.0
    with pytest.raises(ValueError, match="max_hamming"):
        MM.asset_dedup(assets, modality="video", max_hamming=3)


def test_decode_coverage_gauge(spark):
    """r14 decode-coverage operator: per-container real-vs-fallback
    rates over a mixed corpus — real BMP/WAV/GIF/TIFF decode, a
    corrupt BMP falls back under its own container, WebP and random
    bytes are fallbacks, and the sniff matches _decode_any's
    dispatch prefixes."""
    from metacat_spark.llm import multimodal as MM
    rows = [[(10 * r, 20 * c, 30) for c in range(4)]
            for r in range(4)]
    pal = sorted({(10 * r, 20 * c, 30) for c in range(4)
                  for r in range(4)})
    gif = MM.encode_gif(4, 4, pal,
                        [(0, 0, [[pal.index((10 * r, 20 * c, 30))
                                  for c in range(4)]
                                 for r in range(4)], None, 0)])
    payloads = [
        ("bmp_ok", _bmp_bytes(4, 4, rows)),
        ("bmp_ok2", _bmp_bytes(2, 2, [r[:2] for r in rows[:2]])),
        ("bmp_bad", _bmp_bytes(4, 4, rows)[:20]),   # truncated
        ("wav_ok", _wav_bytes(8000, [0, 100, -100, 50])),
        ("gif_ok", gif),
        ("tiff_ok", MM.encode_tiff(rows)),
        ("webp", b"RIFF" + b"\x10\x00\x00\x00" + b"WEBPVP8 "),
        ("riff_other", b"RIFF" + b"\x04\x00\x00\x00" + b"AVI "),
        ("rand", b"\x00\x01\x02 random junk"),
        ("empty", b""),
    ]
    assets = spark.createDataFrame(
        [(i, name, bytearray(b)) for i, (name, b)
         in enumerate(payloads)],
        "asset_id long, name string, content binary")
    got = {r["container"]: (r["n_assets"], r["n_real"],
                            r["n_fallback"], r["real_rate"])
           for r in MM.decode_coverage(assets).collect()}
    assert got["bmp"] == (3, 2, 1, round(2 / 3, 6))
    assert got["wav"] == (1, 1, 0, 1.0)
    assert got["gif"] == (1, 1, 0, 1.0)
    assert got["tiff"] == (1, 1, 0, 1.0)
    assert got["webp"] == (1, 0, 1, 0.0)
    assert got["riff"] == (1, 0, 1, 0.0)
    assert got["other"] == (1, 0, 1, 0.0)
    assert got["empty"] == (1, 0, 1, 0.0)
    assert sum(v[0] for v in got.values()) == len(payloads)


def test_tiff_16bit_edges():
    """r14 16-bit TIFF edges the property test can't reach: mixed
    per-channel depths refuse, a hand-built raw 16-bit payload that
    did NOT come from our encoder downconverts by the high byte,
    and WhiteIsZero inversion composes with the downconvert."""
    import struct as _st

    import numpy as np

    from metacat_spark.llm import multimodal as MM
    # mixed depths: rewrite the BitsPerSample values in the overflow
    t = bytearray(MM.encode_tiff([[(1, 2, 3)]], depth=16))
    n = int.from_bytes(t[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        if int.from_bytes(t[off:off + 2], "little") == 258:
            voff = int.from_bytes(t[off + 8:off + 12], "little")
            t[voff:voff + 2] = (8).to_bytes(2, "little")
    with pytest.raises(ValueError, match="uniform"):
        MM._tiff_pixels(bytes(t))
    # non-257-multiple samples: 0x1234 -> high byte 0x12
    good = bytearray(MM.encode_tiff([[5]], gray=True, depth=16))
    # pixel data is the last 2 bytes (single sample)
    good[-2:] = _st.pack("<H", 0x1234)
    px = MM._tiff_pixels(bytes(good))
    assert (px == 0x12).all()
    # WhiteIsZero on 16-bit: flip photometric 1 -> 0 in the IFD
    wz = bytearray(MM.encode_tiff([[5, 200]], gray=True, depth=16))
    n = int.from_bytes(wz[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        if int.from_bytes(wz[off:off + 2], "little") == 262:
            wz[off + 8:off + 10] = (0).to_bytes(2, "little")
    px = MM._tiff_pixels(bytes(wz))
    assert (px[0, 0] == 255 - 5).all() and (px[0, 1] == 255 - 200).all()
    # encoder refuses depths it cannot write
    with pytest.raises(ValueError, match="depth"):
        MM.encode_tiff([[1]], gray=True, depth=12)


def test_ngram_novelty(spark):
    """r14 memorization gauge: known overlap fractions on a
    hand-built corpus, short-doc singleton shingles, zero- and
    full-overlap extremes, self-reference reads 1.0 everywhere."""
    from metacat_spark.llm.dedup import ngram_novelty
    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),  # all
         (2, "a wholly novel sentence nothing shares at all"),  # none
         # 4 trigrams, 2 of them ("quick brown fox", "brown fox
         # jumps") in the reference
         (3, "quick brown fox jumps strangely"),
         (4, "tiny doc")],                       # < n: one shingle
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           ngram_novelty(docs, ref, n=3).collect()}
    assert got[1]["overlap_rate"] == 1.0
    assert got[1]["novelty_rate"] == 0.0
    assert got[1]["n_grams"] == 7 and got[1]["n_seen"] == 7
    assert got[2]["overlap_rate"] == 0.0
    assert got[2]["novelty_rate"] == 1.0
    assert got[3]["n_grams"] == 3 and got[3]["n_seen"] == 2
    assert got[3]["overlap_rate"] == round(2 / 3, 6)
    assert got[4]["n_grams"] == 1 and got[4]["n_seen"] == 0
    # one row per input doc, always
    assert set(got) == {1, 2, 3, 4}
    # self-reference: overlap 1.0 by construction (documented)
    self_got = ngram_novelty(docs, docs, n=3).collect()
    assert all(r["overlap_rate"] == 1.0 for r in self_got)


def test_tiff_tiled_edges():
    """r14 tiled-TIFF edges: canvas and tile allocation bombs are
    loud ValueErrors (the GIF 16M-pixel rule), a tile grid whose
    offset count disagrees refuses, and both-layouts-present
    refuses."""
    import struct as _st

    from metacat_spark.llm import multimodal as MM

    def retag(payload, tag, value, size=4):
        t = bytearray(payload)
        n = int.from_bytes(t[8:10], "little")
        for i in range(n):
            off = 10 + 12 * i
            if int.from_bytes(t[off:off + 2], "little") == tag:
                t[off + 8:off + 8 + size] = value.to_bytes(
                    size, "little")
        return bytes(t)

    base = MM.encode_tiff([[(1, 2, 3)] * 4] * 4, tiles=(2, 2))
    # canvas bomb: huge declared w*h
    with pytest.raises(ValueError, match="16M-pixel"):
        MM._tiff_pixels(retag(base, 256, 65535 * 400))
    # tile bomb: huge declared tile dims
    with pytest.raises(ValueError, match="16M-pixel"):
        MM._tiff_pixels(retag(base, 322, 65535 * 400))
    # grid mismatch: shrink TileWidth so across doubles but the
    # offset array stays the same length
    with pytest.raises(ValueError, match="tile layout"):
        MM._tiff_pixels(retag(base, 322, 1))
    # both layouts present: add a StripOffsets tag by rewriting
    # RowsPerStrip's tag id on a strip fixture is contrived — build
    # directly: tile fixture + a 273 entry grafted over tag 277
    graft = bytearray(base)
    n = int.from_bytes(graft[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        if int.from_bytes(graft[off:off + 2], "little") == 259:
            graft[off:off + 2] = (273).to_bytes(2, "little")
    with pytest.raises(ValueError, match="both strip and tile"):
        MM._tiff_pixels(bytes(graft))


def test_decontaminate_novelty_method(spark):
    """r14 pair-free decontamination: train docs largely composed of
    test n-grams drop; unrelated docs survive; the threshold is a
    strict greater-than."""
    from metacat_spark.llm.dedup import decontaminate
    test = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated training material right here"),
         # 4 trigrams, 2 shared -> overlap 2/3 with n=3
         (3, "quick brown fox jumps strangely")],
        "doc_id long, text string")
    kept = {r["doc_id"] for r in decontaminate(
        train, test, method="novelty", n=3,
        threshold=0.5).collect()}
    assert kept == {2}                     # doc 3: 2/3 > 0.5 drops
    kept2 = {r["doc_id"] for r in decontaminate(
        train, test, method="novelty", n=3,
        threshold=round(2 / 3, 6)).collect()}
    assert kept2 == {2, 3}                 # strict >: 2/3 survives


def test_decontaminate_novelty_rejects_max_df(docs):
    """ADVICE r14: max_df is valid for the pair methods but not for
    novelty (which deliberately counts hot n-grams) — passing it must
    be a clean ValueError, not a TypeError from ngram_novelty."""
    import pytest as _pytest
    from metacat_spark.llm import dedup as DD
    test = docs.where("doc_id % 7 = 0")
    with _pytest.raises(ValueError, match="max_df"):
        DD.decontaminate(docs, test, method="novelty", max_df=500)
