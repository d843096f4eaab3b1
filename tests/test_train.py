"""In-engine training tests: hashed-feature logistic regression
(numpy replication, learnability, plan shape) and BPE vocabulary
learning (classic example, pure-Python replay, encode round-trip)."""

import math

import pytest
from pyspark.sql import functions as F

from metacat_spark.llm.text import POLY_MOD
from metacat_spark.llm.train import (bpe_encode, bpe_merges_from_counts,
                                     hashed_count_rows,
                                     score_logreg_hashed,
                                     train_bpe_merges,
                                     train_logreg_hashed, word_counts)


@pytest.fixture(scope="module")
def docs(catalog):
    return catalog.raw["documents"]


@pytest.fixture(scope="module")
def labeled(docs):
    return docs.withColumn("y", (F.col("source") == "src0")
                           .cast("double"))


def _py_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % POLY_MOD
    return acc


# ------------------------------------------------------------ logreg

def test_logreg_matches_numpy_exactly(labeled):
    """Full replication of 3 GD steps in numpy over the same hashed
    tf features — the trained weights must agree to round-6."""
    import numpy as np
    rows = labeled.select("doc_id", F.lower("text").alias("t"),
                          "y").collect()
    B = 64
    X = np.zeros((len(rows), B + 1))
    y = np.zeros(len(rows))
    for i, r in enumerate(rows):
        ws = [w for w in r["t"].split() if w]
        for w in ws:
            X[i, _py_hash(w) % B] += 1
        if ws:
            X[i, :B] /= len(ws)
        X[i, B] = 1.0
        y[i] = r["y"]
    w = np.zeros(B + 1)
    for _ in range(3):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w -= 2.5 * (X.T @ (p - y)) / len(y)
    got = {r["f"]: r["weight"]
           for r in train_logreg_hashed(labeled, "y", steps=3,
                                        lr=2.5, buckets=B).collect()}
    want = {f: round(float(v), 6) for f, v in enumerate(w)
            if f in got}
    # every bucket the engine trained must match numpy; buckets numpy
    # saw but the engine didn't would mean dropped features
    assert got == want
    assert set(got) == {f for f in range(B + 1)
                        if X[:, f].any()}


def test_logreg_learns_the_source_label(labeled):
    """The trained model must actually separate src0 from the rest —
    pairwise ranking accuracy (AUC) > 0.7 at 10 steps."""
    w = train_logreg_hashed(labeled, "y", steps=10, lr=50.0,
                            buckets=256)
    sc = (score_logreg_hashed(labeled, w, buckets=256)
          .join(labeled.select("doc_id", "y"), "doc_id")
          .select("prob", "y").collect())
    pos = sorted(r["prob"] for r in sc if r["y"] == 1.0)
    neg = sorted(r["prob"] for r in sc if r["y"] == 0.0)
    import bisect
    auc = sum(bisect.bisect_left(neg, p) for p in pos) \
        / (len(pos) * len(neg))
    assert auc > 0.7, f"AUC {auc:.3f}"


def test_logreg_bias_only_on_empty_features(spark):
    """A corpus where one doc has no tokens: the bias feature keeps
    it in every margin/gradient; training must not drop or NaN it."""
    df = spark.createDataFrame(
        [(1, "apple apple", 1.0), (2, "", 0.0), (3, "pear", 0.0)],
        ["doc_id", "text", "y"])
    w = {r["f"]: r["weight"]
         for r in train_logreg_hashed(df, "y", steps=2, lr=1.0,
                                      buckets=8).collect()}
    assert 8 in w and all(math.isfinite(v) for v in w.values())
    sc = {r["doc_id"]: r["prob"]
          for r in score_logreg_hashed(
              df, _wdf(spark, w), buckets=8).collect()}
    assert set(sc) == {1, 2, 3}
    assert all(0.0 <= p <= 1.0 for p in sc.values())


def _wdf(spark, w):
    return spark.createDataFrame(
        [(int(f), float(v)) for f, v in sorted(w.items())],
        "f long, weight double")


def test_logreg_rejects_zero_steps(labeled):
    with pytest.raises(ValueError):
        train_logreg_hashed(labeled, "y", steps=0)


def test_logreg_score_plan_broadcasts_weights(labeled, spark):
    df = score_logreg_hashed(labeled, _wdf(spark, {0: 0.5, 64: -0.1}),
                             buckets=64)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_score_stream_equals_batch_scorer(labeled, spark):
    """Train in batch, deploy on the stream: the row-local streaming
    scorer must produce the SAME round-6 margins/probs as the
    relational batch scorer for every document."""
    from conftest import SF_DIR

    from metacat_spark.llm.train import score_stream
    w = train_logreg_hashed(labeled, "y", steps=3, lr=10.0,
                            buckets=64)
    batch = {r["doc_id"]: (r["margin"], r["prob"])
             for r in score_logreg_hashed(labeled, w, buckets=64)
             .collect()}
    streamed = {r["doc_id"]: (r["margin"], r["prob"])
                for r in score_stream(
                    spark, f"{SF_DIR}/documents.parquet", w,
                    buckets=64, table="score_stream_t1").collect()}
    assert set(streamed) == set(batch)
    for d, (m, p) in batch.items():
        sm, sp = streamed[d]
        assert abs(sm - m) <= 1e-6 and abs(sp - p) <= 1e-6, \
            (d, (m, p), (sm, sp))


def test_score_stream_glob_metachar_filename(labeled, spark,
                                             tmp_path):
    """A source FILE whose name contains glob metacharacters must
    still stream (pathGlobFilter is escaped) — previously '[0]' was
    read as a character class, zero files matched, and the result
    was silently empty (review r9; same fix applied to every
    file-stream reader)."""
    import shutil

    from conftest import SF_DIR

    from metacat_spark.llm.train import score_stream
    src = tmp_path / "part-[0].parquet"
    shutil.copy(f"{SF_DIR}/documents.parquet", src)
    w = train_logreg_hashed(labeled, "y", steps=1, lr=1.0, buckets=16)
    out = score_stream(spark, str(src), w, buckets=16,
                       table="score_stream_glob")
    assert out.count() == labeled.count()


# --------------------------------------------------------------- BPE

def test_bpe_classic_merge_order():
    """The Sennrich toy corpus, merges derived by hand: ('e','s')
    wins round 1 on the lexicographic tie with ('s','t</w>') at
    freq 9, 'est</w>' completes in round 2, then 'lo' (7) and the
    ('e','w') tie-break at 6."""
    counts = [("newest", 6), ("widest", 3), ("low", 5), ("lower", 2)]
    merges = bpe_merges_from_counts(counts, 4)
    assert merges == [(1, "e", "s", 9), (2, "es", "t</w>", 9),
                      (3, "l", "o", 7), (4, "e", "w", 6)]


def test_bpe_spark_matches_pure_python(docs):
    got = [(r["step"], r["left"], r["right"], r["freq"])
           for r in train_bpe_merges(docs, num_merges=25,
                                     vocab_cap=2000)
           .orderBy("step").collect()]
    counts = sorted(
        [(r["word"], r["n"])
         for r in word_counts(docs, 2000).collect()],
        key=lambda kv: (-kv[1], kv[0]))
    assert got == bpe_merges_from_counts(counts, 25)
    assert len(got) == 25  # corpus has plenty of repeated pairs


def test_bpe_encode_roundtrip(docs, spark):
    """Concatenating a word's BPE tokens (minus the end marker) must
    reconstruct the word, for every word of every document."""
    merges = train_bpe_merges(docs, num_merges=30, vocab_cap=2000)
    enc = bpe_encode(docs.limit(50), merges)
    joined = (enc.join(docs.select("doc_id", "text"), "doc_id")
              .select("doc_id", "bpe_tokens",
                      F.array_compact(
                          F.split(F.lower("text"), r"\s+"))
                      .alias("words"))
              .collect())
    for r in joined:
        rebuilt = "".join(t for t in r["bpe_tokens"])
        rebuilt = rebuilt.replace("</w>", "")
        assert rebuilt == "".join(w for w in r["words"] if w)
        assert r["bpe_tokens"], r["doc_id"]


def test_bpe_encode_roundtrip_at_32k_ranks(docs, spark):
    """Production-vocab encode (VERDICT r10 #7): a FULL 32,000-merge
    rank dict rides the Arrow encode closure and every document
    still round-trips exactly. The fixture corpus cannot sustain 32k
    merges (its vocabulary exhausts its pair mass — measured 93 on
    sf0.1), so the dict is trained on a deterministic synthetic
    word-count table with abundant pairs (tools/bpe_32k_probe.py
    --synth, same construction); what this pins is the ENCODE stage
    at production dict size, which is corpus-independent."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from bpe_32k_probe import synth_counts
    merges = bpe_merges_from_counts(synth_counts(), 32000)
    assert len(merges) == 32000
    mdf = spark.createDataFrame(
        merges, "step int, left string, right string, freq long")
    enc = bpe_encode(docs, mdf)
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                     lambda x: x != "")
    ref = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.when(F.size(words) > 0,
               F.concat(F.concat_ws(" ", words), F.lit(" ")))
        .otherwise(F.lit("")).alias("ref"))
    detok = enc.select(
        "doc_id",
        F.regexp_replace(F.concat_ws("", "bpe_tokens"), "</w>", " ")
        .alias("detok"))
    joined = detok.join(ref, "doc_id")
    assert joined.where(F.col("detok") != F.col("ref")).count() == 0
    assert joined.count() == docs.where(
        F.col("text").isNotNull()).count()


def test_bpe_encode_unseen_word_stays_chars(spark):
    """Words sharing no learned merge stay character-split (with the
    end marker on the last char)."""
    corpus = spark.createDataFrame(
        [(1, "aa aa aa bb")], ["doc_id", "text"])
    merges = train_bpe_merges(corpus, num_merges=5)
    out = bpe_encode(
        spark.createDataFrame([(9, "aa xyz")], ["doc_id", "text"]),
        merges).collect()[0]
    toks = list(out["bpe_tokens"])
    assert toks[0] == "aa</w>"            # learned merge applies
    assert toks[1:] == ["x", "y", "z</w>"]  # unseen word: chars


def test_bpe_encode_keeps_input_id_type(spark):
    """String-id corpora are legal through load_corpus — the encode
    schema must carry the INPUT id type, not hardcode long
    (review r9)."""
    corpus = spark.createDataFrame(
        [("a-1", "aa aa aa"), ("a-2", "aa bb")], ["doc_id", "text"])
    merges = train_bpe_merges(corpus, num_merges=3)
    out = bpe_encode(corpus, merges).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == ["a-1", "a-2"]
    assert out[0]["bpe_tokens"][0] == "aa</w>"


def test_bpe_properties_on_random_corpora():
    """Property-based pinning of the (no-DuckDB-oracle) BPE learner
    and encoder, pure-Python level: for ANY word-count table —
    1. every learned merge pair occurred >= 2 times when chosen,
    2. encoding rebuilds each word exactly (lossless),
    3. encoding with the learned ranks never yields MORE symbols
       than the char-split baseline, and
    4. re-learning from the same counts is deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from metacat_spark.llm.train import (_bpe_merges_naive,
                                         _encode_word,
                                         bpe_merges_from_counts)

    word_st = st.text(alphabet="abcde", min_size=1, max_size=8)
    counts_st = st.dictionaries(word_st, st.integers(1, 50),
                                min_size=1, max_size=20)

    @settings(max_examples=120, deadline=None)
    @given(counts=counts_st, n_merges=st.integers(0, 12))
    def run(counts, n_merges):
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges = bpe_merges_from_counts(items, n_merges)
        assert merges == bpe_merges_from_counts(items, n_merges)
        # the incremental learner IS the spec rescan loop, merge for
        # merge (r10: incremental pair-count maintenance)
        assert merges == _bpe_merges_naive(items, n_merges)
        assert all(m[3] >= 2 for m in merges)
        assert [m[0] for m in merges] == list(range(1, len(merges) + 1))
        ranks = {(left, right): step for step, left, right, _ in merges}
        for w in counts:
            toks = _encode_word(w, ranks)
            assert "".join(toks).replace("</w>", "") == w
            assert toks[-1].endswith("</w>")
            assert len(toks) <= len(w)

    run()


def test_word_counts_cap_is_takeordered(docs):
    top = word_counts(docs, vocab_cap=5).collect()
    assert len(top) == 5
    ns = [r["n"] for r in top]
    assert ns == sorted(ns, reverse=True)
    plan = word_counts(docs, vocab_cap=5) \
        ._sc._jvm.PythonSQLUtils.explainString(
            word_counts(docs, vocab_cap=5)._jdf.queryExecution(),
            "formatted")
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------- unigram LM tokenizer

def test_unigram_train_is_deterministic_and_keeps_alphabet():
    from metacat_spark.llm.train import unigram_from_counts
    counts = [("hello", 50), ("help", 30), ("world", 40),
              ("word", 25), ("hell", 10), ("low", 8), ("follow", 12)]
    v1 = unigram_from_counts(counts, vocab_size=12)
    v2 = unigram_from_counts(counts, vocab_size=12)
    assert v1 == v2                      # bit-identical reruns
    pieces = {p for p, _ in v1}
    alphabet = {c for w, _ in counts for c in w}
    assert alphabet <= pieces            # chars never pruned
    assert len(v1) <= max(12, len(alphabet))
    # frequent whole words survive as single pieces
    assert "hello" in pieces and "world" in pieces
    # vocab_size below the alphabet: every char still present
    tiny = unigram_from_counts(counts, vocab_size=3)
    assert alphabet <= {p for p, _ in tiny}


def test_unigram_viterbi_matches_bruteforce():
    """Viterbi segmentation must achieve the max total log-prob over
    ALL enumerable segmentations (same single-char floor fallback),
    for every word of a small corpus plus unseen-char words."""
    import math
    from metacat_spark.llm.train import (_viterbi_segment,
                                         unigram_from_counts)
    counts = [("spark", 30), ("sparkle", 10), ("park", 20),
              ("spar", 5), ("lark", 7), ("spa", 9)]
    logp = dict(unigram_from_counts(counts, vocab_size=20))
    floor = math.log(1e-10)

    def score(seg):
        s = 0.0
        for p in seg:
            lp = logp.get(p)
            if lp is None:
                if len(p) > 1:
                    return float("-inf")
                lp = floor
            s += lp
        return s

    def all_segs(w):
        if not w:
            yield []
            return
        for i in range(1, len(w) + 1):
            for rest in all_segs(w[i:]):
                yield [w[:i]] + rest

    for w in ["spark", "sparkle", "park", "larks", "spaq", "qq"]:
        got = _viterbi_segment(w, logp, 8, floor)
        assert "".join(got) == w
        best = max(score(s) for s in all_segs(w))
        assert abs(score(got) - best) < 1e-9, (w, got, best)


def test_unigram_em_loglik_monotone():
    import math
    from metacat_spark.llm.train import (_unigram_estep,
                                         _unigram_seed)
    counts = [("abab", 20), ("abc", 15), ("bcbc", 10), ("cab", 5)]
    seed = _unigram_seed(counts, vocab_size=30)
    tot = sum(seed.values())
    logp = {p: math.log(c / tot) for p, c in seed.items()}
    lls = []
    for _ in range(4):
        e, ll = _unigram_estep(counts, logp, 8)
        lls.append(ll)
        etot = sum(e.values())
        logp = {p: (math.log(e[p] / etot) if e.get(p, 0) > 0
                    else math.log(1e-10))
                for p in logp
                if e.get(p, 0) > 0 or len(p) == 1}
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_unigram_train_encode_roundtrip(docs, spark):
    """End-to-end over the fixture corpus: train a unigram vocab,
    Viterbi-encode every document through the Arrow stage, and
    verify exact detokenization plus real compression (frequent
    words segment into single pieces, so pieces << chars)."""
    from metacat_spark.llm.train import train_unigram, unigram_encode
    vocab = train_unigram(docs, vocab_size=400, vocab_cap=2000)
    rows = vocab.collect()
    assert rows and all(r["logp"] < 0 for r in rows)
    enc = unigram_encode(docs.limit(50), vocab)
    joined = (enc.join(docs.select("doc_id", "text"), "doc_id")
              .select("doc_id", "pieces", "n_pieces",
                      F.array_compact(
                          F.split(F.lower("text"), r"\s+"))
                      .alias("words"))
              .collect())
    assert joined
    multi_used = False
    for r in joined:
        assert "".join(r["pieces"]) == "".join(
            w for w in r["words"] if w)
        assert r["n_pieces"] == len(r["pieces"])
        multi_used |= any(len(p) > 1 for p in r["pieces"])
        n_chars = sum(len(w) for w in r["words"] if w)
        assert r["n_pieces"] <= n_chars
    assert multi_used                    # the model actually learned


# ------------------------------------------------- WordPiece (BERT)

def test_wordpiece_classic_selection_rule():
    """Hand-worked example of the likelihood-gain rule: the chosen
    pair maximizes count(ab)/(count(a)*count(b)) — NOT raw pair
    count. Corpus: hug x10, pug x5, pun x12, bun x4, hugs x5 (the
    canonical WordPiece walkthrough). Unit counts: h=15, ##u=36,
    p=17, ##g=20, ##n=16, b=4, ##s=5, u=... — pair (h,##u)=15 has
    score 15/(15*36); pair (##g,##s)=5 scores 5/(20*5)=1/20, the
    max. First merge is ##gs, not the most frequent pair."""
    from fractions import Fraction

    from metacat_spark.llm.train import (_wordpiece_naive,
                                         wordpiece_from_counts)
    counts = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4),
              ("hugs", 5)]
    merges = wordpiece_from_counts(counts, 3)
    assert merges == _wordpiece_naive(counts, 3)
    step1 = merges[0]
    assert (step1[1], step1[2], step1[3]) == ("##g", "##s", "##gs")
    assert step1[4] == pytest.approx(float(Fraction(5, 20 * 5)))


def test_wordpiece_properties_on_random_corpora():
    """Property pinning of the WordPiece learner + greedy encoder:
    1. incremental learner == spec rescan loop, merge for merge
       (the moving-denominator heap is exact);
    2. deterministic re-learning;
    3. every merged pair occurred >= 2 times when chosen;
    4. greedy encode over the TRAINED vocab rebuilds each training
       word exactly (alphabet is complete, so no [UNK] on training
       data) and never yields more pieces than characters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from metacat_spark.llm.train import (_wordpiece_naive,
                                         _wp_encode_word, _wp_units,
                                         wordpiece_from_counts)

    word_st = st.text(alphabet="abcde", min_size=1, max_size=8)
    counts_st = st.dictionaries(word_st, st.integers(1, 50),
                                min_size=1, max_size=20)

    @settings(max_examples=100, deadline=None)
    @given(counts=counts_st, n_merges=st.integers(0, 12))
    def run(counts, n_merges):
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges = wordpiece_from_counts(items, n_merges)
        assert merges == wordpiece_from_counts(items, n_merges)
        assert merges == _wordpiece_naive(items, n_merges)
        assert [m[0] for m in merges] == list(range(1, len(merges) + 1))
        vocab = set()
        for w in counts:
            vocab.update(_wp_units(w))
        vocab.update(m[3] for m in merges)
        for w in counts:
            toks = _wp_encode_word(w, vocab)
            assert toks[0] + "".join(t[2:] for t in toks[1:]) == w
            assert len(toks) <= len(w)
            assert all(t.startswith("##") for t in toks[1:])
            assert not toks[0].startswith("##")

    run()


def test_wordpiece_encode_greedy_longest_match_and_unk():
    """The BERT WordpieceTokenizer contract: longest vocabulary
    piece at each cursor; ANY unmatchable position turns the WHOLE
    word into [UNK] (never a partial segmentation)."""
    from metacat_spark.llm.train import _wp_encode_word
    vocab = {"un", "##aff", "##able", "##ffable", "u", "##n"}
    # longest-first: "un" beats "u", "##ffable" beats "##ff..."
    assert _wp_encode_word("unffable", vocab) == ["un", "##ffable"]
    assert _wp_encode_word("unaffable", vocab) == ["un", "##aff",
                                                   "##able"]
    # 'x' unreachable -> whole word is UNK, not ["un", UNK]
    assert _wp_encode_word("unx", vocab) == ["[UNK]"]
    assert _wp_encode_word("", vocab) == []
    assert _wp_encode_word("a" * 201, {"a", "##a"}) == ["[UNK]"]


def test_wordpiece_train_encode_spark_roundtrip(docs, spark):
    """End-to-end through the Arrow stage on the documents table:
    train at a small vocab, encode, and re-segment a sample of rows
    with the pure-Python greedy matcher over the same vocab —
    row-for-row equal pieces; vocabulary table is alphabet rows
    (step 0, NULL score) + ordered merge rows."""
    from metacat_spark.llm.train import (_wp_encode_word,
                                         train_wordpiece,
                                         wordpiece_encode)
    vocab = train_wordpiece(docs, vocab_size=300, vocab_cap=500)
    rows = vocab.collect()
    steps = sorted(r["step"] for r in rows)
    assert steps[0] == 0
    assert all(r["score"] is None for r in rows if r["step"] == 0)
    assert all(r["score"] is not None for r in rows if r["step"] > 0)
    assert len({r["piece"] for r in rows}) == len(rows) <= 300
    pieces_set = {r["piece"] for r in rows}

    enc = wordpiece_encode(docs, vocab)
    assert enc.columns == ["doc_id", "pieces", "n_pieces"]
    sample = (enc.join(docs.select("doc_id", "text"), "doc_id")
              .orderBy("doc_id").limit(20).collect())
    assert sample
    for r in sample:
        want = [t for w in r["text"].lower().split() if w
                for t in _wp_encode_word(w, pieces_set)]
        # tokens() splits on whitespace exactly like str.split here
        assert r["pieces"] == want
        assert r["n_pieces"] == len(want)


def test_tokenizer_stats_side_by_side(docs):
    """tokstats invariants on the fixture corpus: one row per
    tokenizer; every fertility >= 1 (each word yields at least one
    piece — [UNK] counts as one); chars_per_piece positive and
    bounded by the longest word; corpus-trained WordPiece never
    falls back to [UNK]; total_pieces consistent with fertility."""
    from metacat_spark.llm.train import tokenizer_stats
    rows = {r["tokenizer"]: r
            for r in tokenizer_stats(docs, vocab_size=300,
                                     vocab_cap=1000).collect()}
    assert set(rows) == {"bpe", "unigram", "wordpiece"}
    for name, r in rows.items():
        assert r["total_pieces"] > 0
        assert r["fertility"] >= 1.0, (name, r)
        assert 0 < r["chars_per_piece"] <= 50, (name, r)
        assert r["vocab_rows"] > 0
    assert rows["wordpiece"]["n_unk_pieces"] == 0
    assert rows["bpe"]["n_unk_pieces"] == 0


def test_wordpiece_deep_merge_units_stay_clean():
    """Regression (r11): when a ##-continuation unit is itself the
    LEFT side of a later merge, the joined unit name must stay a
    CLEAN piece (##bc + ##d -> ##bcd), not a concatenation with
    embedded markers (##b##c##d) — the old within-word merge reused
    BPE's plain concat, so trained units diverged from the recorded
    vocab and greedy encode re-fragmented fully-merged corpora.
    Single word 'abcd': lexicographic tie-breaks force the chain
    ##b+##c -> ##bc, ##bc+##d -> ##bcd, a+##bcd -> abcd."""
    from metacat_spark.llm.train import (_wp_encode_word,
                                         _wp_units,
                                         wordpiece_from_counts)
    counts = [("abcd", 10)]
    merges = wordpiece_from_counts(counts, 3)
    assert [m[3] for m in merges] == ["##bc", "##bcd", "abcd"]
    vocab = set(_wp_units("abcd")) | {m[3] for m in merges}
    assert _wp_encode_word("abcd", vocab) == ["abcd"]


def test_tokenizer_stats_ignores_padding_whitespace(spark):
    """Fertility's word denominator must not count the empty tokens
    split(\\s+) yields at padding whitespace (review r11 — the
    encoders drop them, so counting them understated fertility)."""
    from metacat_spark.llm.train import tokenizer_stats
    docs = spark.createDataFrame(
        [(1, "  hello world  "), (2, "\thello\n")],
        "doc_id long, text string")
    rows = {r["tokenizer"]: r
            for r in tokenizer_stats(docs, vocab_size=40,
                                     vocab_cap=50).collect()}
    # 3 real words; every tokenizer fully merges this tiny corpus
    for r in rows.values():
        assert r["fertility"] >= 1.0
        assert r["total_pieces"] >= 3
