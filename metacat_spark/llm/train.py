"""In-engine model training for curation models.

Two trainers a training-data pipeline needs in-warehouse (so the
corpus never leaves the cluster):

- ``train_logreg_hashed``: a fastText-shaped quality/domain classifier
  — logistic regression over HASHED unigram counts, full-batch
  gradient descent. The feature space is a fixed `buckets`-bin hash
  space, so the weight vector and every gradient are bucket-bounded:
  weights broadcast to the scan, gradients reduce to ≤ buckets+1 rows
  per step, and the only corpus-sized shuffles are one occurrence
  aggregation (built once, cached across steps) and one join per step
  of occurrence rows against per-doc errors. Deterministic: weights
  start at zero, data order never enters the math (sums are
  order-free up to float association), so the DuckDB oracle replays
  every unrolled step exactly.
- ``train_bpe_merges`` / ``bpe_encode``: byte-pair-encoding vocabulary
  learning (Sennrich et al. 2016). The distributed half is the word-
  frequency aggregation (one shuffle, vocabulary-bounded output); the
  merge loop runs driver-side over the BOUNDED word-count table — the
  standard architecture (count once, merge over counts), not a
  per-merge corpus rescan. Encoding applies the learned merge ranks
  corpus-side in one Arrow-batched stage.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import POLY_MOD, poly_hash, term_rows, tokens


# ------------------------------------------------------------ logreg

def hashed_count_rows(df: DataFrame, buckets: int = 256,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, f, cnt) sparse feature rows: lowercased whitespace terms
    hashed into `buckets` bins via the shared rolling hash, counted
    per document and NORMALIZED by document length (cnt = term
    occurrences / doc terms — the fastText mean-of-buckets shape, so
    margins stay O(‖w‖) regardless of document length and unit
    learning rates don't saturate the sigmoid), plus a constant bias
    feature (f = buckets, cnt = 1) for every document — including
    zero-token ones."""
    occ = term_rows(df, text_col, id_col).select(
        "id", (poly_hash(F.col("term")) % buckets).alias("f"))
    cnt = occ.groupBy("id", "f").agg(
        F.count("*").cast("double").alias("c"))
    tot = occ.groupBy("id").agg(
        F.count("*").cast("double").alias("t"))
    feats = (cnt.join(tot, "id")
             .select("id", "f", (F.col("c") / F.col("t"))
                     .alias("cnt")))
    bias = df.select(F.col(id_col).alias("id"),
                     F.lit(buckets).cast("long").alias("f"),
                     F.lit(1.0).alias("cnt"))
    return feats.unionByName(bias)


def train_logreg_hashed(df: DataFrame, label_col: str,
                        steps: int = 10, lr: float = 10.0,
                        buckets: int = 256, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Train a logistic-regression classifier over hashed unigram
    counts by full-batch gradient descent from zero weights:

        p_d    = sigmoid(Σ_f w[f] · cnt_df)
        grad_f = Σ_d (p_d − y_d) · cnt_df / N
        w      ← w − lr · grad

    `label_col` is a numeric/boolean column (cast to double ∈ {0,1}).
    Returns the trained (f, weight) table — buckets+1 rows, the last
    bucket is the bias — with weights rounded to 6 decimals. Feed the
    UNROUNDED pipeline into scoring by re-running; the rounded table
    is the portable model artifact.

    Scale shape: per step, ONE corpus-sized equi-join (occurrence
    rows × per-doc errors, both partitioned by id) and ONE reduce to
    ≤ buckets+1 gradient rows, which are collected driver-side
    (bounded — the same contract as IVF centroid training) and
    re-broadcast as the next step's literal weight table. The feature
    rows are built once and cached across steps.
    """
    if steps < 1:
        raise ValueError("train_logreg_hashed: steps must be >= 1")
    x = hashed_count_rows(df, buckets, text_col, id_col)
    y = df.select(F.col(id_col).alias("id"),
                  F.col(label_col).cast("double").alias("y"))
    x = x.persist()
    try:
        n_docs = float(y.count())
        w = {}  # bucket -> weight; zero-init, missing = 0.0
        spark = df.sparkSession
        for _ in range(steps):
            if w:
                wdf = spark.createDataFrame(
                    [(int(f), float(v)) for f, v in sorted(w.items())],
                    "f long, w double")
                margins = (x.join(F.broadcast(wdf), "f", "left")
                           .groupBy("id")
                           .agg(F.sum(F.col("cnt")
                                      * F.coalesce(F.col("w"),
                                                   F.lit(0.0)))
                                .alias("m")))
            else:
                # zero weights: margin is exactly 0 for every doc
                margins = y.select("id", F.lit(0.0).alias("m"))
            err = (margins.join(y, "id")
                   .select("id", (F.lit(1.0)
                                  / (F.lit(1.0) + F.exp(-F.col("m")))
                                  - F.col("y")).alias("e")))
            grad = (x.join(err, "id")
                    .groupBy("f")
                    .agg((F.sum(F.col("cnt") * F.col("e")) / n_docs)
                         .alias("g"))
                    .collect())  # bounded: <= buckets + 1 rows
            for r in grad:
                w[r["f"]] = w.get(r["f"], 0.0) - lr * r["g"]
    finally:
        x.unpersist()
    return df.sparkSession.createDataFrame(
        [(int(f), round(v, 6)) for f, v in sorted(w.items())],
        "f long, weight double")


def score_logreg_hashed(df: DataFrame, weights: DataFrame,
                        buckets: int = 256, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Score documents with a trained hashed-feature model: margin =
    Σ w[f]·cnt, prob = sigmoid(margin). The weight table is bucket-
    bounded and broadcast — the corpus side never shuffles beyond the
    one per-doc aggregate. Returns (id_col, margin, prob), round-6."""
    x = hashed_count_rows(df, buckets, text_col, id_col)
    w = weights.select("f", F.col("weight").cast("double").alias("w"))
    agg = (x.join(F.broadcast(w), "f", "left")
           .groupBy("id")
           .agg(F.sum(F.col("cnt") * F.coalesce(F.col("w"),
                                                F.lit(0.0)))
                .alias("margin")))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
    return agg.select(F.col("id").alias(id_col),
                      F.round("margin", 6).alias("margin"),
                      F.round(prob, 6).alias("prob"))


def _rowlocal_score_cols(weights_map: dict, buckets: int,
                         text_col: str):
    """(margin, prob) column pair computed ROW-LOCALLY from a bounded
    weight map literal: margin = (Σ_tokens w[hash(tok) % B]) / dl +
    w_bias — algebraically identical to the relational scorer's
    Σ_f (c_f/dl)·w_f, but with zero shuffles, so it runs on a
    STREAM (no aggregation state) as well as in batch."""
    wmap = F.create_map(*[F.lit(x) for kv in
                          sorted(weights_map.items()) for x in kv]) \
        if weights_map else F.create_map()
    toks = F.filter(tokens(F.lower(F.col(text_col))),
                    lambda t: t != "")
    contrib = F.aggregate(
        toks, F.lit(0.0),
        lambda acc, t: acc + F.coalesce(
            wmap[(poly_hash(t) % buckets)], F.lit(0.0)))
    bias = float(weights_map.get(buckets, 0.0))
    margin = (F.coalesce(F.try_divide(contrib, F.size(toks)),
                         F.lit(0.0)) + F.lit(bias))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return margin, prob


def score_stream(spark, src_dir: str, weights: DataFrame,
                 buckets: int = 256, table: str = "score_stream",
                 text_col: str = "text", id_col: str = "doc_id",
                 sink_dir: str | None = None,
                 checkpoint_dir: str | None = None,
                 timeout_s: int | None = 120) -> DataFrame:
    """Streaming twin of ``score_logreg_hashed``: score a document
    STREAM with a trained weight table — the train-in-batch /
    deploy-on-the-stream loop. Scoring is rewritten row-locally
    (weight map literal + one array fold per document, no
    aggregation state, plain append mode), which is algebraically
    the same margin as the batch scorer's relational plan;
    equivalence is pinned by test.

    Deploy posture: pass ``sink_dir`` — each micro-batch parquet-
    appends the per-doc scores there and the return value is the
    BOUNDED per-batch gauge (batch_id, n, n_positive, avg_prob), so
    driver state never grows with the stream (VERDICT r11 #1;
    checkpointed, at-least-once — see ``drain_to_parquet``).
    Without it: availableNow → memory sink, the test rig. File-sink
    ≡ memory-sink ≡ batch pinned by test."""

    from .util import drain_to_parquet, stream_parquet

    wmap = {int(r["f"]): float(r["weight"])
            for r in weights.collect()}  # bounded: <= buckets+1
    stream = stream_parquet(spark, src_dir)
    margin, prob = _rowlocal_score_cols(wmap, buckets, text_col)
    out = stream.select(F.col(id_col),
                        F.round(margin, 6).alias("margin"),
                        F.round(prob, 6).alias("prob"))
    if sink_dir is not None:
        return drain_to_parquet(
            spark, out, sink_dir,
            [F.count("*").alias("n"),
             F.sum((F.col("margin") > 0).cast("long"))
             .alias("n_positive"),
             F.round(F.avg("prob"), 6).alias("avg_prob")],
            "n long, n_positive long, avg_prob double",
            checkpoint_dir=checkpoint_dir, timeout_s=timeout_s,
            what="score_stream")
    q = (out.writeStream.format("memory").queryName(table)
         .outputMode("append").trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(
            "score_stream did not finish within 120s — refusing to "
            "return a partially populated memory table")
    return spark.table(table)


# --------------------------------------------------------------- BPE

def word_counts(df: DataFrame, vocab_cap: int = 50000,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(word, n) corpus word frequencies, capped to the top
    `vocab_cap` forms by count (ties by word). Thin rename over
    text.top_terms (ONE tokenization/tie-break/TakeOrdered contract
    — review r9); the cap bounds the driver-side merge loop, and
    rare forms past it contribute negligible pair mass (standard BPE
    practice trains on a frequency-truncated word table)."""
    from .text import top_terms
    return (top_terms(df, vocab_cap, text_col, id_col)
            .select(F.col("term").alias("word"), "n"))


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if (i + 1 < len(sym) and sym[i] == pair[0]
                and sym[i + 1] == pair[1]):
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _bpe_merges_naive(counts: list, num_merges: int) -> list:
    """The SPEC implementation of the merge learner: rebuild every
    pair count from every word each step (Sennrich et al. 2016,
    Algorithm 1 verbatim). O(merges × corpus-vocab) — kept as the
    executable specification the incremental learner is property-
    tested against (and for forensics), not for production use."""
    segs = {w: tuple(list(w[:-1]) + [w[-1] + "</w>"]) if len(w) else ()
            for w, _ in counts}
    freq = dict(counts)
    merges = []
    for step in range(1, num_merges + 1):
        pairs: dict = {}
        for w, n in freq.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # max count; ties go to the lexicographically smallest pair
        (left, right), best_n = min(pairs.items(),
                                    key=lambda kv: (-kv[1], kv[0]))
        if best_n < 2:
            break
        merges.append((step, left, right, best_n))
        for w in freq:
            if left in segs[w] or right in segs[w]:
                segs[w] = _merge_word(segs[w], (left, right))
    return merges


def bpe_merges_from_counts(counts: list, num_merges: int) -> list:
    """Pure-Python BPE merge learner over (word, n) counts — Sennrich
    et al. 2016 with an end-of-word marker and DETERMINISTIC ties
    (max count, then lexicographic pair). Returns
    [(step, left, right, freq)]. Stops early when no pair repeats.

    INCREMENTAL pair-count maintenance (VERDICT r9 #4 / the
    subword-nmt update trick): pair totals, a pair→words inverted
    index, and a lazy-invalidation heap are maintained across steps,
    so each merge touches only the words actually CONTAINING the
    merged pair instead of rescanning the whole word table —
    production vocab sizes (32k–50k merges) become minutes, not
    hours. Property-tested equal to ``_bpe_merges_naive`` (the spec
    rescan loop) on random corpora; measured wall-clock in
    docs/SCALING.md."""
    import heapq

    segs = {w: tuple(list(w[:-1]) + [w[-1] + "</w>"]) if len(w) else ()
            for w, _ in counts}
    freq = dict(counts)
    pairs: dict = {}    # pair -> total corpus count
    where: dict = {}    # pair -> {word: #distinct add-sites} index

    def index_word(w: str, n: int, sign: int, touched: set):
        s = segs[w]
        for a, b in zip(s, s[1:]):
            p = (a, b)
            pairs[p] = pairs.get(p, 0) + sign * n
            touched.add(p)
            d = where.setdefault(p, {})
            d[w] = d.get(w, 0) + sign
            if not d[w]:
                del d[w]
            if not pairs[p]:
                del pairs[p]
                if not d:
                    where.pop(p, None)

    seed: set = set()
    for w, n in freq.items():
        index_word(w, n, +1, seed)
    # heap of (-count, pair); stale entries (count changed since
    # push) are skipped at pop time — the standard lazy heap. Tuple
    # order (-n, pair) reproduces the spec's (max count, lexicographic
    # pair) tie-break exactly.
    heap = [(-n, p) for p, n in pairs.items()]
    heapq.heapify(heap)
    merges = []
    for step in range(1, num_merges + 1):
        while heap and pairs.get(heap[0][1], 0) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap:
            break
        best_n, (left, right) = -heap[0][0], heap[0][1]
        if best_n < 2:
            break
        merges.append((step, left, right, best_n))
        touched: set = set()
        # ONLY words containing the adjacent (left, right) pair — the
        # spec's `left in segs[w] or right in segs[w]` sweep is a
        # no-op on every other word (_merge_word only rewrites the
        # adjacent pair), so this restriction is exact
        for w in list(where.get((left, right), {})):
            n = freq[w]
            index_word(w, n, -1, touched)
            segs[w] = _merge_word(segs[w], (left, right))
            index_word(w, n, +1, touched)
        for p in touched:
            if p in pairs:
                heapq.heappush(heap, (-pairs[p], p))
    return merges


def train_bpe_merges(df: DataFrame, num_merges: int = 100,
                     vocab_cap: int = 50000, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Learn a BPE merge table from the corpus: ONE distributed word-
    frequency aggregation (the corpus-sized work), then the classic
    merge loop driver-side over the bounded count table. Returns
    (step, left, right, freq) — the ordered merge list that defines
    the tokenizer."""
    counts = [(r["word"], r["n"])
              for r in word_counts(df, vocab_cap, text_col,
                                   id_col).collect()]
    counts.sort(key=lambda kv: (-kv[1], kv[0]))  # order-independence
    merges = bpe_merges_from_counts(counts, num_merges)
    spark = df.sparkSession
    if not merges:
        return spark.createDataFrame(
            [], "step int, left string, right string, freq long")
    return spark.createDataFrame(
        merges, "step int, left string, right string, freq long")


def _encode_word(word: str, ranks: dict) -> list:
    if not word:
        return []
    sym = tuple(list(word[:-1]) + [word[-1] + "</w>"])
    while len(sym) > 1:
        cand = [(ranks[p], p) for p in zip(sym, sym[1:])
                if p in ranks]
        if not cand:
            break
        sym = _merge_word(sym, min(cand)[1])
    return list(sym)


def bpe_encode(df: DataFrame, merges: DataFrame,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Tokenize every document with a learned merge table: lowercased
    whitespace words re-segmented by merge rank (lowest step wins,
    the canonical greedy BPE apply). One Arrow-batched mapInPandas
    stage; the merge ranks ride the closure (bounded — num_merges
    entries). Returns (id_col, bpe_tokens array<string>,
    n_bpe_tokens)."""
    ranks = {(r["left"], r["right"]): r["step"]
             for r in merges.collect()}  # bounded: num_merges rows
    base = df.select(F.col(id_col).alias("id"),
                     F.array_compact(tokens(F.lower(F.col(text_col))))
                     .alias("toks"))
    # output id keeps the INPUT id type (string/int/... corpora are
    # all legal through load_corpus — review r9)
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches):
        for pdf in batches:
            toks = pdf["toks"].map(
                lambda ws: [t for w in ws if w
                            for t in _encode_word(w, ranks)])
            yield pd.DataFrame({"id": pdf["id"], "bpe_tokens": toks,
                                "n_bpe_tokens": toks.map(len)})

    return (base.mapInPandas(
        run, f"id {id_type}, bpe_tokens array<string>, "
             f"n_bpe_tokens long")
        .withColumnRenamed("id", id_col))


# ----------------------------------------- unigram LM (SentencePiece)

def _unigram_seed(counts: list, vocab_size: int,
                  seed_factor: int = 4,
                  max_piece_len: int = 8) -> dict:
    """Seed vocabulary for the unigram trainer: EVERY single
    character (the alphabet must stay segmentable through pruning),
    plus the top ``seed_factor × vocab_size`` multi-char substrings
    ranked by count × length — the SentencePiece suffix-array seed
    (Kudo 2018 §3.2), computed directly over the BOUNDED word-count
    table instead of a suffix array (the table is vocab_cap rows, so
    the O(Σ len × max_piece_len) substring sweep is driver-cheap).
    Returns {piece: occurrence_count}."""
    sub: dict = {}
    chars: dict = {}
    for w, n in counts:
        for i in range(len(w)):
            chars[w[i]] = chars.get(w[i], 0) + n
            for j in range(i + 2,
                           min(i + max_piece_len, len(w)) + 1):
                p = w[i:j]
                sub[p] = sub.get(p, 0) + n
    top = sorted(sub.items(),
                 key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))
    seed = dict(chars)
    for p, c in top[:max(0, seed_factor * vocab_size)]:
        seed[p] = c
    return seed


def _unigram_estep(counts: list, logp: dict,
                   max_piece_len: int) -> tuple:
    """One E-step over every word's segmentation lattice:
    forward-backward in log space accumulates each piece's EXPECTED
    count under the current model (posterior edge mass × word
    frequency). Returns (expected: dict, loglik: float). A word
    containing a character absent from the model contributes nothing
    (cannot happen while the alphabet is kept alive)."""
    NEG = float("-inf")
    expected: dict = {}
    loglik = 0.0
    for w, n in counts:
        L = len(w)
        if L == 0:
            continue
        alpha = [NEG] * (L + 1)
        alpha[0] = 0.0
        edges = []
        for i in range(1, L + 1):
            acc = NEG
            for j in range(max(0, i - max_piece_len), i):
                lp = logp.get(w[j:i])
                if lp is None or alpha[j] == NEG:
                    continue
                v = alpha[j] + lp
                edges.append((j, i, w[j:i], lp))
                acc = v if acc == NEG else (
                    max(acc, v) + math.log1p(
                        math.exp(-abs(acc - v))))
            alpha[i] = acc
        if alpha[L] == NEG:
            continue
        beta = [NEG] * (L + 1)
        beta[L] = 0.0
        for i in range(L - 1, -1, -1):
            acc = NEG
            for k in range(i + 1, min(i + max_piece_len, L) + 1):
                lp = logp.get(w[i:k])
                if lp is None or beta[k] == NEG:
                    continue
                v = lp + beta[k]
                acc = v if acc == NEG else (
                    max(acc, v) + math.log1p(
                        math.exp(-abs(acc - v))))
            beta[i] = acc
        total = alpha[L]
        loglik += n * total
        for j, i, p, lp in edges:
            if beta[i] == NEG:
                continue
            post = math.exp(alpha[j] + lp + beta[i] - total)
            if post > 0.0:
                expected[p] = expected.get(p, 0.0) + n * post
    return expected, loglik


def unigram_from_counts(counts: list, vocab_size: int = 8000,
                        seed_factor: int = 4,
                        max_piece_len: int = 8,
                        em_iters: int = 2,
                        shrink: float = 0.75) -> list:
    """Pure-Python unigram-LM tokenizer trainer over (word, n)
    counts — the SentencePiece unigram algorithm (Kudo 2018):
    substring seed → alternate (EM over the segmentation lattices,
    prune) until the vocabulary reaches ``vocab_size``, then one
    final EM renormalization. Single characters are never pruned
    (every word stays segmentable). Pruning keeps the multi-char
    pieces with the highest EXPECTED counts from the last E-step —
    the standard reimplementation simplification of SentencePiece's
    exact leave-one-out likelihood loss (documented divergence: the
    exact criterion re-solves each lattice without the candidate
    piece; expected-count ranking agrees with it except near ties).

    Deterministic: seed ranking, pruning, and the returned list are
    tie-broken lexicographically. Returns [(piece, logp)] sorted by
    piece."""
    seed = _unigram_seed(counts, vocab_size, seed_factor,
                         max_piece_len)
    if not seed:
        return []
    tot = sum(seed.values())
    logp = {p: math.log(c / tot) for p, c in seed.items()}
    floor = math.log(1e-10)
    while True:
        expected: dict = {}
        for _ in range(max(1, em_iters)):
            expected, _ll = _unigram_estep(counts, logp,
                                           max_piece_len)
            etot = sum(expected.values())
            if etot <= 0:
                break
            new = {}
            for p in logp:
                e = expected.get(p, 0.0)
                if len(p) == 1:
                    new[p] = (math.log(e / etot) if e > 0
                              else floor)   # alphabet stays alive
                elif e / etot > 1e-30:
                    # numerically dead pieces (posterior mass below
                    # any Viterbi relevance) are dropped HERE, not
                    # carried into the vocab at logp ≈ -300 — the
                    # final vocabulary may come in under vocab_size
                    # when the corpus can't support that many real
                    # pieces
                    new[p] = math.log(e / etot)
            logp = new
        n_chars = sum(1 for p in logp if len(p) == 1)
        multi = sorted(
            ((p, expected.get(p, 0.0)) for p in logp if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]))
        if n_chars + len(multi) <= vocab_size or not multi:
            # at target — or the un-prunable alphabet alone already
            # meets/exceeds vocab_size (a further loop could never
            # shrink anything: hang guard)
            break
        # shrink < 1 guarantees keep < len(multi): strict progress
        keep = max(vocab_size - n_chars, 0,
                   int(len(multi) * shrink))
        if keep >= len(multi):
            keep = len(multi) - 1
        kept = {p for p, _ in multi[:keep]}
        logp = {p: lp for p, lp in logp.items()
                if len(p) == 1 or p in kept}
    return sorted(logp.items())


def _viterbi_segment(word: str, logp: dict, max_piece_len: int,
                     floor: float) -> list:
    """Most-probable segmentation of one word under the unigram
    model (classic DP). Characters absent from the vocabulary fall
    back to single-char pieces at ``floor`` log-prob, so encoding is
    total. Deterministic tie-break: the LONGEST final piece wins
    (strictly-greater comparison over j descending)."""
    L = len(word)
    if L == 0:
        return []
    NEG = float("-inf")
    best = [NEG] * (L + 1)
    best[0] = 0.0
    back = [0] * (L + 1)
    for i in range(1, L + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor
            if best[j] == NEG:
                continue
            v = best[j] + lp
            if v > best[i]:
                best[i], back[i] = v, j
    out, i = [], L
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def train_unigram(df: DataFrame, vocab_size: int = 8000,
                  vocab_cap: int = 50000, seed_factor: int = 4,
                  max_piece_len: int = 8, em_iters: int = 2,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Learn a unigram-LM tokenizer vocabulary from the corpus: the
    SAME architecture as train_bpe_merges — ONE distributed
    word-frequency aggregation (the corpus-sized work, map-side
    combinable, TakeOrdered cap), then EM + pruning driver-side over
    the BOUNDED count table (``unigram_from_counts``). Returns
    (piece, logp) — the model ``unigram_encode`` segments with."""
    counts = [(r["word"], r["n"])
              for r in word_counts(df, vocab_cap, text_col,
                                   id_col).collect()]
    counts.sort(key=lambda kv: (-kv[1], kv[0]))
    vocab = unigram_from_counts(counts, vocab_size,
                                seed_factor=seed_factor,
                                max_piece_len=max_piece_len,
                                em_iters=em_iters)
    spark = df.sparkSession
    if not vocab:
        return spark.createDataFrame([], "piece string, logp double")
    return spark.createDataFrame(vocab, "piece string, logp double")


def unigram_encode(df: DataFrame, vocab: DataFrame,
                   max_piece_len: int = 8, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Tokenize every document with a learned unigram vocabulary:
    lowercased whitespace words segmented by Viterbi under the piece
    log-probs (most-probable segmentation — Kudo 2018 decoding). One
    Arrow-batched mapInPandas stage; the vocabulary rides the
    closure (bounded — vocab_size rows). Unseen characters fall back
    to single-char floor pieces, so encoding never drops text.
    Returns (id_col, pieces array<string>, n_pieces)."""
    logp = {r["piece"]: r["logp"] for r in vocab.collect()}
    floor = math.log(1e-10)
    base = df.select(F.col(id_col).alias("id"),
                     F.array_compact(tokens(F.lower(F.col(text_col))))
                     .alias("toks"))
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches):
        for pdf in batches:
            pieces = pdf["toks"].map(
                lambda ws: [t for w in ws if w
                            for t in _viterbi_segment(
                                w, logp, max_piece_len, floor)])
            yield pd.DataFrame({"id": pdf["id"], "pieces": pieces,
                                "n_pieces": pieces.map(len)})

    return (base.mapInPandas(
        run, f"id {id_type}, pieces array<string>, n_pieces long")
        .withColumnRenamed("id", id_col))


# ----------------------------------------- WordPiece (BERT-style)

def _wp_units(word: str) -> tuple:
    """Initial WordPiece segmentation of one word: first char raw,
    every continuation char prefixed ``##`` (Schuster & Nakajima
    2012 / the BERT tokenizer convention — the prefix marks
    word-internal position, the mirror image of BPE's ``</w>`` end
    marker)."""
    if not word:
        return ()
    return tuple([word[0]] + ["##" + c for c in word[1:]])


def _wp_join(a: str, b: str) -> str:
    """Concatenate two adjacent WordPiece units: the right unit's
    ``##`` continuation marker is interior after the join and is
    dropped (``##l + ##o -> ##lo``, ``h + ##e -> he``)."""
    return a + (b[2:] if b.startswith("##") else b)


def _wp_merge_word(sym: tuple, pair: tuple) -> tuple:
    """WordPiece within-word merge: like BPE's ``_merge_word`` but
    the joined unit drops the right side's ``##`` marker
    (``_wp_join``), so unit names stay CLEAN pieces at every depth.
    Using plain concatenation here left embedded ``##`` in
    deeply-merged unit names (``##a + ##b -> ##a##b``) while the
    recorded vocab piece was the clean ``##ab`` — trained units and
    vocabulary diverged, whole words never reached the vocab, and
    greedy encode re-fragmented fully-merged corpora (caught by the
    tokenizer_stats fertility cross-check, r11)."""
    out, i = [], 0
    while i < len(sym):
        if (i + 1 < len(sym) and sym[i] == pair[0]
                and sym[i + 1] == pair[1]):
            out.append(_wp_join(sym[i], sym[i + 1]))
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _wordpiece_naive(counts: list, num_merges: int) -> list:
    """The SPEC implementation of the WordPiece merge learner:
    rebuild every pair AND unit count from every word each step,
    then merge the pair maximizing the likelihood-gain score
    count(ab) / (count(a) * count(b)) — the published WordPiece
    selection rule (Schuster & Nakajima 2012; HuggingFace tokenizers
    implements the same ratio). Scores compare EXACTLY (integer
    cross-multiplication via Fraction), ties go to the
    lexicographically smallest pair; pairs seen once never merge.
    O(merges x corpus-vocab) — kept as the executable specification
    the incremental learner is property-tested against, not for
    production use."""
    from fractions import Fraction

    segs = {w: _wp_units(w) for w, _ in counts}
    freq = dict(counts)
    merges = []
    for step in range(1, num_merges + 1):
        pairs: dict = {}
        units: dict = {}
        for w, n in freq.items():
            s = segs[w]
            for u in s:
                units[u] = units.get(u, 0) + n
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        cand = [(-Fraction(c, units[a] * units[b]), (a, b), c)
                for (a, b), c in pairs.items() if c >= 2]
        if not cand:
            break
        score, (left, right), c = min(cand,
                                      key=lambda kv: (kv[0], kv[1]))
        merges.append((step, left, right, _wp_join(left, right),
                       float(-score)))
        for w in freq:
            if left in segs[w] or right in segs[w]:
                segs[w] = _wp_merge_word(segs[w], (left, right))
    return merges


def wordpiece_from_counts(counts: list, num_merges: int) -> list:
    """Pure-Python WordPiece merge learner over (word, n) counts.
    Same selection rule as ``_wordpiece_naive`` (max
    count(ab)/(count(a)*count(b)), exact Fraction comparison,
    lexicographic ties) with INCREMENTAL maintenance — the BPE
    inverted-index trick (``bpe_merges_from_counts``) extended for
    the score's moving denominator:

    - pair totals + pair->words index update only at words touched
      by a merge (the numerator side, identical to BPE);
    - unit totals change ONLY for the two merged units and their
      join, so the set of pairs whose SCORE moved is (touched pairs)
      UNION (pairs containing ``left`` or ``right`` as an element) —
      tracked by a unit->pairs index and re-pushed;
    - the lazy heap stores (score, pair, c_ab, c_a, c_b) and a
      popped entry is stale unless all three counts still match —
      scores can move in BOTH directions here (a shrinking
      denominator RAISES scores), which count-stamping handles and
      plain value-compare would not.

    Property-tested merge-for-merge equal to the spec rescan loop on
    random corpora. Returns [(step, left, right, piece, score)]."""
    import heapq
    from fractions import Fraction

    segs = {w: _wp_units(w) for w, _ in counts}
    freq = dict(counts)
    pairs: dict = {}      # pair -> corpus count
    units: dict = {}      # unit -> corpus count
    where: dict = {}      # pair -> {word: #add-sites}
    upairs: dict = {}     # unit -> set of pairs containing it

    def index_word(w: str, n: int, sign: int, touched: set):
        s = segs[w]
        for u in s:
            units[u] = units.get(u, 0) + sign * n
            if not units[u]:
                del units[u]
        for a, b in zip(s, s[1:]):
            p = (a, b)
            pairs[p] = pairs.get(p, 0) + sign * n
            touched.add(p)
            d = where.setdefault(p, {})
            d[w] = d.get(w, 0) + sign
            if not d[w]:
                del d[w]
            upairs.setdefault(a, set()).add(p)
            upairs.setdefault(b, set()).add(p)
            if not pairs[p]:
                del pairs[p]
                if not d:
                    where.pop(p, None)
                upairs[a].discard(p)
                upairs[b].discard(p)

    seed: set = set()
    for w, n in freq.items():
        index_word(w, n, +1, seed)

    def entry(p):
        c = pairs[p]
        ca, cb = units[p[0]], units[p[1]]
        return (-Fraction(c, ca * cb), p, c, ca, cb)

    heap = [entry(p) for p, c in pairs.items() if c >= 2]
    heapq.heapify(heap)
    merges = []
    for step in range(1, num_merges + 1):
        while heap:
            _s, p, c, ca, cb = heap[0]
            if (pairs.get(p, 0) == c and units.get(p[0], 0) == ca
                    and units.get(p[1], 0) == cb):
                break
            heapq.heappop(heap)
        if not heap:
            break
        score, (left, right), c, _ca, _cb = heap[0]
        merges.append((step, left, right, _wp_join(left, right),
                       float(-score)))
        touched: set = set()
        for w in list(where.get((left, right), {})):
            n = freq[w]
            index_word(w, n, -1, touched)
            segs[w] = _wp_merge_word(segs[w], (left, right))
            index_word(w, n, +1, touched)
        # scores moved at: pairs with changed counts (touched) and
        # pairs whose ENDPOINT unit count changed (left/right lost
        # occurrences, the joined unit is new and enters via touched)
        moved = set(touched)
        moved |= upairs.get(left, set())
        moved |= upairs.get(right, set())
        for p in moved:
            if pairs.get(p, 0) >= 2:
                heapq.heappush(heap, entry(p))
    return merges


def train_wordpiece(df: DataFrame, vocab_size: int = 8000,
                    vocab_cap: int = 50000, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Learn a WordPiece vocabulary from the corpus: ONE distributed
    word-frequency aggregation (the corpus-sized work — shared with
    BPE/unigram via ``word_counts``), then the likelihood-gain merge
    loop driver-side over the BOUNDED count table. The vocabulary is
    the alphabet (every first-position char + every ``##``
    continuation char, which must stay matchable) plus merged pieces
    until ``vocab_size`` total. Returns (step, piece, score):
    step=0 alphabet rows (score NULL), then one row per merge —
    ordered, so the table doubles as the merge log."""
    counts = [(r["word"], r["n"])
              for r in word_counts(df, vocab_cap, text_col,
                                   id_col).collect()]
    counts.sort(key=lambda kv: (-kv[1], kv[0]))
    alphabet: set = set()
    for w, _ in counts:
        alphabet.update(_wp_units(w))
    n_merges = max(0, vocab_size - len(alphabet))
    merges = wordpiece_from_counts(counts, n_merges)
    rows = [(0, u, None) for u in sorted(alphabet)]
    rows += [(step, piece, score)
             for step, _l, _r, piece, score in merges]
    spark = df.sparkSession
    if not rows:
        return spark.createDataFrame(
            [], "step int, piece string, score double")
    return spark.createDataFrame(
        rows, "step int, piece string, score double")


def _wp_encode_word(word: str, vocab: set, unk: str = "[UNK]",
                    max_chars: int = 200) -> list:
    """Greedy longest-match-first WordPiece tokenization of one word
    (the BERT ``WordpieceTokenizer`` algorithm): repeatedly take the
    LONGEST vocabulary piece matching at the cursor (continuation
    positions match with the ``##`` prefix); if no piece matches at
    some position the WHOLE word becomes ``unk`` — WordPiece never
    emits a partial word (unlike BPE/unigram, which always segment).
    Words longer than ``max_chars`` are ``unk`` outright (the BERT
    guard against pathological tokens)."""
    if not word:
        return []
    if len(word) > max_chars:
        return [unk]
    out, start, L = [], 0, len(word)
    while start < L:
        end = L
        cur = None
        while start < end:
            piece = word[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [unk]
        out.append(cur)
        start = end
    return out


def wordpiece_encode(df: DataFrame, vocab: DataFrame,
                     unk: str = "[UNK]", text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Tokenize every document with a learned WordPiece vocabulary:
    lowercased whitespace words segmented greedy-longest-match-first
    (BERT's WordpieceTokenizer). One Arrow-batched mapInPandas
    stage; the vocabulary rides the closure (bounded — vocab_size
    rows). Unmatchable words become ``unk`` whole (the WordPiece
    contract), so n_pieces counts every word exactly once or more.
    Returns (id_col, pieces array<string>, n_pieces)."""
    pieces_set = {r["piece"] for r in vocab.collect()}
    base = df.select(F.col(id_col).alias("id"),
                     F.array_compact(tokens(F.lower(F.col(text_col))))
                     .alias("toks"))
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches):
        for pdf in batches:
            pieces = pdf["toks"].map(
                lambda ws: [t for w in ws if w
                            for t in _wp_encode_word(
                                w, pieces_set, unk)])
            yield pd.DataFrame({"id": pdf["id"], "pieces": pieces,
                                "n_pieces": pieces.map(len)})

    return (base.mapInPandas(
        run, f"id {id_type}, pieces array<string>, n_pieces long")
        .withColumnRenamed("id", id_col))


# ----------------------------------------- tokenizer comparison

def tokenizer_stats(df: DataFrame, vocab_size: int = 8000,
                    vocab_cap: int = 50000, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Side-by-side evaluation of the three trainable tokenizers
    (BPE / unigram-LM / WordPiece) on THIS corpus — the numbers that
    actually pick a tokenizer for a training run:

    - ``fertility``        — pieces per whitespace word (lower =
      cheaper sequences; 1.0 means every word stayed whole);
    - ``chars_per_piece``  — compression (higher = denser pieces);
    - ``vocab_rows``       — the learned artifact's size (merge
      table / piece vocab);
    - ``n_unk_pieces``     — WordPiece only: words abandoned to
      [UNK] (BPE/unigram always segment, so theirs is 0).

    Each tokenizer is trained at comparable size (``vocab_size``
    merges for BPE, ``vocab_size`` pieces for the others) over the
    shared bounded word-count table, then the corpus is encoded once
    per tokenizer (three Arrow passes — this is an EVALUATION verb,
    priced accordingly). Word/char totals come from one JVM
    aggregate; every tokenizer sees the same lowercased whitespace
    words. Returns one row per tokenizer."""
    from .text import tokens as _toks
    # filter, not array_compact: split(\s+) yields EMPTY STRINGS at
    # padding whitespace (array_compact removes only nulls), and
    # every encoder drops empty words — counting them here would
    # understate fertility on padded corpora (review r11)
    base = df.agg(
        F.sum(F.size(F.filter(
            _toks(F.lower(F.col(text_col))),
            lambda t: t != ""))).alias("words"),
        F.sum(F.length(F.regexp_replace(
            F.lower(F.col(text_col)), r"\s+", ""))).alias("chars")
    ).collect()[0]
    words, chars = int(base["words"] or 0), int(base["chars"] or 0)

    def stat(name, vocab_rows, pieces, unk):
        return (name, vocab_rows, pieces,
                round(pieces / words, 4) if words else None,
                round(chars / pieces, 4) if pieces else None,
                unk)

    rows = []
    merges = train_bpe_merges(df, num_merges=vocab_size,
                              vocab_cap=vocab_cap,
                              text_col=text_col, id_col=id_col)
    n_bpe = int(bpe_encode(df, merges, text_col, id_col)
                .agg(F.sum("n_bpe_tokens")).collect()[0][0] or 0)
    rows.append(stat("bpe", merges.count(), n_bpe, 0))

    uvocab = train_unigram(df, vocab_size=vocab_size,
                           vocab_cap=vocab_cap, text_col=text_col,
                           id_col=id_col)
    n_uni = int(unigram_encode(df, uvocab, text_col=text_col,
                               id_col=id_col)
                .agg(F.sum("n_pieces")).collect()[0][0] or 0)
    rows.append(stat("unigram", uvocab.count(), n_uni, 0))

    wvocab = train_wordpiece(df, vocab_size=vocab_size,
                             vocab_cap=vocab_cap, text_col=text_col,
                             id_col=id_col)
    wenc = wordpiece_encode(df, wvocab, text_col=text_col,
                            id_col=id_col)
    wrow = wenc.agg(
        F.sum("n_pieces").alias("p"),
        F.sum(F.size(F.filter(
            "pieces", lambda p: p == "[UNK]"))).alias("u")
    ).collect()[0]
    rows.append(stat("wordpiece", wvocab.count(),
                     int(wrow["p"] or 0), int(wrow["u"] or 0)))

    return df.sparkSession.createDataFrame(
        rows, "tokenizer string, vocab_rows long, "
              "total_pieces long, fertility double, "
              "chars_per_piece double, n_unk_pieces long")
