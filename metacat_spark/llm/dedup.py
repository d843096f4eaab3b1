"""Deduplication operators for training-data pipelines.

Five strategies, scale-ranked:

- exact:          md5 hash-groupBy. One shuffle on the hash.
- ngram_jaccard:  exact word-shingle Jaccard via a shingle-join
                  (the classic inverted-index pair join).
- minhash_lsh:    MinHash signatures + banded LSH bucketing; candidate
                  pairs verified with exact Jaccard. The scale path —
                  candidate generation touches only colliding bands.
- simhash:        64-bit sign-sum fingerprint + banded Hamming join.
- embedding near-dup: see similarity.cosine_pairs.

All hashing is portable integer arithmetic (poly_hash) so the DuckDB
oracle can reproduce exact variants; LSH/simhash outputs are verified
by exact recomputation in tests instead (candidate sets are
engine-specific by nature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import POLY_MOD, tokens
from .util import spread as _spread


def _lcg_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs from a tiny LCG — literals in the
    plan, reproducible anywhere."""
    out = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (POLY_MOD - 2) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % POLY_MOD
        out.append((a, b))
    return out


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (canonical_id, n_copies),
    canonical = min id. Survivor selection for exact dedup."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count("*").alias("n_copies")))


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """The deduplicated survivors (one row per distinct content)."""
    keep = (exact_duplicates(df, text_col, id_col)
            .select(F.col("canonical_id").alias(id_col)))
    return df.join(keep, id_col, "left_semi")


def dedup_exact_stream(spark, src_dir: str, text_col: str = "text",
                       table: str = "dedup_stream") -> DataFrame:
    """Streaming-ingest exact dedup: dropDuplicates on the content
    hash over a document stream — the entry stage of a CONTINUOUS
    curation pipeline (state = one md5 per distinct content; bound it
    with a watermark on an arrival-time column in a real deployment).
    availableNow → memory sink; returns the deduplicated table."""

    from .util import stream_parquet

    stream = stream_parquet(spark, src_dir)
    out = (stream
           .withColumn("__h", F.md5(F.col(text_col)))
           .dropDuplicates(["__h"])
           .drop("__h"))
    q = (out.writeStream.format("memory").queryName(table)
         .outputMode("append").trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(
            "dedup_exact_stream did not finish within 120s — refusing "
            "to return a partially populated memory table")
    return spark.table(table)


def shingles(col, n: int = 3):
    """Distinct word n-gram shingles of a text column (array column).
    NOTE: higher-order functions run interpreted (~20ms/doc measured);
    use shingle_rows() in hot paths — this array form is kept for
    small-data composition."""
    toks = tokens(col)
    return F.array_distinct(F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    ).otherwise(F.array(F.concat_ws(" ", toks))))


def shingle_rows(df: DataFrame, n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id",
                 carry: list[str] | None = None,
                 distinct: bool = True) -> DataFrame:
    """DISTINCT (id, shingle) rows built relationally: explode one
    row per n-gram START position and assemble the n-gram by direct
    token-array indexing — every expression stays in whole-stage
    codegen (the array/lambda formulation runs interpreted and is
    ~20× slower) and the whole assembly is SHUFFLE-FREE (the
    previous posexplode+lead formulation shuffled every token row
    into a per-document sort window).

    Documents shorter than n tokens contribute their whole text as a
    single shingle (concat_ws skips the nulls past the array end).

    Tokenizer edge (documented, oracle-mirrored): Spark's split (like
    DuckDB's string_split_regex) returns [''] for an empty string, so
    an empty/whitespace-only document contributes ONE empty-string
    shingle — a corpus with many empty docs clusters them together at
    jaccard 1.0 (arguably correct: they ARE identical). Production
    pipelines gate on min_tokens before dedup (curate*), so empty
    docs never reach the pair joins; changing tokens() itself would
    have to move in lockstep with every oracle replay.

    ``carry`` names extra per-document columns (constant per document,
    e.g. a corpus tag) to thread through to the output — cheaper than a
    post-hoc join back onto the exploded rows.  ``distinct=False``
    keeps one row per n-gram OCCURRENCE (repetition statistics need
    multiplicity; set semantics are the dedup default)."""
    extra = [F.col(c) for c in (carry or [])]
    base = (_spread(df)
            .select(F.col(id_col).alias("id"), *extra,
                    tokens(F.col(text_col)).alias("__toks"))
            .where(F.size("__toks") > 0))
    # one explode per START position, n-gram assembled by direct
    # array indexing (F.get: codegen, null past the end — concat_ws
    # skips nulls, so a document shorter than n tokens contributes
    # its whole text as the single pos-0 "shingle"). Everything stays
    # in ONE whole-stage-codegen pass with NO shuffle — r6 rewrite of
    # the posexplode+lead window, which shuffled every token row to
    # sort it (the n-gram window was the dominant cost of every
    # shingle consumer: q8 minhash, jaccard, containment, spans).
    ex = base.select(
        "id", *extra, "__toks",
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.size("__toks") - n, F.lit(0))))
        .alias("pos"))
    parts = [F.get("__toks", F.col("pos") + i) for i in range(n)]
    out = ex.select("id", F.concat_ws(" ", *parts).alias("shingle"),
                    *(carry or []))
    return out.distinct() if distinct else out


def _drop_hot_shingles(ex: DataFrame, max_df: int,
                       key: str = "shingle") -> DataFrame:
    """Apply the ``max_df`` stop-shingle cap WITHOUT concentrating a
    hot shingle's rows on one task: document frequency comes from a
    groupBy(key).count() — map-side partial aggregation, so a
    10⁹-occurrence stop-shingle ("of the and") reduces to per-task
    partial counts instead of routing every occurrence row to a
    single window partition before it can be dropped (VERDICT r5).
    The surviving hot-shingle list is tiny (shingles with df >
    max_df), so it broadcasts; the anti-join then prunes occurrence
    rows wherever they already sit — no pre-filter shuffle at all.
    ``key`` is the shingle-identity column — the raw string or its
    64-bit hash (hashed_shingle_rows), whichever the caller joins on."""
    hot = (ex.groupBy(key).agg(F.count("*").alias("df"))
           .where(F.col("df") > max_df).select(key))
    return ex.join(F.broadcast(hot), key, "left_anti")


def hashed_shingle_rows(df: DataFrame, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        carry: list[str] | None = None,
                        partition_by_id: bool = False) -> DataFrame:
    """DISTINCT (id, h64[, carry]) rows with the shingle identity
    reduced to ``xxhash64(shingle)`` BEFORE the distinct shuffle —
    every downstream payload (the distinct, the inverted-index
    self-join, checkpoints) carries an 8-byte long instead of the
    n-gram text, which is what dominates those shuffles at corpus
    scale.  Set arithmetic over the hashed space equals the
    string-space result unless two DISTINCT shingles of the same doc
    (set size) or of one candidate pair (intersection) collide in
    2^64: expected colliding pairs corpus-wide are ~S²/2^65 (~1e-9 at
    a billion distinct shingles), and only same-doc/same-pair
    collisions are visible at all.

    ``partition_by_id=True`` (r16, guide §2.4): hash-partition by id
    BEFORE the distinct, so the distinct AND any downstream
    per-document aggregation (the minhash signature groupBy(id))
    share ONE exchange — HashPartitioning(id) satisfies the
    clustered distribution of both, and Catalyst stacks the two
    aggregates into one stage (verified in plan: 4 HashAggregates,
    zero exchanges between). The trade is losing map-side partial
    dedup before that exchange: within-document repeated shingles
    ride the wire (measured +3.6% rows at sf0.1 — bounded by the
    corpus's intra-document n-gram repetition rate), vs deleting a
    full corpus-wide shuffle of the distinct shingle set. Only the
    exchange layout changes — the output rows are identical
    (distinct is distinct)."""
    ex = shingle_rows(df, n, text_col, id_col, carry=carry,
                      distinct=False)
    h = ex.select("id", F.xxhash64("shingle").alias("h64"),
                  *(carry or []))
    if partition_by_id:
        return h.repartition("id").distinct()
    return h.distinct()


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        max_df: int | None = 1000) -> DataFrame:
    """N-gram Jaccard similar pairs (a < b, jaccard >= threshold)
    via the inverted-index shingle join: explode distinct shingles,
    self-join on shingle, count intersections, compute |A∪B| from
    per-doc shingle counts. Shuffles on shingle then on the pair key.

    ``max_df`` is the stop-shingle cap: the self-join emits
    df·(df-1)/2 pairs for a shingle appearing in df documents — ALL
    routed to one join partition — so one stop-shingle ("of the and")
    makes a single straggler task quadratic at scale. Shingles with
    document frequency > max_df are dropped from the shingle space
    (intersections AND union sizes, so jaccard stays well-defined on
    the reduced space — the standard trick; high-DF shingles carry no
    near-duplicate signal). ``max_df=None`` restores the exact
    full-space computation. The DF filter is a map-side-combinable
    groupBy(shingle).count() + broadcast anti-join of the tiny
    hot-shingle list — no per-shingle row concentration (see
    _drop_hot_shingles).  All internal payloads are hashed-shingle
    longs (hashed_shingle_rows — collision bound documented there)."""
    ex = hashed_shingle_rows(df, n, text_col, id_col)
    if max_df is not None:
        ex = _drop_hot_shingles(ex, max_df, key="h64")
    sizes = ex.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (a.join(b, (F.col("a.h64") == F.col("b.h64"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col("id").alias("id_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"),
                      F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_inter")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_signatures(df: DataFrame, n: int = 3, k: int = 32,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       include_shingles: bool = False) -> DataFrame:
    """k-wide MinHash signature per doc via explode + ONE groupBy with
    k min-aggregates. Shingle hashing uses xxhash64 (whole-stage
    codegen; higher-order char-level hashing runs interpreted and
    measured ~50µs/row — unusable in the hot path). The k universal
    hashes are codegen'd arithmetic over that one hash; map-side
    partial aggregation keeps the shuffle at one row per doc of k
    longs.  ``include_shingles=True`` additionally collects the
    distinct shingle set per doc (an ``sh`` column) — diagnostics
    only: it drags the corpus text through the shuffle, which is why
    it is OFF by default and minhash_lsh_pairs never uses it
    (review r6)."""
    ex = (shingle_rows(df, n, text_col, id_col)
          .withColumn("h", F.pmod(F.xxhash64("shingle"),
                                  F.lit(POLY_MOD))))
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % POLY_MOD)
            .alias(f"mh_{i}")
            for i, (a, b) in enumerate(_lcg_params(k))]
    if include_shingles:
        aggs = [F.collect_set("shingle").alias("sh")] + aggs
    return ex.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, n: int = 3, k: int = 32,
                      bands: int = 8, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified with exact
    Jaccard over the shingle sets. k/bands rows per band; a pair is a
    candidate iff some band signature collides; candidates are then
    exactly verified, so precision is 1.0 and only recall depends on
    the banding. Shuffle cost is O(docs × bands), never O(docs²).

    The verification identity is the 64-bit ``xxhash64(shingle)``,
    not the shingle string (r7): the distinct shuffle, the
    localCheckpoint, and both verify joins then carry one long per
    shingle instead of the n-gram text — the payload cut is what
    matters at 100 TB, where the shingle bytes dominate the shuffle.
    Jaccard over the hashed space equals Jaccard over the string
    space unless two DISTINCT shingles of the same doc (set size) or
    of a candidate pair (intersection) collide in 2^64 — expected
    colliding pairs ~S²/2^65 corpus-wide (~1e-9 at a billion distinct
    shingles), and only same-doc/same-pair collisions are visible at
    all. The 31-bit POLY_MOD reduction is applied AFTER, and only for
    the signature permutations (where min-collisions merely nudge
    recall, never correctness)."""
    if not 1 <= bands <= k or k % bands:
        # bands > k would make every band signature the EMPTY string
        # — the banded join degenerates to the full O(n²) cross join
        # the LSH exists to avoid; k % bands != 0 silently discards
        # trailing hashes (review r6)
        raise ValueError(f"bands must divide k: k={k}, bands={bands}")
    # materialize the distinct hashed-shingle rows once — referenced
    # by the signature build AND twice by the verification joins;
    # distinct runs on (id, h64) longs, not (id, shingle) strings.
    # partition_by_id (r16): the distinct and the signature
    # groupBy(id) below share ONE id-keyed exchange instead of
    # paying an (id,h64)-keyed distinct shuffle THEN an id-keyed agg
    # shuffle — measured −27% executor time on the pre-candidate
    # stages (50→44 tasks) at sf0.1, row-identical output, and the
    # win grows with corpus size (one less corpus-wide shuffle of
    # the shingle set)
    shr = (hashed_shingle_rows(df, n, text_col, id_col,
                               partition_by_id=True)
           .localCheckpoint(eager=False))
    ex0 = shr.withColumn("h", F.pmod(F.col("h64"), F.lit(POLY_MOD)))
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % POLY_MOD)
            .alias(f"mh_{i}")
            for i, (a, b) in enumerate(_lcg_params(k))]
    # shingle-set size rides the SAME groupBy as the signature mins
    # (shr is distinct by (id, shingle)) — no separate sizes shuffle;
    # checkpoint so the band explode AND the size lookups read the one
    # materialization (1 narrow row per doc) instead of re-aggregating
    sig = (ex0.groupBy("id").agg(F.count("*").alias("n_sh"), *aggs)
           .localCheckpoint(eager=False))
    return _lsh_candidate_verify(shr, sig, k, bands, threshold)


def _lsh_candidate_verify(shr: DataFrame, sig: DataFrame, k: int,
                          bands: int, threshold: float) -> DataFrame:
    """Banded candidate generation + exact-Jaccard verification over
    a signature frame ``sig`` (id, n_sh, mh_0..mh_{k-1}) and the
    hashed-shingle rows ``shr`` (id, h64) it was built from — the
    shared tail of every signature-construction variant
    (tools/ab_q8_sigagg.py measures the variants against this SAME
    tail so only the signature stage differs)."""
    rows = k // bands
    # band identity = ONE xxhash64 long over (band_index, its row
    # hashes) instead of a "_"-joined string (r8): the banded shuffle
    # carries 8 bytes per (doc, band) instead of ~40, and the
    # candidate join compares longs in codegen. A 2^-64 band-key
    # collision only ADDS a candidate, which exact verification
    # rejects — precision is unaffected by construction. Interleaved
    # A/B at sf0.1 measured flat (medians 2.27 vs 2.29 s — the banded
    # shuffle is tiny at this SF; tools/ab_q8_bandkey.py); adopted for
    # the scale shape, where band-key bytes × docs dominate the
    # candidate-generation shuffle.
    band_keys = [F.xxhash64(F.lit(bi),
                            *[F.col(f"mh_{bi * rows + r}")
                              for r in range(rows)])
                 for bi in range(bands)]
    # candidate generation joins (id, bandkey) ONLY — dragging the
    # shingle arrays through the banded shuffle multiplies its payload
    # by bands × shingle bytes
    exploded = sig.select(
        "id", F.explode(F.array(*band_keys)).alias("bk"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    # exact verification via candidate-restricted hashed-shingle
    # joins — long equality in codegen; per-pair array_intersect over
    # string arrays was the dominant cost at high candidate counts
    sizes = sig.select("id", "n_sh")
    inter = (cand
             .join(shr.select(F.col("id").alias("id_a"), "h64"),
                   "id_a")
             .join(shr.select(F.col("id").alias("id_b"), "h64"),
                   ["id_b", "h64"])
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_inter")))
    out = (inter
           .join(sizes.select(F.col("id").alias("id_a"),
                              F.col("n_sh").alias("n_a")), "id_a")
           .join(sizes.select(F.col("id").alias("id_b"),
                              F.col("n_sh").alias("n_b")), "id_b")
           .withColumn("jaccard",
                       F.round(F.col("n_inter")
                               / (F.col("n_a") + F.col("n_b")
                                  - F.col("n_inter")), 6))
           .where(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return out


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash: per-token portable hash, then per-bit sign sums.
    Implemented as one explode + one groupBy with `bits` conditional
    sums (map-side partial aggregation keeps the shuffle tiny)."""
    tok = (_spread(df).select(F.col(id_col).alias("id"),
                              F.explode(tokens(F.col(text_col)))
                              .alias("tok")))
    # xxhash64: 64-bit, codegen'd (vs interpreted HOF char hashing)
    tok = tok.withColumn("h", F.xxhash64(F.col("tok")))
    aggs = [F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1,
                         1).otherwise(-1)).alias(f"b{b}")
            for b in range(bits)]
    per_doc = tok.groupBy("id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        sim = sim.bitwiseOR(F.shiftleft(bit, b))
    return per_doc.select("id", sim.alias("simhash"))


def hamming_pairs(sig: DataFrame, sig_col: str = "simhash",
                  id_col: str = "id",
                  max_hamming: int = 3) -> DataFrame:
    """Pairs of 64-bit signatures within Hamming distance via
    pigeonhole band blocking: the 64 bits split into
    ``max_hamming + 1`` chunks, so any pair with distance ≤
    max_hamming agrees on at least one whole chunk; join per chunk,
    then verify with bit_count(xor).  Band count DERIVES from
    max_hamming (ADVICE r5: a fixed 4-band split only guarantees
    recall for distance ≤ 3 — larger thresholds silently missed
    pairs).  Shared by text SimHash and image/audio perceptual-hash
    dedup — any 64-bit fingerprint column rides the same banded
    join.  More bands = narrower chunks = more candidate
    collisions, the standard recall/cost trade."""
    bands = max_hamming + 1
    if not 1 <= bands <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got "
                         f"{max_hamming}")
    sh = sig.select(F.col(id_col).alias("id"),
                    F.col(sig_col).alias("__sig"))
    base, rem = divmod(64, bands)
    chunks, off = [], 0
    for i in range(bands):
        width = base + (1 if i < rem else 0)
        # mask after the shift: arithmetic shiftright sign-extends
        # the top chunk of a negative long, the AND strips it.
        # Represent the mask as a SIGNED 64-bit literal (a width-64
        # mask is -1) — Java longs reject the unsigned form.
        mask = (1 << width) - 1
        if mask >= 1 << 63:
            mask -= 1 << 64
        chunks.append(F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("__sig"), off)
            .bitwiseAND(mask).alias("chunk")))
        off += width
    ex = (sh.select("id", "__sig",
                    F.explode(F.array(*chunks)).alias("c"))
          .select("id", "__sig", "c.band", "c.chunk"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("a.__sig").alias("sh_a"),
                    F.col("b.__sig").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", dist)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def simhash_pairs(df: DataFrame, max_hamming: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Text near-dup pairs by SimHash + the banded Hamming join."""
    return hamming_pairs(simhash(df, text_col, id_col),
                         sig_col="simhash", id_col="id",
                         max_hamming=max_hamming)


def connected_components(edges: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b",
                         max_rounds: int = 30) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    component = the minimum node id in its connected component.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round is two
    groupBy-min + join passes over the edge set, and the edge set
    contracts toward star graphs rooted at component minima in
    O(log n) rounds — unlike naive min-label propagation, whose round
    count is the graph DIAMETER (a 1M-doc duplicate chain would need
    1M rounds; here ~20). Per round the edge set is localCheckpointed:
    iterative plans otherwise stack lineage and re-execute the whole
    history each round.

    The 100TB shape: every pass shuffles (node → neighbors) once; edge
    volume only shrinks (stars replace paths), and skew on a huge
    component concentrates at its root only at the FINAL rounds, when
    that component is already star-shaped — one wide groupBy row, not
    a quadratic join.
    """
    e = (edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
         .where(F.col("u") != F.col("v")))
    prev = (-1, -1)
    for _ in range(max_rounds):
        # large-star: connect every neighbor v > u to
        # m(u) = min(N(u) ∪ {u})  (computed over symmetric edges)
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least(F.col("u"), F.col("mv"))
        e = (sym.join(mins, "u")
             .where(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), m.alias("v"))
             .where(F.col("u") != F.col("v"))
             .distinct())
        # small-star: orient (u ≥ v); connect every smaller neighbor
        # (and u itself) to m(u) = min of the smaller neighbors
        o = e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
        mins = o.groupBy("u").agg(F.min("v").alias("mv"))
        joined = o.join(mins, "u")
        e = (joined.where(F.col("v") != F.col("mv"))
             .select(F.col("v").alias("u"), F.col("mv").alias("v"))
             .union(mins.select("u", F.col("mv").alias("v")))
             .distinct()
             .localCheckpoint())
        # converged when the edge set is stable: count + an
        # order-independent checksum, one job (a fixpoint re-check
        # costs one harmless extra round on a checksum collision)
        state = (e.agg(F.count("*"),
                       F.bit_xor(F.xxhash64("u", "v"))).first())
        state = (state[0], state[1])
        if state == prev:
            break
        prev = state
    # fixpoint = disjoint stars (child → root); roots map to themselves
    return (e.select(F.col("u").alias("id"), F.col("v").alias("component"))
            .union(e.select(F.col("v").alias("id"),
                            F.col("v").alias("component")))
            .distinct())


def near_dup_clusters(documents: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id",
                      a_col: str = "id_a",
                      b_col: str = "id_b") -> DataFrame:
    """Cluster assignment for EVERY document given near-duplicate
    pairs: (doc_id, cluster_id, is_canonical). cluster_id = min doc id
    of the connected component (docs in no pair are their own
    singleton cluster); canonical = the surviving representative.
    This is the step a curation pipeline actually needs after any
    pair-generating strategy (ngram/minhash/simhash/embedding):
    pairs → groups → one survivor per group."""
    cc = connected_components(pairs, a_col, b_col)
    return (documents.select(F.col(id_col).alias("doc_id"))
            .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", "doc_id").alias("cluster_id"))
            .withColumn("is_canonical",
                        F.col("doc_id") == F.col("cluster_id")))


# ---------------------------------------------------------------------------
# Cross-corpus contamination (train/test overlap)
#
# The question a training-data pipeline must answer before every eval:
# which benchmark/test documents also appear (exactly or nearly) in the
# training corpus?  Same machinery as within-corpus dedup, but the pair
# space is restricted to CROSS pairs at candidate generation — a naive
# "dedup the union, filter after" wastes the dominant cost (within-train
# pairs) at 100 TB.  Ids need NOT be unique across the two corpora: every
# internal groupBy/join is keyed on (grp, id), so a test doc and a train
# doc sharing the same id value never merge state.
# ---------------------------------------------------------------------------


def cross_corpus_exact(test_df: DataFrame, train_df: DataFrame,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exactly-contaminated test documents: (test_id, train_id) where
    the texts are byte-identical; train_id = smallest matching training
    doc.  The training side is pre-aggregated to one row per distinct
    content hash, so the join input is |distinct train content|, not
    |train| — one shuffle on the hash per side, broadcastable when the
    test corpus is an eval set (thousands of rows vs 100 TB train)."""
    th = (train_df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
          .agg(F.min(id_col).alias("train_id")))
    te = test_df.select(F.col(id_col).alias("test_id"),
                       F.md5(F.col(text_col)).alias("content_hash"))
    return te.join(th, "content_hash").select("test_id", "train_id")


def _tag_union(test_df: DataFrame, train_df: DataFrame,
               text_col: str, id_col: str) -> DataFrame:
    cols = [F.col(id_col).alias("id"), F.col(text_col).alias("txt")]
    return (test_df.select(*cols).withColumn("grp", F.lit(0))
            .unionByName(train_df.select(*cols)
                         .withColumn("grp", F.lit(1))))


def cross_corpus_jaccard(test_df: DataFrame, train_df: DataFrame,
                         n: int = 3, threshold: float = 0.5,
                         text_col: str = "text", id_col: str = "doc_id",
                         max_df: int | None = 1000) -> DataFrame:
    """Exact n-gram-Jaccard contamination pairs (test_id, train_id,
    jaccard >= threshold) via the inverted-index shingle join with the
    corpus tag threaded through shingle_rows(carry=...), so the join
    condition a.grp=0 & b.grp=1 prunes within-corpus pairs BEFORE the
    pair shuffle.  The ``max_df`` stop-shingle cap applies over the
    UNION shingle space (both intersections and sizes — jaccard stays
    well-defined on the reduced space), same contract as
    ngram_jaccard_pairs.  Internal payloads are hashed-shingle longs
    (hashed_shingle_rows — collision bound documented there)."""
    u = _tag_union(test_df, train_df, text_col, id_col)
    ex = hashed_shingle_rows(u, n, "txt", "id", carry=["grp"])
    if max_df is not None:
        ex = _drop_hot_shingles(ex, max_df, key="h64")
    # (grp, id) key: a test doc and a train doc sharing an id value must
    # not merge their shingle-set sizes (ADVICE r4)
    sizes = ex.groupBy("grp", "id").agg(F.count("*").alias("n_sh"))
    a = ex.where(F.col("grp") == 0).alias("a")
    b = ex.where(F.col("grp") == 1).alias("b")
    inter = (a.join(b, F.col("a.h64") == F.col("b.h64"))
             .groupBy(F.col("a.id").alias("test_id"),
                      F.col("b.id").alias("train_id"))
             .agg(F.count("*").alias("n_inter")))
    sa = (sizes.where(F.col("grp") == 0)
          .select(F.col("id").alias("test_id"),
                  F.col("n_sh").alias("n_a")))
    sb = (sizes.where(F.col("grp") == 1)
          .select(F.col("id").alias("train_id"),
                  F.col("n_sh").alias("n_b")))
    return (inter.join(sa, "test_id").join(sb, "train_id")
            .withColumn("jaccard",
                        F.round(F.col("n_inter")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("test_id", "train_id", "jaccard"))


def cross_corpus_lsh(test_df: DataFrame, train_df: DataFrame,
                     n: int = 3, k: int = 32, bands: int = 8,
                     threshold: float = 0.5, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Banded-MinHash contamination (the 100-TB path): candidate pairs
    come from band-signature collisions restricted to test×train at
    the banded join itself, then exact-Jaccard verified — precision
    1.0, recall set by the banding, candidate shuffle O(docs × bands).
    Returns (test_id, train_id, jaccard >= threshold)."""
    if not 1 <= bands <= k or k % bands:
        raise ValueError(f"bands must divide k: k={k}, bands={bands}")
    rows = k // bands
    u = _tag_union(test_df, train_df, text_col, id_col)
    # hashed-shingle identity: checkpoint and verify joins carry longs,
    # not n-gram text (see hashed_shingle_rows for the collision bound)
    shr = (hashed_shingle_rows(u, n, "txt", "id", carry=["grp"])
           .localCheckpoint(eager=False))
    ex0 = shr.withColumn("h", F.pmod(F.col("h64"), F.lit(POLY_MOD)))
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % POLY_MOD)
            .alias(f"mh_{i}")
            for i, (a, b) in enumerate(_lcg_params(k))]
    # (grp, id) key: id values may collide across corpora — grouping on
    # the pair keeps each side's signature/set-size separate (ADVICE r4)
    sig = (ex0.groupBy("grp", "id").agg(F.count("*").alias("n_sh"), *aggs)
           .localCheckpoint(eager=False))
    # hashed band key, same rationale + collision argument as
    # minhash_lsh_pairs (r8): 8-byte band identity in the candidate
    # shuffle; a band-key collision only adds a candidate that exact
    # verification rejects
    band_keys = [F.xxhash64(F.lit(bi),
                            *[F.col(f"mh_{bi * rows + r}")
                              for r in range(rows)])
                 for bi in range(bands)]
    exploded = sig.select(
        "id", "grp", F.explode(F.array(*band_keys)).alias("bk"))
    a = exploded.where(F.col("grp") == 0).alias("a")
    b = exploded.where(F.col("grp") == 1).alias("b")
    cand = (a.join(b, F.col("a.bk") == F.col("b.bk"))
            .select(F.col("a.id").alias("test_id"),
                    F.col("b.id").alias("train_id"))
            .dropDuplicates(["test_id", "train_id"]))
    # verification joins filter shr by grp first, so a colliding train id
    # never contributes shingles to the test side (and vice versa)
    shr_a = (shr.where(F.col("grp") == 0)
             .select(F.col("id").alias("test_id"), "h64"))
    shr_b = (shr.where(F.col("grp") == 1)
             .select(F.col("id").alias("train_id"), "h64"))
    inter = (cand
             .join(shr_a, "test_id")
             .join(shr_b, ["train_id", "h64"])
             .groupBy("test_id", "train_id")
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sig.where(F.col("grp") == 0)
                  .select(F.col("id").alias("test_id"),
                          F.col("n_sh").alias("n_a")), "test_id")
            .join(sig.where(F.col("grp") == 1)
                  .select(F.col("id").alias("train_id"),
                          F.col("n_sh").alias("n_b")), "train_id")
            .withColumn("jaccard",
                        F.round(F.col("n_inter")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("test_id", "train_id", "jaccard"))


def cross_corpus_containment(test_df: DataFrame, train_df: DataFrame,
                             n: int = 8, threshold: float = 0.8,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             max_df: int | None = 1000) -> DataFrame:
    """N-gram-overlap contamination by CONTAINMENT,
    |shingles(test) ∩ shingles(train)| / |shingles(test)| — the right
    statistic when an eval document is embedded verbatim inside a much
    larger training document: Jaccard divides by the union and dilutes
    toward 0 as the train doc grows, containment stays 1.0.  This is
    the shape published eval-decontamination recipes use (n-gram
    collision / containment at n≈8-13 rather than symmetric Jaccard).

    Same inverted-index shingle join as cross_corpus_jaccard (corpus
    tag threaded through candidate generation, every internal key
    (grp, id)); only the TEST-side shingle count enters the
    denominator.  ``max_df`` caps shingle document-frequency over the
    union space — both the intersection and the test sizes see the
    same reduced space, so containment stays well-defined (and the cap
    kills the quadratic stop-shingle straggler at scale).

    Returns (test_id, train_id, n_inter, containment >= threshold).
    Internal payloads are hashed-shingle longs (hashed_shingle_rows —
    collision bound documented there)."""
    u = _tag_union(test_df, train_df, text_col, id_col)
    ex = hashed_shingle_rows(u, n, "txt", "id", carry=["grp"])
    if max_df is not None:
        ex = _drop_hot_shingles(ex, max_df, key="h64")
    sizes = ex.groupBy("grp", "id").agg(F.count("*").alias("n_sh"))
    a = ex.where(F.col("grp") == 0).alias("a")
    b = ex.where(F.col("grp") == 1).alias("b")
    inter = (a.join(b, F.col("a.h64") == F.col("b.h64"))
             .groupBy(F.col("a.id").alias("test_id"),
                      F.col("b.id").alias("train_id"))
             .agg(F.count("*").alias("n_inter")))
    sa = (sizes.where(F.col("grp") == 0)
          .select(F.col("id").alias("test_id"),
                  F.col("n_sh").alias("n_a")))
    return (inter.join(sa, "test_id")
            .withColumn("containment",
                        F.round(F.col("n_inter") / F.col("n_a"), 6))
            .where(F.col("containment") >= threshold)
            .select("test_id", "train_id", "n_inter", "containment"))


def ngram_novelty(df: DataFrame, reference: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  ref_text_col: str | None = None,
                  ref_id_col: str | None = None) -> DataFrame:
    """Per-document n-gram novelty vs a reference corpus — the
    memorization-risk / train-overlap gauge of published dedup
    recipes (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", measures verbatim-memorization risk by
    exactly this statistic at n≈13; eval decontamination reads its
    complement): for each document, the fraction of its DISTINCT
    word n-grams that appear ANYWHERE in the reference.

    Differs from ``cross_corpus_containment`` structurally, not just
    in units: containment explodes (test, train) PAIRS — the right
    shape for "which train doc contaminated this eval item" — while
    novelty collapses the reference to ONE distinct hashed-shingle
    set and semi-joins each doc's shingles against it. No pair
    space, no max_df cap (novelty wants hot n-grams counted — a doc
    made of boilerplate IS low-novelty): one linear equi-join on
    8-byte xxhash64 longs (collision bound documented on
    ``hashed_shingle_rows``), two per-doc bounded aggregates.
    Measuring a corpus against itself reads overlap 1.0 everywhere
    by construction — the reference should be the OTHER corpus
    (train set for eval novelty, an earlier crawl for dated
    novelty).

    Docs shorter than n tokens contribute their whole text as one
    shingle (the shingle_rows contract), so the rate stays defined.
    Returns (id_col, n_grams, n_seen, overlap_rate, novelty_rate),
    one row per input document."""
    ref_sh = (hashed_shingle_rows(reference, n,
                                  ref_text_col or text_col,
                                  ref_id_col or id_col)
              .select("h64").distinct())
    return _novelty_against(df, ref_sh, n, text_col, id_col)


def _novelty_against(df: DataFrame, ref_sh: DataFrame, n: int,
                     text_col: str, id_col: str) -> DataFrame:
    """ngram_novelty's scoring half against a PREBUILT distinct
    reference shingle set — shared with ``novelty_stream``, where
    the reference is materialized once and every micro-batch scores
    against it."""
    doc_sh = hashed_shingle_rows(df, n, text_col, id_col)
    seen = (doc_sh.join(ref_sh, "h64", "left_semi")
            .groupBy("id").agg(F.count("*").alias("n_seen")))
    totals = doc_sh.groupBy("id").agg(F.count("*").alias("n_grams"))
    return (totals.join(seen, "id", "left")
            .select(F.col("id").alias(id_col), "n_grams",
                    F.coalesce("n_seen", F.lit(0)).alias("n_seen"))
            .select(id_col, "n_grams", "n_seen",
                    F.round(F.col("n_seen") / F.col("n_grams"), 6)
                    .alias("overlap_rate"),
                    F.round(1 - F.col("n_seen") / F.col("n_grams"),
                            6).alias("novelty_rate")))


def novelty_stream(spark, src_dir: str, reference: DataFrame,
                   n: int = 13, text_col: str = "text",
                   id_col: str = "doc_id",
                   sink_dir: str | None = None,
                   checkpoint_dir: str | None = None,
                   timeout_s: int | None = 120) -> DataFrame:
    """Streaming twin of ``ngram_novelty`` — the static-reference
    posture of ``bm25_stream``/``dsir_stream``: the reference's
    distinct shingle set is materialized ONCE (cached; at corpus
    scale, persist it and pass the stored table as ``reference``),
    then each micro-batch of documents scores against it with the
    SAME ``_novelty_against`` plan — per-doc novelty depends only on
    the doc and the static reference, so stream ≡ batch row-for-row
    (pinned by test).

    Deploy posture mirrors ``score_stream``: ``sink_dir`` parquet-
    appends per-doc rows (checkpointed, at-least-once) and returns
    the BOUNDED per-batch gauge (batch_id, n, avg_overlap,
    n_contaminated — docs with overlap > 0.5, the triage count);
    without it, availableNow with the per-doc rows accumulated
    driver-side — driver-resident exactly like the other twins'
    memory sinks, the TEST rig (foreachBatch owns the write here, a
    memory sink cannot take the per-batch join/agg plan)."""
    from .util import stream_parquet

    ref_sh = (hashed_shingle_rows(reference, n, text_col, id_col)
              .select("h64").distinct().cache())
    ref_sh.count()                         # materialize once
    stream = stream_parquet(spark, src_dir)
    gauge_rows: list = []
    mem_rows: list = []

    def per_batch(bdf, bid):
        res = _novelty_against(bdf, ref_sh, n, text_col, id_col)
        if sink_dir is None:
            mem_rows.extend(res.collect())
            return
        # persist: the scoring join would otherwise run twice per
        # batch (once for the sink write, once for the gauge)
        res.persist()
        try:
            res.write.mode("append").parquet(sink_dir)
            g = res.agg(
                F.count("*").alias("n"),
                F.round(F.avg("overlap_rate"), 6).alias("avg"),
                F.sum((F.col("overlap_rate") > 0.5).cast("long"))
                .alias("c")).collect()[0]
        finally:
            res.unpersist()
        gauge_rows.append((int(bid), int(g["n"]), g["avg"],
                           int(g["c"] or 0)))

    w = stream.writeStream.foreachBatch(per_batch)
    if sink_dir is not None:
        w = w.option("checkpointLocation",
                     checkpoint_dir or sink_dir + "__checkpoint")
    q = w.trigger(availableNow=True).start()
    try:
        if timeout_s is None:
            q.awaitTermination()
        elif not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"novelty_stream did not finish within {timeout_s}s "
                f"— the sink may be partially written; restart "
                f"resumes from the checkpoint")
    finally:
        ref_sh.unpersist()
    if sink_dir is not None:
        return spark.createDataFrame(
            gauge_rows,
            "batch_id long, n long, avg_overlap double, "
            "n_contaminated long")
    if mem_rows:
        return spark.createDataFrame(mem_rows)
    # empty-stream fallback: derive the id type from the SOURCE
    # stream's schema — the non-empty path infers it from collected
    # rows (e.g. long doc_ids), so a hardcoded string id here would
    # make the returned schema depend on whether the stream had rows
    # (ADVICE r14)
    id_ddl = stream.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        [], f"{id_col} {id_ddl}, n_grams long, n_seen long, "
            f"overlap_rate double, novelty_rate double")


def decontaminate(train_df: DataFrame, test_df: DataFrame,
                  method: str = "containment", text_col: str = "text",
                  id_col: str = "doc_id", **kw) -> DataFrame:
    """The cleaned training corpus: every training document flagged as
    contaminating ANY test document is dropped (left-anti on the
    pair list's train side).  ``method`` picks the pair generator —
    ``exact`` (byte-identical), ``jaccard`` (exact n-gram Jaccard),
    ``containment`` (n-gram overlap — the eval-decontamination
    default), ``lsh`` (banded MinHash), or ``novelty`` (r14, the
    PAIR-FREE 100-TB path: drop every training document whose own
    distinct n-grams overlap the test corpus AS A WHOLE past
    ``threshold`` — ``ngram_novelty`` with the test set as the
    reference, one linear semi-join instead of a test×train
    candidate space; directionally this removes train docs largely
    COMPOSED of eval material, where containment removes train docs
    that CONTAIN an eval doc — both published recipes, pick by
    which side's verbatim leakage you police); ``kw`` passes
    through (n=, threshold=, and for the pair methods max_df= —
    novelty has no max_df: it deliberately counts hot n-grams).
    One anti-join on id beyond the pair generation itself."""
    if method == "novelty":
        thr = kw.pop("threshold", 0.8)
        if "max_df" in kw:
            raise ValueError(
                "decontaminate(method='novelty') does not take "
                "max_df: novelty deliberately counts hot n-grams (a "
                "doc made of boilerplate IS low-novelty); drop the "
                "argument or use a pair method "
                "(containment/jaccard/lsh)")
        rates = ngram_novelty(train_df, test_df, text_col=text_col,
                              id_col=id_col, **kw)
        bad = (rates.where(F.col("overlap_rate") > thr)
               .select(id_col))
        return train_df.join(bad, id_col, "left_anti")
    fn = {"exact": cross_corpus_exact,
          "jaccard": cross_corpus_jaccard,
          "containment": cross_corpus_containment,
          "lsh": cross_corpus_lsh}[method]
    pairs = fn(test_df, train_df, text_col=text_col, id_col=id_col,
               **kw)
    bad = pairs.select(F.col("train_id").alias(id_col)).distinct()
    return train_df.join(bad, id_col, "left_anti")


def dedup_against(new_df: DataFrame, corpus_df: DataFrame,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Incremental-ingest dedup: the rows of ``new_df`` whose content
    does NOT already exist in ``corpus_df`` — the admission filter a
    continuously-growing corpus applies to every new batch.  One
    left-anti join on the content hash against the corpus's DISTINCT
    hash set (pre-aggregated, so the join input is |distinct corpus
    content|; broadcastable when the batch side drives the join at
    scale).  Within-batch duplicates are also collapsed (min-id
    survivor) so admitting the same batch twice is idempotent."""
    cur = corpus_df.select(F.md5(F.col(text_col)).alias("h")).distinct()
    fresh = (new_df.withColumn("h", F.md5(F.col(text_col)))
             .join(cur, "h", "left_anti"))
    keep = (fresh.groupBy("h").agg(F.min(id_col).alias(id_col))
            .select(id_col))
    return fresh.drop("h").join(keep, id_col, "left_semi")


def semantic_dedup(documents: DataFrame, embeddings: DataFrame,
                   threshold: float = 0.9,
                   id_col: str = "doc_id",
                   vec_id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication: documents whose
    EMBEDDINGS are near-identical (cosine >= threshold) collapse to
    one survivor per connected component — catches paraphrases and
    re-renderings that share no n-grams, the layer above lexical
    dedup in a curation stack.  Pairs come from the exact blocked
    GEMM (similarity.cosine_pairs — swap in lsh_bucketed pairs at
    100 TB); components via the large-star/small-star O(log n)
    rounds; survivor = min doc_id.  Returns the surviving document
    rows."""
    from .similarity import cosine_pairs
    pairs = cosine_pairs(embeddings, threshold=threshold,
                         vec_col=vec_col, id_col=vec_id_col)
    clusters = near_dup_clusters(
        documents.select(F.col(id_col)), pairs, id_col=id_col)
    keep = (clusters.where(F.col("is_canonical"))
            .select(F.col("doc_id").alias(id_col)))
    return documents.join(keep, id_col, "left_semi")


def ngram_containment_pairs(df: DataFrame, n: int = 8,
                            threshold: float = 0.8,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            max_df: int | None = 1000) -> DataFrame:
    """WITHIN-corpus containment pairs (id_a, id_b, n_inter,
    containment): documents whose n-gram set is mostly a subset of
    another document's — quoted/excerpted/boilerplate-wrapped copies
    that symmetric Jaccard misses when the host document is much
    larger.  containment = |A ∩ B| / |A| with A the SMALLER side's
    shingle set, so the pair is emitted once, oriented
    contained→container ((n_a, id_a) < (n_b, id_b) lexicographically);
    same inverted-index join + max_df stop-shingle cap as
    ngram_jaccard_pairs, over hashed-shingle longs
    (hashed_shingle_rows — collision bound documented there)."""
    ex = hashed_shingle_rows(df, n, text_col, id_col)
    if max_df is not None:
        ex = _drop_hot_shingles(ex, max_df, key="h64")
    sizes = ex.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (a.join(b, (F.col("a.h64") == F.col("b.h64"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_x"),
                      F.col("b.id").alias("id_y"))
             .agg(F.count("*").alias("n_inter")))
    sx = sizes.select(F.col("id").alias("id_x"),
                      F.col("n_sh").alias("n_x"))
    sy = sizes.select(F.col("id").alias("id_y"),
                      F.col("n_sh").alias("n_y"))
    j = inter.join(sx, "id_x").join(sy, "id_y")
    # orient: a = smaller shingle set (ties: smaller id)
    a_first = (F.col("n_x") < F.col("n_y")) | \
              ((F.col("n_x") == F.col("n_y"))
               & (F.col("id_x") < F.col("id_y")))
    return (j.select(
                F.when(a_first, F.col("id_x")).otherwise(F.col("id_y"))
                .alias("id_a"),
                F.when(a_first, F.col("id_y")).otherwise(F.col("id_x"))
                .alias("id_b"),
                "n_inter",
                F.round(F.col("n_inter")
                        / F.least("n_x", "n_y"), 6)
                .alias("containment"))
            .where(F.col("containment") >= threshold))


def _gram_occurrences(df: DataFrame, n: int, text_col: str,
                      id_col: str) -> DataFrame:
    """One row per n-gram OCCURRENCE with its token position:
    (id, pos, fin, gram) where [pos, fin) is the covered token range.
    Same shuffle-free sequence-explode + array-index assembly as
    shingle_rows (whole-stage codegen, no per-document sort window),
    but positions are kept — span dedup needs to know WHERE a
    duplicated gram sits, not just that it exists.  Documents
    shorter than n tokens contribute their whole text as one gram
    covering [0, n_tok)."""
    base = (_spread(df)
            .select(F.col(id_col).alias("id"),
                    tokens(F.col(text_col)).alias("__toks"))
            .where(F.size("__toks") > 0))
    ex = base.select(
        "id", "__toks", F.size("__toks").alias("n_tok"),
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.size("__toks") - n, F.lit(0))))
        .alias("pos"))
    parts = [F.get("__toks", F.col("pos") + i) for i in range(n)]
    return ex.select("id", "pos",
                     F.least(F.col("pos") + n,
                             F.col("n_tok")).alias("fin"),
                     F.concat_ws(" ", *parts).alias("gram"))


def _merge_islands(dup: DataFrame):
    """Gaps-and-islands merge of (id, pos, fin) half-open ranges into
    maximal per-id spans — the span-stitching tail shared by the
    token-gram and char-gram ExactSubstr variants. Returns
    (id, span_start, span_end)."""
    from pyspark.sql import Window
    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max("fin").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    marked = dup.withColumn(
        "new_span",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end),
               F.lit(1)).otherwise(F.lit(0)))
    return (marked.withColumn("gid", F.sum("new_span").over(w))
            .groupBy("id", "gid")
            .agg(F.min("pos").alias("span_start"),
                 F.max("fin").alias("span_end")))


def _char_gram_occurrences(df: DataFrame, k: int, text_col: str,
                           id_col: str) -> DataFrame:
    """One row per CHARACTER k-gram occurrence: (id, pos, fin, gram)
    with [pos, fin) a 0-based half-open char range — the char-
    granularity twin of _gram_occurrences. substring over a sequence
    explode, all whole-stage codegen; one row per character is the
    honest cost of finding duplicates at char resolution. Documents
    shorter than k chars contribute their whole text as one gram
    covering [0, len)."""
    base = (_spread(df)
            .select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("__t"))
            .where(F.col(text_col).isNotNull()
                   & (F.length(text_col) > 0))
            .withColumn("__len", F.length("__t")))
    ex = base.select(
        "id", "__t", "__len",
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.col("__len") - k, F.lit(0))))
        .alias("pos"))
    return ex.select(
        "id", "pos",
        F.least(F.col("pos") + k, F.col("__len")).alias("fin"),
        F.substring(F.col("__t"), F.col("pos") + 1, F.lit(k))
        .alias("gram"))


def duplicate_char_spans(df: DataFrame, k: int = 50,
                         min_count: int = 2, text_col: str = "text",
                         id_col: str = "doc_id",
                         hash_grams: bool = False) -> DataFrame:
    """Exact-substring duplicate spans at CHARACTER granularity —
    the resolution the published ExactSubstr recipe works at (Lee et
    al. 2022 flag duplicated substrings of >= 50 chars; their suffix
    array is a single-machine structure). The distributed relaxation
    is a char k-gram positional index with span stitching: every
    k-char substring occurring >= min_count times corpus-wide marks
    its char range, overlapping/adjacent ranges merge per document —
    finding the duplicated substrings of length >= k, at char
    precision, with no tokenizer in the loop (VERDICT r9 #3: the
    token-n-gram variant rounds span edges to token boundaries and
    misses intra-token duplication). One documented special case
    (test-pinned): a document SHORTER than k chars is indexed as one
    whole-text gram covering [0, len), so identical short documents
    are still flagged — with spans shorter than k. Pass a pre-filter
    (``df.where(length(text) >= k)``) for a strict >= k contract.

    Scale shape: identical to duplicate_spans — stride-1 k-gram rows
    (one per char — linear), groupBy(gram) count with map-side
    combine, left-semi back onto occurrences, islands window keyed
    by doc. The shuffled count key is k chars (~the same bytes as an
    8-token gram at k=50); ``hash_grams=True`` swaps it for
    xxhash64(gram) — an 8-byte key computed in the scan stage, so
    both the count exchange and the semi-join exchange narrow by
    ~6x at k=50 (documented trade: a 2^-64 hash collision could
    mark a unique span duplicated; span-for-span parity on real
    corpora is test-pinned, A/B numbers in SCALING.md).

    Returns (id_col, span_start, span_end, span_chars), half-open
    char offsets into text_col."""
    occ = _char_gram_occurrences(df, k, text_col, id_col)
    if hash_grams:
        occ = (occ.withColumn("gram", F.xxhash64("gram")))
    dup_grams = (occ.groupBy("gram").count()
                 .where(F.col("count") >= min_count).select("gram"))
    dup = (occ.join(dup_grams, "gram", "left_semi")
           .select("id", "pos", "fin"))
    return (_merge_islands(dup)
            .select(F.col("id").alias(id_col), "span_start",
                    "span_end",
                    (F.col("span_end") - F.col("span_start"))
                    .alias("span_chars")))


def duplicate_spans(df: DataFrame, n: int = 8, min_count: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Exact-substring duplicate spans at token-n-gram granularity
    (the distributed form of ExactSubstr dedup, Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"):
    every n-token gram occurring >= min_count times CORPUS-WIDE
    (across documents or repeated within one) marks its token range
    as duplicated; per document, overlapping/adjacent ranges merge
    into maximal spans via a gaps-and-islands window.

    The paper's suffix array is a single-machine structure; the
    n-gram index is the standard distributed relaxation — it finds
    exactly the duplicated substrings of length >= n, at the cost of
    missing shorter ones.

    Scale shape: duplicated grams come from a groupBy(gram) count
    (map-side partial combine, so a mega-frequent gram never
    concentrates rows on one task) followed by a left-semi join back
    onto the occurrence rows; the islands window partitions by doc.
    No pairwise joins anywhere — cost is linear in total tokens.

    Returns (id_col, span_start, span_end, span_tokens), spans
    half-open [span_start, span_end) in token positions."""
    occ = _gram_occurrences(df, n, text_col, id_col)
    dup_grams = (occ.groupBy("gram").count()
                 .where(F.col("count") >= min_count).select("gram"))
    dup = (occ.join(dup_grams, "gram", "left_semi")
           .select("id", "pos", "fin"))
    return (_merge_islands(dup)
            .select(F.col("id").alias(id_col), "span_start",
                    "span_end",
                    (F.col("span_end") - F.col("span_start"))
                    .alias("span_tokens")))


def scrub_duplicate_spans(df: DataFrame, n: int = 8,
                          min_count: int = 2,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Remove every duplicated span's tokens and rebuild the text —
    the ExactSubstr scrub (cut the repeated substring, keep the
    unique remainder; documents that are entirely duplicated come
    back with empty text rather than vanishing, so the caller decides
    whether to drop empties).

    Rebuild is relational: covered positions explode from the spans
    (span_tokens rows per span — linear), kept tokens are a left-anti
    join on (id, pos), and the text reassembles with
    array_sort(collect_list(struct(pos, w))) so the groupBy needs no
    ordering guarantee from the shuffle.

    Only documents that actually HAVE a duplicated span are rebuilt —
    untouched documents pass through with their ORIGINAL text
    (newlines, runs of spaces intact), not a single-space-rejoined
    rendering; corpus-wide whitespace normalization would destroy the
    line structure that line-oriented stages downstream
    (c4_line_filter, the Gopher bullet/ellipsis rules) depend on
    (ADVICE r5).  A rebuilt document's scrubbed text IS
    space-rejoined (token positions don't record the original
    separators — documented trade).  Documents entirely covered by
    spans come back with empty text rather than vanishing, so the
    caller decides whether to drop empties.

    Returns the input rows with text replaced by the scrubbed text
    plus n_tok_before / n_tok_after bookkeeping columns."""
    # the spans subtree (gram explode + groupBy + islands windows) is
    # referenced three times below (covered / touched semi-join /
    # touched outer join) — checkpoint it so it evaluates ONCE
    spans = duplicate_spans(df, n, min_count, text_col,
                            id_col).localCheckpoint(eager=False)
    touched = (spans.groupBy(F.col(id_col).alias("id"))
               .agg(F.lit(True).alias("_touched")))
    covered = spans.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.col("span_start"),
                             F.col("span_end") - 1)).alias("pos"))
    # rebuild ONLY the touched documents (semi-join before the
    # posexplode keeps untouched docs out of the rebuild entirely)
    tok = (_spread(df)
           .select(F.col(id_col).alias("id"),
                   F.posexplode(tokens(F.col(text_col)))
                   .alias("pos", "w"))
           .join(touched.select("id"), "id", "left_semi"))
    kept = tok.join(covered, ["id", "pos"], "left_anti")
    rebuilt = (kept.groupBy("id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "w"))),
                       lambda s: s["w"]), " ").alias("_scrubbed"),
                    F.count("*").alias("n_tok_after")))
    base = df.withColumn("n_tok_before",
                         F.size(tokens(F.col(text_col))))
    out = (base.join(rebuilt.withColumnRenamed("id", id_col),
                     id_col, "left")
           .join(touched.withColumnRenamed("id", id_col),
                 id_col, "left")
           # touched + no kept tokens = entirely duplicated → empty;
           # untouched → original text verbatim
           .withColumn(text_col,
                       F.when(F.col("_touched").isNotNull(),
                              F.coalesce(F.col("_scrubbed"),
                                         F.lit("")))
                       .otherwise(F.col(text_col)))
           .withColumn("n_tok_after",
                       F.when(F.col("_touched").isNotNull(),
                              F.coalesce(F.col("n_tok_after"),
                                         F.lit(0)))
                       .otherwise(F.col("n_tok_before")))
           .drop("_scrubbed", "_touched"))
    return out


def drop_common_lines(df: DataFrame, min_df: int = 2,
                      delim: str = "\n", text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Boilerplate-line removal, CCNet/RefinedWeb-style: a line
    whose EXACT content appears in >= ``min_df`` DISTINCT documents
    (navigation menus, cookie banners, footers — the classic web
    boilerplate signature) is dropped from EVERY document; the
    remaining lines rejoin in order with ``delim``. Complements
    scrub_duplicate_spans (token-gram granularity, within- and
    cross-document) with the line-granular, cross-document-only
    variant every web-corpus pipeline runs first.

    Returns (doc_id, text, n_lines, n_lines_removed); documents
    whose every line is boilerplate come back with empty text (the
    caller decides whether to drop them), untouched documents pass
    through with their ORIGINAL text verbatim.

    Scale shape: line identity is xxhash64 (8-byte shuffle payload —
    same rationale as hashed_shingle_rows; a cross-doc collision in
    2^64 could only over-drop one line pair). Document frequency is
    dropDuplicates + groupBy(count) — both map-side combinable, so a
    corpus-wide banner never concentrates its occurrence rows before
    counting. The drop itself is a left-anti join on the hash:
    Catalyst broadcasts the common-line list when it is small, and
    AQE's skew-split handles the probe-side concentration of a
    mega-frequent line otherwise. Rebuild touches ONLY documents
    that lost a line (semi-join before the rebuild explode);
    split + rejoin on the same delim is lossless for the rest, which
    pass through verbatim without ever exploding.

    ``delim`` is a LITERAL (regex-quoted before the split)."""
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    if not delim:
        raise ValueError("delim must be non-empty")
    # literal under Java regex; an embedded \E would otherwise close
    # the quote and turn the tail into live pattern syntax — escape it
    # exactly the way java.util.regex.Pattern.quote does (ADVICE r8)
    pat = "\\Q" + delim.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = (_spread(df)
             .select(F.col(id_col).alias("id"),
                     F.posexplode(F.split(F.col(text_col), pat, -1))
                     .alias("pos", "line"))
             .withColumn("h", F.xxhash64("line")))
    common = (lines.select("id", "h").dropDuplicates(["h", "id"])
              .groupBy("h").agg(F.count("*").alias("line_df"))
              .where(F.col("line_df") >= min_df)
              .select("h"))
    touched = (lines.join(common, "h", "left_semi")
               .select("id").distinct())
    kept = (lines.join(touched, "id", "left_semi")
            .join(common, "h", "left_anti"))
    rebuilt = (kept.groupBy("id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "line"))),
                       lambda s: s["line"]), delim).alias("_clean"),
                    F.count("*").alias("_n_kept")))
    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"),
        F.size(F.split(F.col(text_col), pat, -1)).cast("long")
        .alias("n_lines"))
    out = (base
           .join(touched.withColumnRenamed("id", "doc_id")
                 .withColumn("_touched", F.lit(True)),
                 "doc_id", "left")
           .join(rebuilt.withColumnRenamed("id", "doc_id"),
                 "doc_id", "left")
           .select(
               "doc_id",
               F.when(F.col("_touched").isNotNull(),
                      F.coalesce(F.col("_clean"), F.lit("")))
               .otherwise(F.col("text")).alias("text"),
               "n_lines",
               F.when(F.col("_touched").isNotNull(),
                      F.col("n_lines")
                      - F.coalesce(F.col("_n_kept"), F.lit(0)))
               .otherwise(F.lit(0)).cast("long")
               .alias("n_lines_removed")))
    return out


def semantic_dedup_text(documents: DataFrame, threshold: float = 0.999,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Semantic dedup with NO embeddings table: hashed document
    vectors (similarity.hashed_doc_vectors — the hashing trick)
    stand in for learned embeddings, then the standard
    cosine-pairs → components → min-id survivor collapse.  At the
    near-1.0 threshold this catches exact and token-permuted copies;
    with learned embeddings (semantic_dedup) it generalizes to
    paraphrases.  The bridge that makes the whole vector stack work
    on raw text corpora."""
    from .similarity import cosine_pairs, hashed_doc_vectors

    vecs = hashed_doc_vectors(documents, text_col=text_col,
                              id_col=id_col)
    pairs = cosine_pairs(vecs, threshold=threshold,
                         vec_col="vector", id_col=id_col)
    clusters = near_dup_clusters(
        documents.select(F.col(id_col)), pairs, id_col=id_col)
    keep = (clusters.where(F.col("is_canonical"))
            .select(F.col("doc_id").alias(id_col)))
    return documents.join(keep, id_col, "left_semi")


def cluster_stats(documents: DataFrame, pairs: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Cluster-size distribution over near_dup_clusters: one
    (cluster_size, n_clusters) row per size, singletons included —
    the one-look dedup summary (how much of the corpus sits in large
    duplicate families, and whether a mega-cluster warrants
    investigation before scrubbing). Two narrow groupBys on top of
    the component machinery."""
    cl = near_dup_clusters(documents, pairs, id_col=id_col)
    sizes = (cl.groupBy("cluster_id")
             .agg(F.count("*").alias("cluster_size")))
    return (sizes.groupBy("cluster_size")
            .agg(F.count("*").alias("n_clusters")))


def dedup_pair_metrics(approx: DataFrame,
                       exact: DataFrame) -> DataFrame:
    """Precision/recall gauge for near-duplicate CANDIDATE PAIRS
    against a ground truth — the dedup-family counterpart of
    ``similarity.ann_recall`` (measure before trusting a banding /
    hashing configuration). Both inputs are pair tables in the
    canonical (id_a, id_b, …) shape every pair op here emits
    (``ngram_jaccard_pairs`` is the usual exact truth). ONE row:

        (n_exact, n_approx, n_hits, recall, precision)

    - recall    — exact pairs the approximate method found. For
      verified methods (``minhash_lsh_pairs`` exact-verifies every
      candidate) this is THE number banding trades away;
    - precision — approximate pairs that are genuinely similar.
      1.0 by construction for verified methods; for proxy metrics
      (``simhash_pairs`` bounds Hamming distance, not Jaccard) it
      reports how well the proxy tracks the target.

    Plan: two distinct-pair projections, one left-semi join on the
    narrow (id_a, id_b) keys, three bounded aggregates."""
    a = approx.select("id_a", "id_b").distinct()
    e = exact.select("id_a", "id_b").distinct()
    hits = e.join(a, ["id_a", "id_b"], "left_semi")
    return (e.agg(F.count("*").alias("n_exact"))
            .crossJoin(a.agg(F.count("*").alias("n_approx")))
            .crossJoin(hits.agg(F.count("*").alias("n_hits")))
            .select(
                "n_exact", "n_approx", "n_hits",
                F.round(F.try_divide(F.col("n_hits"),
                                     F.col("n_exact")), 6)
                .alias("recall"),
                F.round(F.try_divide(F.col("n_hits"),
                                     F.col("n_approx")), 6)
                .alias("precision")))
