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

from .text import POLY_MOD, POLY_MUL, poly_hash, tokens

MERSENNE = 2305843009213693951  # 2^61 - 1, headroom for a*h+b


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


def shingles(col, n: int = 3):
    """Distinct word n-gram shingles of a text column (array column).
    Built with sequence+transform — no explode until the join needs it."""
    toks = tokens(col)
    return F.array_distinct(F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    ).otherwise(F.array(F.concat_ws(" ", toks))))


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """EXACT n-gram Jaccard similar pairs (a < b, jaccard >= threshold)
    via the inverted-index shingle join: explode distinct shingles,
    self-join on shingle, count intersections, compute |A∪B| from
    per-doc shingle counts. Shuffles on shingle then on the pair key —
    both well-partitioned at scale."""
    sh = (df.select(F.col(id_col).alias("id"),
                    shingles(F.col(text_col), n).alias("sh")))
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    ex = sh.select("id", F.explode("sh").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
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
                       id_col: str = "doc_id") -> DataFrame:
    """k-wide MinHash signature per doc, computed entirely inside one
    projection: shingle hashes as an array column, then k universal-hash
    minima via array transforms — zero shuffles, pure codegen."""
    sh_hashes = F.transform(shingles(F.col(text_col), n),
                            lambda s: F.aggregate(
                                F.split(s, ""), F.lit(0).cast("long"),
                                lambda acc, x: (acc * POLY_MUL + F.ascii(x))
                                % POLY_MOD))
    cols = [F.col(id_col).alias("id"),
            sh_hashes.alias("sh_hashes"),
            shingles(F.col(text_col), n).alias("sh")]
    out = df.select(*cols)
    for i, (ai, bi) in enumerate(_lcg_params(k)):
        out = out.withColumn(
            f"mh_{i}",
            F.array_min(F.transform(
                F.col("sh_hashes"),
                lambda h: (F.lit(ai) * h + F.lit(bi)) % POLY_MOD)))
    return out.drop("sh_hashes")


def minhash_lsh_pairs(df: DataFrame, n: int = 3, k: int = 32,
                      bands: int = 8, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified with exact
    Jaccard over the shingle sets. k/bands rows per band; a pair is a
    candidate iff some band signature collides; candidates are then
    exactly verified, so precision is 1.0 and only recall depends on
    the banding. Shuffle cost is O(docs × bands), never O(docs²)."""
    rows = k // bands
    sig = minhash_signatures(df, n, k, text_col, id_col)
    band_cols = [F.struct(F.lit(bi).alias("band"),
                          F.concat_ws("_", *[F.col(f"mh_{bi * rows + r}")
                                             for r in range(rows)])
                          .alias("sig"))
                 for bi in range(bands)]
    exploded = (sig.select("id", "sh",
                           F.explode(F.array(*band_cols)).alias("bs"))
                .select("id", "sh", F.col("bs.band").alias("band"),
                        F.col("bs.sig").alias("sig")))
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("a.sh").alias("sh_a"),
                    F.col("b.sh").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return (cand.withColumn("jaccard", F.round(jac, 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash: per-token portable hash, then per-bit sign sums.
    Implemented as one explode + one groupBy with `bits` conditional
    sums (map-side partial aggregation keeps the shuffle tiny)."""
    tok = (df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(F.col(text_col))).alias("tok")))
    # widen the 31-bit poly hash to 64 bits with two more rounds
    h1 = poly_hash(F.col("tok"))
    h = (h1 * F.lit(2654435761) + F.lit(40503)) % F.lit(MERSENNE)
    tok = tok.withColumn("h", h)
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


def simhash_pairs(df: DataFrame, max_hamming: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Pairs within Hamming distance via 4-band pigeonhole blocking:
    any pair with distance ≤ 3 shares at least one of four 16-bit
    chunks; join per chunk, then verify with bit_count(xor)."""
    sh = simhash(df, text_col, id_col)
    chunks = [F.struct(F.lit(i).alias("band"),
                       F.shiftright(F.col("simhash"), i * 16)
                       .bitwiseAND(0xFFFF).alias("chunk"))
              for i in range(4)]
    ex = (sh.select("id", "simhash",
                    F.explode(F.array(*chunks)).alias("c"))
          .select("id", "simhash", "c.band", "c.chunk"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.simhash").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", dist)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
