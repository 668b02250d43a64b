"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

All hot paths are built-in column functions or explode/join/groupBy
shapes (JVM-side); hashing is arithmetic over a portable 60-bit md5
prefix so every operator has an exact ANSI-SQL twin for the DuckDB
oracle. Scale shapes:

- exact:    one groupBy on a 64-bit fingerprint (map-side combine).
- MinHash:  shingle explode -> per-(doc, perm) min -> band hash ->
            bucket join. The band join only pairs docs sharing a
            bucket — the LSH trick that replaces the O(n^2) compare.
- SimHash:  token explode -> 64 bit-position partial sums -> sign
            bits assembled to one int64; near-dups = equal simhash
            (or small hamming distance via band split).
- n-gram Jaccard: explode + self-join on shingle hash + distinct
            counts — exact verification for LSH candidates.
- embedding cosine: normalized dot product via zip_with/aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1, the classic minhash modulus


def portable_hash60(col: F.Column) -> F.Column:
    """Deterministic 60-bit non-negative hash portable across engines:
    first 15 hex chars of md5, parsed base-16. (DuckDB twin:
    ``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``.)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def normalize_text(col: F.Column) -> F.Column:
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def word_shingles(df: DataFrame, text_col: str, n: int = 3,
                  id_col: str = "doc_id") -> DataFrame:
    """Word n-gram shingle rows: (id_col, shingle, shingle_hash)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    exploded = df.select(id_col, F.posexplode(words).alias("pos", "w"))
    joined = exploded.withColumn(
        "shingle",
        F.concat_ws(" ", *[
            F.lead("w", i).over(
                Window.partitionBy(id_col).orderBy("pos")
            ) if i else F.col("w")
            for i in range(n)
        ]),
    ).filter(
        F.lead("w", n - 1).over(
            Window.partitionBy(id_col).orderBy("pos")
        ).isNotNull()
        if n > 1
        else F.lit(True)
    )
    return joined.select(
        id_col, "shingle", portable_hash60(F.col("shingle")).alias("shingle_hash")
    )


def _shingles_no_window(df: DataFrame, text_col: str, n: int,
                        id_col: str) -> DataFrame:
    """Window-free shingling for scale: slice the word array with
    ``transform`` + ``slice`` (pure codegen, no per-doc sort/shuffle).
    Equivalent output to word_shingles."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    d = df.withColumn("_ws", words)
    cnt = F.size("_ws") - F.lit(n - 1)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice("_ws", i, n)),
    )
    return d.select(
        id_col, F.explode(shingles).alias("shingle")
    ).withColumn("shingle_hash", portable_hash60(F.col("shingle")))


def shingles(df: DataFrame, text_col: str = "text", n: int = 3,
             id_col: str = "doc_id") -> DataFrame:
    return _shingles_no_window(df, text_col, n, id_col)


# -- exact dedup ----------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Group by normalized-content hash; keep the min-id representative.
    Returns (fingerprint, n_dups, keep_id)."""
    return (
        df.withColumn("fingerprint", portable_hash60(normalize_text(F.col(text_col))))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


# -- MinHash + LSH ---------------------------------------------------------

def _perm_params(num_perm: int, seed: int = 7) -> list[tuple[int, int, int]]:
    """Deterministic (i, a, b) linear-permutation params, a odd, < p."""
    out = []
    state = seed
    for i in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MERSENNE31 - 2)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE31
        out.append((i, a, b))
    return out


def minhash_signatures(sh: DataFrame, num_perm: int = 32,
                       id_col: str = "doc_id") -> DataFrame:
    """(id, perm, minhash): min over shingles of (a*h + b) mod p.
    Shingle hashes are reduced mod p first so the product fits int64."""
    spark = sh.sparkSession
    perms = spark.createDataFrame(_perm_params(num_perm), ["perm", "a", "b"])
    return (
        sh.select(id_col, (F.col("shingle_hash") % MERSENNE31).alias("h"))
        .crossJoin(F.broadcast(perms))
        .groupBy(id_col, "perm")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % MERSENNE31).alias("minhash"))
    )


def lsh_buckets(signatures: DataFrame, bands: int = 8,
                id_col: str = "doc_id") -> DataFrame:
    """Band the signature: band id = perm mod bands; bucket key =
    md5-hash of the sorted (perm, minhash) pairs of the band."""
    return (
        signatures.withColumn("band", F.col("perm") % bands)
        .groupBy(id_col, "band")
        .agg(
            F.sort_array(F.collect_list(F.struct("perm", "minhash"))).alias("sig")
        )
        .withColumn("bucket", F.md5(F.to_json(F.col("sig"))))
        .select(id_col, "band", "bucket")
    )


def minhash_candidate_pairs(buckets: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Docs sharing any band bucket → distinct candidate pairs (a < b)."""
    left = buckets.select(F.col(id_col).alias("a"), "band", "bucket")
    right = buckets.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, pairs: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (the verify step):
    |intersection| via shingle-hash join, |union| = |A| + |B| - |I|.

    The distinct (id, shingle_hash) set is materialized ONCE and read
    three times (sizes, both join sides) — round 6: the operator used
    to recompute the shingle explode + distinct exchange per use
    (guide §5: the intermediate is reused and recomputing it costs a
    full explode+shuffle). count over the distinct set ==
    countDistinct over the raw rows, so the numbers are unchanged."""
    ds = sh.select(id_col, "shingle_hash").distinct() \
        .localCheckpoint(eager=True)
    sizes = ds.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a_sh = ds.select(F.col(id_col).alias("a"), "shingle_hash")
    b_sh = ds.select(F.col(id_col).alias("b"), "shingle_hash")
    inter = (
        pairs.join(a_sh, "a").join(b_sh, ["b", "shingle_hash"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "a")
                   .withColumnRenamed("n_sh", "n_a"), "a")
        .join(sizes.withColumnRenamed(id_col, "b")
              .withColumnRenamed("n_sh", "n_b"), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") /
                    (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .select("a", "b", "n_inter", "n_a", "n_b", "jaccard")
    )


def minhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 32,
                      bands: int = 8, n: int = 3,
                      threshold: float = 0.7) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    candidate pairs → exact-Jaccard verify ≥ threshold."""
    sh = shingles(df, text_col, n, id_col)
    sig = minhash_signatures(sh, num_perm, id_col)
    cand = minhash_candidate_pairs(lsh_buckets(sig, bands, id_col), id_col)
    return jaccard_pairs(sh, cand, id_col).filter(F.col("jaccard") >= threshold)


# -- SimHash ----------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """Charikar simhash over word tokens: per bit position, sum +1/-1 of
    token-hash bits; sign → bit. Tokens are pre-aggregated to
    (doc, token-hash, count) BEFORE the ×bits explode — identical result
    by linearity of the per-bit sum, but the 64× blowup runs over
    distinct tokens instead of every occurrence. All JVM arithmetic."""
    spark = df.sparkSession
    bit_pos = spark.range(bits).select(F.col("id").cast("int").alias("bit"))
    tokens = (
        df.select(
            id_col,
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
        )
        .withColumn("th", portable_hash60(F.col("tok")))
        .groupBy(id_col, "th")
        .agg(F.count("*").alias("cnt"))
    )
    contrib = (
        tokens.crossJoin(F.broadcast(bit_pos))
        .withColumn(
            "delta", ((F.expr("shiftright(th, bit)") % 2) * 2 - 1) * F.col("cnt")
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("delta").alias("s"))
    )
    return contrib.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with equal simhash (band-split hamming variants
    compose from the same primitives)."""
    s = simhash(df, text_col, id_col)
    a = s.select(F.col(id_col).alias("a"), "simhash")
    b = s.select(F.col(id_col).alias("b"), "simhash")
    return a.join(b, "simhash").filter(F.col("a") < F.col("b")) \
        .select("a", "b", "simhash")


# -- embedding cosine near-dup ----------------------------------------------

def cosine_pairs(emb: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 threshold: float = 0.95,
                 block_col: str | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs >= threshold. The optional
    ``block_col`` restricts the self-join to blocks (e.g. LSH bucket or
    label) — at corpus scale always pass one; the unblocked version is
    the small-data / verify path."""
    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))

    a = emb.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
        *( [F.col(block_col)] if block_col else [] ),
    ).withColumn("na", norm(F.col("va")))
    b = emb.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
        *( [F.col(block_col)] if block_col else [] ),
    ).withColumn("nb", norm(F.col("vb")))
    on = [block_col] if block_col else []
    pairs = a.join(b, on=on) if on else a.crossJoin(b)
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.filter(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
