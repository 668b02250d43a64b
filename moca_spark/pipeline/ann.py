"""Similarity search over embedding columns (array<float>).

Two paths, per the standard recipe:
- ``brute_force_topk`` — exact cosine top-k via a join + window; the
  correctness baseline and the verify step for the approximate path.
  Dot products are ``zip_with``/``aggregate`` column algebra (JVM,
  codegen) — no Python.
- ``lsh_topk`` — random-hyperplane LSH (SimHash for vectors): each
  vector gets a b-bit signature; candidates = vectors sharing a
  signature band; exact cosine only within buckets. At corpus scale
  this is the path: the bucket join replaces the O(n·m) cross product.
- ``ivf_topk`` — IVF-style variant: assign each vector to its nearest
  of k seeded centroid directions (one pass, deterministic — no
  training loop), probe the query's top-p cells.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(c) -> F.Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    q_id: str = "q_id", c_id: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (q_id, vec_id, cosine, rnk<=k). Queries are
    broadcast (the typical shape: few queries vs a huge corpus)."""
    q = F.broadcast(
        queries.select(F.col(q_id), F.col(vec).alias("qv"))
        .withColumn("qn", _norm(F.col("qv")))
    )
    c = corpus.select(F.col(c_id), F.col(vec).alias("cv")) \
        .withColumn("cn", _norm(F.col("cv")))
    scored = q.crossJoin(c).withColumn(
        "cosine", F.round(_dot(F.col("qv"), F.col("cv")) /
                          (F.col("qn") * F.col("cn")), 6)
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(q_id, c_id, "cosine", "rnk")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 13) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).round(6).tolist()


def add_lsh_signature(
    df: DataFrame, dim: int, bits: int = 16, vec: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """b-bit random-hyperplane signature as one int column — pure
    column algebra (sign of dot with each plane)."""
    planes = _hyperplanes(dim, bits, seed)
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        # round before the sign test: the DuckDB oracle twin sums the
        # same products in a different order, and an unrounded near-tie
        # dot could flip a signature bit between engines
        d = F.round(_dot(F.col(vec), F.array(*[F.lit(x) for x in p])), 9)
        sig = sig + F.when(d > 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    return df.withColumn("lsh_sig", sig)


def lsh_topk(
    queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
    bits: int = 16, bands: int = 4,
    q_id: str = "q_id", c_id: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share >=1 of ``bands`` signature
    bands; exact cosine re-ranks within candidates. Recall grows with
    bands; the shuffle is on small band keys instead of a cross join."""
    assert bits % bands == 0
    band_bits = bits // bands
    mask = (1 << band_bits) - 1

    def with_bands(df, id_out, id_in):
        # band rows carry IDS ONLY — the 64-double vectors must not
        # ride the band join or the candidate-dedup shuffle (they are
        # re-acquired per id after the distinct; ~50x fewer bytes)
        sig = add_lsh_signature(df, dim, bits, vec)
        bands_arr = F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("lsh_sig"), i * band_bits)
                .bitwiseAND(F.lit(mask)).alias("bkey"),
            )
            for i in range(bands)
        ])
        return sig.select(
            F.col(id_in).alias(id_out), F.explode(bands_arr).alias("b"),
        ).select(id_out, F.col("b.band"), F.col("b.bkey"))

    qb = with_bands(queries, "qq", q_id)
    cb = with_bands(corpus, "cc", c_id)
    cand = (
        qb.join(cb, ["band", "bkey"])
        .select(F.col("qq").alias(q_id), F.col("cc").alias(c_id))
        .distinct()
    )
    # re-join the vectors: queries broadcast (small side), corpus joined
    # once on c_id — each vector crosses the wire once per candidate
    # row, never through the dedup exchange
    qv = F.broadcast(
        queries.select(F.col(q_id), F.col(vec).alias("qv"))
        .withColumn("qn", _norm(F.col("qv")))
    )
    cv = corpus.select(F.col(c_id), F.col(vec).alias("cv")) \
        .withColumn("cn", _norm(F.col("cv")))
    scored = cand.join(qv, q_id).join(cv, c_id).withColumn(
        "cosine",
        F.round(_dot(F.col("qv"), F.col("cv")) /
                (F.col("qn") * F.col("cn")), 6),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(q_id, c_id, "cosine", "rnk")
    )


def _ivf_centroids(dim: int, n_cells: int, seed: int = 29) -> list[list[float]]:
    """Deterministic unit centroid directions, rounded to 6 dp — also
    emitted as SQL literals by the q31 DuckDB oracle twin."""
    rng = np.random.RandomState(seed)
    cents = rng.normal(size=(n_cells, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return cents.round(6).tolist()


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
    n_cells: int = 16, n_probe: int = 4,
    q_id: str = "q_id", c_id: str = "vec_id", vec: str = "embedding",
    seed: int = 29,
) -> DataFrame:
    """IVF-flavored ANN: deterministic random centroid directions;
    corpus rows live in their argmax-dot cell; queries probe their
    ``n_probe`` best cells. One shuffle on cell id."""
    cents = _ivf_centroids(dim, n_cells, seed)

    def cell_scores(v):
        # dots rounded to 9 dp before the argmax/probe ranking so the
        # DuckDB oracle twin (different summation order) cannot flip a
        # near-tie cell assignment
        return F.array(*[
            F.struct(
                F.round(_dot(v, F.array(*[F.lit(x) for x in c])), 9).alias("s"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(cents)
        ])

    c = corpus.select(
        F.col(c_id), F.col(vec).alias("cv"),
        F.sort_array(cell_scores(F.col(vec)), asc=False)[0]["cell"].alias("cell"),
    )
    q = queries.select(
        F.col(q_id), F.col(vec).alias("qv"),
        F.slice(F.sort_array(cell_scores(F.col(vec)), asc=False), 1, n_probe)
        .alias("probes"),
    ).select(q_id, "qv", F.explode("probes.cell").alias("cell"))
    scored = q.join(c, "cell").withColumn(
        "cosine",
        F.round(_dot(F.col("qv"), F.col("cv")) /
                (_norm(F.col("qv")) * _norm(F.col("cv"))), 6),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (
        scored.groupBy(q_id, c_id).agg(F.max("cosine").alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(q_id, c_id, "cosine", "rnk")
    )
