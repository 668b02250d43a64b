"""Near-dup clusters → keep/drop decisions.

The dedup operators (pipeline/dedup.py, multimodal.py) emit PAIRS;
corpus curation needs per-document DECISIONS. The bridge is connected
components over the pair graph, computed as the classic iterative
min-label propagation — pure DataFrame ops, converging in
O(log(diameter)) rounds (large-star/small-star simplification of the
Google "Connected Components in MapReduce" recipe — public algorithm):

    label(v) <- min(label(v), min over neighbors u of label(u))

Each round is one join + groupBy-min; lineage is cut per round with
localCheckpoint. Near-dup clusters are overwhelmingly tiny (pairs of
dups, small families), so 3-5 rounds close almost any real corpus; the
iteration cap and the convergence check are explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, max_iter: int = 10,
    a_col: str = "a", b_col: str = "b",
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id of its connected component."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(
            pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select("u").distinct() \
        .select(F.col("u").alias("node"), F.col("u").alias("component"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_decisions(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    a_col: str = "a", b_col: str = "b", max_iter: int = 10,
) -> DataFrame:
    """Per-document keep/drop: within each near-dup component keep the
    min-id representative; documents in no pair keep themselves.
    Returns (id_col, component, keep boolean)."""
    comp = connected_components(pairs, max_iter, a_col, b_col)
    return (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp.node, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
        .withColumn("keep", F.col(id_col) == F.col("component"))
    )
