"""Near-dup clusters → keep/drop decisions.

The dedup operators (pipeline/dedup.py, multimodal.py) emit PAIRS;
corpus curation needs per-document DECISIONS. The bridge is connected
components over the pair graph: min-label propagation accelerated with
pointer doubling (label(v) <- label(label(v)) each round, the classic
parallel shortcutting step — public technique, same family as the
"hash-to-min" / star recipes of the Google "Connected Components in
MapReduce and Beyond" line of work). Plain one-hop propagation needs
O(diameter) rounds; the doubling step makes the effective reach grow
geometrically, so long dup-chains close in O(log diameter) rounds.

Each round is two joins + a groupBy-min; lineage is cut per round with
localCheckpoint. The iteration cap is explicit and exhausting it
RAISES — silently under-merged components would corrupt keep/drop
decisions downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, max_iter: int = 20,
    a_col: str = "a", b_col: str = "b",
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id of its connected component. Raises RuntimeError if the
    iteration cap is hit before convergence (labels monotonically
    decrease, so convergence = one round with no change)."""
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
    converged = False
    for _ in range(max_iter):
        # 1-hop: label(v) <- min(label(v), min over neighbors of label(u))
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        hopped = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
            )
        )
        # pointer doubling: label(v) <- label(label(v)). A label is
        # always a node id in the same component, so this is safe and
        # only ever decreases; it shortcuts chains geometrically.
        l2 = hopped.select(
            F.col("node").alias("_pnode"), F.col("component").alias("_pcomp")
        )
        new_labels = (
            hopped.join(l2, hopped.component == l2._pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_pcomp"), F.col("component")),
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
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed ~ log2(graph diameter))"
        )
    return labels


def dedup_decisions(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    a_col: str = "a", b_col: str = "b", max_iter: int = 20,
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
