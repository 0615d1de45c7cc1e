"""Connected components for dedup-cluster canonicalization.

Near-dup detection yields PAIRS; a pipeline needs GROUPS (one canonical
document per cluster). Components of the similarity graph are computed
with iterative min-label propagation — the standard DataFrame-only
formulation (no GraphX dependency):

    label(v) <- min(label(v), min over neighbors(label(u)))

repeated to fixpoint. Each iteration is one shuffle-join; convergence
takes O(component diameter) rounds (near-dup clusters are shallow —
star-ish — so typically <6). Lineage is truncated with localCheckpoint
every round so the loop doesn't build an unbounded plan.

The driver-side loop is control flow only — all data movement stays
distributed (the per-round `isEmpty` convergence check is a cheap
aggregate, not a collect of labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in the edge set; component id is
    the minimum node id reachable from the node."""
    # materialize the edge list once — the loop below would otherwise
    # re-evaluate the (potentially expensive) upstream pair-generation
    # plan on BOTH join sides of EVERY iteration
    undirected = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint()
    )
    labels = (
        undirected.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    for _ in range(max_iterations):
        neighbor_min = (
            undirected.join(labels, undirected.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("new_label") < F.col("label")).isEmpty()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed:
            break

    return labels.select(F.col("node"), F.col("label").alias("component"))
