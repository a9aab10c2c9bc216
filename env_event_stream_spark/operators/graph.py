"""Iterative graph operators (the dedup endgame).

Near-dup detection yields PAIRS; eliminating duplicates needs
CLUSTERS — the transitive closure of the pair graph (A~B, B~C ⇒
{A,B,C} keep one). ``connected_components`` is minimum-label
propagation: every node repeatedly adopts the smallest label among
itself and its neighbors until fixpoint.

Scale notes: each iteration is one join + one grouped min on the edge
list (both shuffle on node id — co-partitioned after the first
round); iterations needed = graph diameter, and dup-cluster graphs
are shallow (near-cliques), so 3-5 rounds close virtually all real
corpora. localCheckpoint per round truncates the growing lineage —
without it the plan doubles every iteration and the driver OOMs
planning, not executing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 10,
) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    min node id reachable. Converges in <= diameter iterations;
    raises if max_iter rounds don't reach fixpoint (pathological
    chain graphs — raise max_iter)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = e.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").alias("label")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            e.join(labels, e.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nb_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )
