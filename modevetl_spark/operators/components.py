"""Connected components via iterative label propagation ([EXT] —
rounds out the graph family next to the closure operator; the
reference's hierarchy job only needs reachability, but component
grouping is the natural next question over the same edge lists).

Algorithm: every node starts labeled with its own id; each round, a node
adopts the minimum label among itself and its neighbors (edges treated
as undirected). Converges in O(diameter) rounds; each round is one
shuffle join keyed on node id. Lineage is checkpointed per round like
the closure loop. GraphFrames-free on purpose — plain DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modevetl_spark.operators.closure import _tuned_shuffle


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """-> (node, component) where component = min node id in the component."""
    undirected = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        undirected.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )

    with _tuned_shuffle(undirected, labels.count()):
        for _ in range(max_iterations):
            neighbor_min = (
                undirected.join(
                    labels.withColumnRenamed("node", "b"), on="b"
                )
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(neighbor_min, on="node", how="left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce("nbr_component", "component")
                    ).alias("component"),
                )
                .localCheckpoint(eager=True)
            )
            converged = (
                new_labels.alias("n")
                .join(labels.alias("o"), on="node")
                .where(F.col("n.component") != F.col("o.component"))
                .isEmpty()
            )
            labels = new_labels
            if converged:
                undirected.unpersist()
                return labels
    raise RuntimeError(f"components did not converge in {max_iterations} iterations")
