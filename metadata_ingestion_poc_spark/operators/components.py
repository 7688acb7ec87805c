"""Connected components over an edge list (dedup clustering).

Near-duplicate detection produces PAIRS; deduplication needs CLUSTERS
(pick one canonical doc per component). This is min-label propagation:
every node starts labeled with itself; each round it takes the min of
its own and its neighbors' labels; converged when the global label sum
stops falling. Rounds needed = graph diameter (tiny for dedup
clusters; the large-star/small-star variant would cut even that to
O(log n) if ever needed).

The Spark-specific essential here: each iteration must cut lineage
(localCheckpoint), or the plan doubles every round and the driver
dies planning round 15 — the canonical iterative-algorithm pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label each node with the MIN node id reachable from it.

    Returns (node, component). Only nodes present in the edge list are
    labeled (callers union in singletons if they want them).
    """
    # materialize the edge list once: it may be an expensive upstream
    # plan (e.g. the n-gram Jaccard pipeline), and every iteration joins
    # against it — without this cut each round would recompute it.
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint()
    )

    labels = (
        sym.select(F.col("s").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.d == labels.node)
            .groupBy("s")
            .agg(F.min("component").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.s, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()  # cut lineage: plans must not grow per round
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels
