"""Breadth-first search over an edge list: minimum hop distance.

Companion to operators/components.py (connected components): where
components answers "which docs form one near-dup cluster", BFS answers
"how far is everything from a seed set" — contamination blast-radius
("every doc within 2 near-dup hops of a benchmark doc"), graph-radius
diagnostics, seed-expansion sampling.

Iterative-Spark essentials (same rules as components.py):

- the frontier/visited DataFrames must cut lineage every round or the
  plan doubles per round (``localCheckpoint`` default, ``reliable=True``
  for fault-tolerant ``checkpoint()`` on long cluster runs);
- one driver action per round (the frontier count doubles as both the
  convergence probe and the checkpoint materializer);
- the visited set joins as ``left_anti`` against the new frontier —
  a hash join on node id, never a collected-to-driver set.

Cost: Σ_rounds |frontier ⋈ edges| — each edge is traversed at most
twice overall (once per endpoint entering the frontier), so total work
is O(E + V) spread over ``diameter`` rounds, each a plain shuffle
join. On a 100 TB near-dup graph the edge list is the big side and is
partitioned by ``u`` once up front so every round's join reuses the
same shuffle layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import _cut, _cut_lazy


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    reliable: bool = False,
) -> DataFrame:
    """Minimum hop count from ``seeds`` for every node within
    ``max_hops``, over an UNDIRECTED edge list.

    edges: columns ``u``, ``v`` (each pair in either or both
    orientations — symmetrized internally). seeds: column ``node``.
    Returns (node, hops) with hops in [0, max_hops]; unreachable nodes
    are absent. Seed rows are deduplicated.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    # Symmetrize, dedup, and lay out by source endpoint in ONE
    # exchange: repartition("u") hash-clusters by u, which also
    # satisfies the (u, v) clustering the distinct aggregate needs —
    # Catalyst inserts no second shuffle — and every round's frontier
    # join then reuses this layout.
    sym = _cut(
        edges.select("u", "v")
        .unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition("u")
        .distinct(),
        reliable,
    )

    visited = _cut(
        seeds.select("node").distinct().withColumn("hops", F.lit(0)),
        reliable,
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = _cut_lazy(
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(hop)),
            reliable,
        )
        if nxt.count() == 0:  # materializes the checkpoint too
            break
        # lazy: the next round's count (or the caller's first action)
        # materializes it — no dedicated job per round
        visited = _cut_lazy(visited.unionByName(nxt), reliable)
        frontier = nxt.select("node")
    return visited
