"""Binned interval-overlap join (the scalable range join).

Find every (left, right) pair whose closed integer intervals
``[l_start, l_end]`` and ``[r_start, r_end]`` overlap, optionally
within equi-join keys. The naive plan is an inequality theta join —
Spark executes that as BroadcastNestedLoop (fine only when one side is
tiny) or, with no broadcastable side, a cartesian product: O(n·m)
comparisons and a scale-killer.

The Spark-native shape is the classic *binning* decomposition (the
same trick behind Databricks' range-join optimization and genomics
interval joins):

1. pick a bin width ``w``; every interval emits one row per bin it
   touches — ``floor(start/w) .. floor(end/w)`` via ``sequence`` +
   ``explode`` (pure JVM, stays in codegen);
2. hash-equi-join on ``(keys…, bin)`` — a plain shuffle join, cost
   Σ per-bin(|L_bin|·|R_bin|) instead of n·m;
3. verify the exact overlap predicate
   ``l_start <= r_end AND r_start <= l_end``;
4. **emit-once instead of dedup**: a pair that overlaps shares every
   bin in ``[max(starts)//w, min(ends)//w]``; keeping only the
   ``bin == floor(greatest(l_start, r_start)/w)`` copy yields each
   pair exactly once with no ``distinct()`` (no second shuffle).

Choosing ``w``: replication factor per row is ``span/w + 1``, while
per-bin join cost grows with how many intervals a bin collects — set
``w`` near the typical interval span so most intervals land in 1-2
bins. Skew note: one giant interval replicates into span/w bins but
each copy meets only that bin's partners — long intervals cost linear
replication, never a quadratic blow-up; AQE skew-join splits any hot
bin further.

Endpoints are inclusive longs (epoch days/seconds/µs all work —
callers pick the resolution and a matching ``bin_width``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """All overlapping (left, right) interval pairs, equi-keyed on
    ``on``. Column names across the two sides must be disjoint apart
    from ``on`` (rename before calling, as with any self-join).

    Returns left columns + right columns (each pair exactly once).
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    on = on or []
    w = F.lit(int(bin_width))

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / w), F.floor(F.col(end) / w)
                )
            ),
        )

    ls, le = F.col(left_start), F.col(left_end)
    rs, re = F.col(right_start), F.col(right_end)
    pairs = binned(left, left_start, left_end).join(
        binned(right, right_start, right_end), [*on, "__bin"]
    )
    return pairs.filter(
        (ls <= re)
        & (rs <= le)
        # emit-once bin: both intervals contain max(starts), so both
        # emitted this bin; every other shared bin is filtered here.
        & (F.col("__bin") == F.floor(F.greatest(ls, rs) / w))
    ).drop("__bin")
