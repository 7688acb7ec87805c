"""Streaming rank-test drift monitor — the streaming twin of the
operators/ranktests.py family, built on the snapshot-partials
pattern of the CMS/DDSketch sinks (streaming/sketches.py).

The key observation: every grid-based rank test (Mann-Whitney q303,
Kruskal-Wallis q305, Mood q309) is a PURE FUNCTION of the
``(group, value, count)`` grid — the grid is the exact sufficient
statistic, and grid merge is plain integer addition (commutative,
associative, exactly representable). So instead of approximating,
the stream commits each micro-batch's partial grid as one idempotent
snapshot version, the live grid is merge-on-read (one bounded
groupBy), and ANY family member finalizes from it BIT-IDENTICALLY to
the batch operator on the full data — a strictly stronger guarantee
than the sketch sinks (which are exact in sketch space but
approximate in answer space; here the answer itself is exact).

Replay safety is inherited from the snapshot sink contract: partials
are append-only versions keyed by batch_id, never read-modify-write,
so at-least-once delivery cannot double-count a micro-batch into the
counts (pinned in tests/test_streaming_ranktests.py alongside
streaming ≡ batch bit-equality for all three finalizers).

State size: the partial table holds one row per (group, value) pair
per micro-batch — bounded by the same grid-boundedness contract the
batch operators carry (micro-grid the value upstream: lengths,
cents via FLOOR(x*100+0.5), bounded quantities). Compact by
re-snapshotting the merged grid if the version count grows long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_rank_grid_sink(
    table_path: str, group_col: str, value_col: str
):
    """foreachBatch handler: commit each micro-batch's partial
    ``(grp, v, c)`` rank grid as one idempotent snapshot version.
    Pair with :func:`streaming_rank_grid_read` + any
    ``*_from_counts`` finalizer in operators/ranktests.py."""
    from ..operators.ranktests import rank_grid
    from ..snapshots import snapshot_write

    def handle(batch: DataFrame, batch_id: int) -> None:
        partial = rank_grid(batch, group_col, value_col)
        snapshot_write(
            partial, table_path, mode="append", batch_id=batch_id
        )

    return handle


def streaming_rank_grid_read(spark, table_path: str) -> DataFrame:
    """The current merged exact grid over every committed micro-batch
    partial (integer addition as one bounded groupBy). Feed to
    ``mann_whitney_from_counts`` / ``kruskal_wallis_from_counts`` /
    ``mood_from_counts`` for a live drift verdict."""
    from ..snapshots import snapshot_read

    return (
        snapshot_read(spark, table_path)
        .groupBy("grp", "v")
        .agg(F.sum("c").cast("long").alias("c"))
    )
