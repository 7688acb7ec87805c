"""Incremental time-bucket rollup (continuous aggregate).

The "hypertable rollup" pattern: keep a pre-aggregated table keyed by
(window_start, dims...) and fold each new micro-batch/partition of raw
events into it ADDITIVELY — never recompute history. Works because the
maintained aggregates (count, sum — and avg = sum/count at read time)
are commutative monoids, so merging partials is exact.

Delivery contract: each raw batch must be folded exactly once
(Structured Streaming's checkpointed foreachBatch provides this; the
batch tests fold disjoint halves). Late data is handled naturally —
it lands in its own window's bucket and merges in.

At 100 TB the rollup table is orders of magnitude smaller than the
events; the fold shuffles only the BATCH's partial aggregate (tiny)
plus a keyed merge into the rollup — cost is O(batch), not O(history).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import DEC


def rollup_batch(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Partial aggregate of one raw batch → rollup rows."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def fold_into_rollup(
    spark: SparkSession, batch: DataFrame, path: str, width: str = "1 hour"
) -> None:
    """Fold a raw-events batch into the rollup table at `path`.

    Additive merge: existing ⊎ incoming on (window_start, event_type),
    summing the partial aggregates. Written via staging-dir swap (same
    single-writer contract as writer.py; with Delta available this
    becomes MERGE ... WHEN MATCHED UPDATE SET n = t.n + s.n).
    """
    partial = rollup_batch(batch, width)
    target = Path(path)
    if not target.exists():
        partial.write.mode("overwrite").parquet(path)
        return

    existing = spark.read.parquet(path)
    merged = (
        existing.unionByName(partial)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    staging = str(target.with_name(target.name + "__staging"))
    merged.write.mode("overwrite").parquet(staging)
    import shutil

    shutil.rmtree(path)
    shutil.move(staging, path)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Rollup with derived columns (avg at read time — exact, since
    sum and count merged exactly)."""
    r = spark.read.parquet(path)
    return r.select(
        "window_start",
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 6).cast("double").alias("total_value"),
        F.round(F.col("sum_value").cast("double") / F.col("n_events"), 6).alias(
            "avg_value"
        ),
    )
