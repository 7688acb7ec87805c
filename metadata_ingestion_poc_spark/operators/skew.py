"""Skew-mitigation operators.

AQE's skew-join splitting handles most hot-key joins automatically
(session factory enables it), but two patterns still need explicit
treatment at 100 TB:

- salted_agg: two-phase aggregation for groupBy on heavily skewed keys.
  Phase 1 aggregates on (key, salt) so a hot key's rows spread over
  `salt_buckets` reducers; phase 2 merges the partials. Only aggregates
  with a decomposition (sum/count/min/max, and avg via sum+count) apply.
- salted_join: explicit salt/replicate equi-join for when the small
  side is too big to broadcast but the big side has hot keys: big side
  gets a random-ish deterministic salt, small side is replicated across
  all salt values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` merge the
    partial columns per keys. The salt is deterministic (hash of a
    high-cardinality column) so retries reproduce the same layout;
    pass ``salt_source=None`` to salt on a per-row spark_partition_id
    + monotonic id mix (still deterministic per data layout).
    """
    if salt_source is not None:
        salt = F.pmod(F.hash(F.col(salt_source)), F.lit(salt_buckets))
    else:
        salt = F.pmod(
            F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with hot-key salting: big side salted, small side
    replicated ×salt_buckets. Trades small-side duplication for even
    reducer load. Prefer broadcast when the small side fits; prefer
    AQE skew handling when skew is moderate — this is the explicit
    big-hammer for extreme keys.
    """
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)),
    )
    small_replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = big_salted.join(small_replicated, [*on, "__salt"], how)
    return out.drop("__salt")


def partition_histogram(df: DataFrame) -> DataFrame:
    """Per-partition row counts — the skew diagnosis primitive.

    One row per non-empty partition: (partition_id, n_rows). Run it on
    a frame AFTER a repartition/join to see whether a hot key
    concentrated the data (one partition holding 100x the median is
    the signal that salting / AQE skew-split is needed). Implemented
    as groupBy(spark_partition_id()) — a tiny aggregate whose output
    is at most `numPartitions` rows, safe to collect or join at any
    scale.
    """
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("partition_id")
    )


def skew_ratio(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key-frequency skew summary for a prospective shuffle key.

    Returns ONE row: (n_keys, max_rows, p50_rows, skew_ratio =
    max/median). A ratio far above ~10 predicts stragglers when
    shuffling on `keys` and argues for salting or a different key.
    Two small aggregates; the per-key intermediate is the only
    shuffle, exactly the one being diagnosed.
    """
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__n").alias("max_rows"),
        F.expr("percentile_approx(__n, 0.5)").alias("p50_rows"),
        F.round(
            F.max("__n") / F.expr("percentile_approx(__n, 0.5)"), 2
        ).alias("skew_ratio"),
    )
