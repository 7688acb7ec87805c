"""Contiguous global row numbering (operators/indexing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.operators.indexing import global_row_number


def test_matches_single_partition_window(spark):
    df = spark.range(500).select(
        (F.col("id") * 37 % 250).alias("k"), F.col("id")
    )
    got = {
        r["id"]: r["row_num"]
        for r in global_row_number(df, ["k", "id"], num_partitions=7).collect()
    }
    from pyspark.sql import Window

    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "id"))
        ).collect()
    }
    assert got == want


def test_contiguous_and_partitioning_invariant(spark):
    df = spark.range(300).select(F.col("id"))
    for parts in (2, 11):
        rows = global_row_number(
            df.repartition(5), ["id"], num_partitions=parts
        ).collect()
        nums = sorted(r["row_num"] for r in rows)
        assert nums == list(range(1, 301))
        assert all(r["row_num"] == r["id"] + 1 for r in rows)


def test_no_order_cols_raises(spark):
    with pytest.raises(ValueError, match="order column"):
        global_row_number(spark.range(3), [])


def test_stable_across_reevaluation_with_aqe(spark):
    """Round-7 regression (q180 at sf0.1): the per-partition offset
    collect and the final join/window are separate jobs. Before the
    operator checkpointed its ranged frame, AQE could coalesce the
    range shuffle into a DIFFERENT partition count on the second
    evaluation, and the inner join on __pid silently dropped whole
    partitions. Force AQE's hand with a tiny advisory size and verify
    the numbering is complete several times in a row."""
    saved = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    try:
        # the wide payload column is what de-syncs the two jobs: the
        # offsets job prunes it (narrow shuffle), the final job carries
        # it (wide shuffle) — AQE coalesces the two shuffles to
        # different partition counts unless the operator pins one
        # layout
        df = spark.range(50_000).select(
            (F.col("id") * 2654435761 % 100_000).alias("k"),
            "id",
            F.repeat(F.lit("x"), 200).alias("payload"),
        )
        for _ in range(3):
            nums = [
                r["row_num"]
                for r in global_row_number(df, ["k", "id"]).select(
                    "row_num", "payload"
                ).collect()
            ]
            assert sorted(nums) == list(range(1, 50_001))
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        else:
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", saved
            )


def test_global_running_sum_matches_sequential_window(spark):
    from pyspark.sql import Window

    from metadata_ingestion_poc_spark.operators.indexing import (
        global_running_sum,
    )

    df = spark.range(20_000).select(
        (F.col("id") % 97).alias("k"),
        "id",
        (F.col("id") % 1000).cast("decimal(28,6)").alias("v"),
    )
    got = {
        r["id"]: r["rs"]
        for r in global_running_sum(
            df, ["k", "id"], "v", "rs", num_partitions=13
        ).collect()
    }
    want = {
        r["id"]: r["rs"]
        for r in df.withColumn(
            "rs",
            F.sum("v").over(
                Window.orderBy("k", "id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    assert got == want  # decimal addition is associative -> exact


def test_global_running_sum_negative_and_first_offset(spark):
    """Mixed-sign values: partition totals can be negative; the first
    partition's NULL offset must coalesce to zero, not drop rows."""
    from metadata_ingestion_poc_spark.operators.indexing import (
        global_running_sum,
    )

    df = spark.range(1000).select(
        "id",
        (
            F.when(F.col("id") % 2 == 0, F.col("id")).otherwise(
                -F.col("id")
            )
        ).cast("decimal(28,6)").alias("v"),
    )
    rows = global_running_sum(
        df, ["id"], "v", "rs", num_partitions=7
    ).collect()
    assert len(rows) == 1000
    acc, want = 0, {}
    for i in range(1000):
        acc += i if i % 2 == 0 else -i
        want[i] = acc
    got = {r["id"]: int(r["rs"]) for r in rows}
    assert got == want


def test_global_running_sum_nulls_mid_order(spark):
    """NULL values AFTER non-null ones: the in-partition window sum is
    NULL for an all-NULL partition, but earlier partitions carry a
    non-null offset — the running sum must keep carrying that prefix
    (sequential SUM OVER semantics), not go NULL. Round-8 fix; the
    older all-NULL test only covered NULLs sorted FIRST, which masks
    this."""
    from metadata_ingestion_poc_spark.operators.indexing import (
        global_running_sum,
    )

    df = spark.range(600).select(
        "id",
        F.when((F.col("id") < 100) | (F.col("id") >= 400), F.col("id"))
        .otherwise(F.lit(None))
        .cast("decimal(28,6)")
        .alias("v"),
    )
    rows = global_running_sum(
        df, ["id"], "v", "rs", num_partitions=6
    ).collect()
    assert len(rows) == 600
    got = {r["id"]: (None if r["rs"] is None else int(r["rs"])) for r in rows}
    acc, want = 0, {}
    for i in range(600):
        if i < 100 or i >= 400:
            acc += i
        want[i] = acc  # never NULL: row 0 is non-null
    assert got == want


def test_lineage_cut_is_structural(spark):
    """The q180 bug class (round 7): any operator that collects
    per-partition state and joins it back MUST checkpoint the ranged
    frame first, or AQE/sampling re-evaluation desynchronizes the two
    jobs' partition layouts. A lazy localCheckpoint turns the plan
    into a LogicalRDD leaf — so the final plan of each such operator
    must contain a LogicalRDD and must NOT re-plan the range shuffle
    (no RepartitionByExpression). Removing the checkpoint reintroduces
    the RepartitionByExpression node and fails this test."""
    from metadata_ingestion_poc_spark.operators.indexing import (
        global_row_number,
        global_running_sum,
    )
    from metadata_ingestion_poc_spark.operators.skyline import skyline2d

    df = spark.range(1000).select(
        "id",
        (F.col("id") % 37).alias("x"),
        (F.col("id") % 11).alias("y"),
        F.col("id").cast("decimal(28,6)").alias("v"),
    )
    outs = {
        "global_row_number": global_row_number(df, ["id"], num_partitions=4),
        "global_running_sum": global_running_sum(
            df, ["id"], "v", "rs", num_partitions=4
        ),
        "skyline2d": skyline2d(df, "x", "y", buckets=4, partitions=4),
    }
    for name, out in outs.items():
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "LogicalRDD" in plan, f"{name}: lineage cut missing"
        assert "RepartitionByExpression" not in plan, (
            f"{name}: range shuffle re-planned past the lineage cut"
        )


def test_global_running_sum_requires_order(spark):
    from metadata_ingestion_poc_spark.operators.indexing import (
        global_running_sum,
    )

    with pytest.raises(ValueError, match="order column"):
        global_running_sum(spark.range(3), [], "id")


def test_global_running_sum_all_null_partition(spark):
    """Nullness correlated with the sort key can fill an entire range
    partition with NULL values; its None total must be skipped (not
    crash the prefix loop) and downstream offsets must stay exact."""
    from metadata_ingestion_poc_spark.operators.indexing import (
        global_running_sum,
    )

    df = spark.range(900).select(
        "id",
        F.when(F.col("id") < 300, F.lit(None))
        .otherwise(F.col("id"))
        .cast("decimal(28,6)")
        .alias("v"),
    )
    rows = global_running_sum(
        df, ["id"], "v", "rs", num_partitions=3
    ).collect()
    assert len(rows) == 900
    got = {r["id"]: (None if r["rs"] is None else int(r["rs"])) for r in rows}
    acc, want = 0, {}
    for i in range(900):
        if i >= 300:
            acc += i
        # running SUM over an all-NULL prefix is NULL (SQL semantics)
        want[i] = None if i < 300 else acc
    assert got == want
