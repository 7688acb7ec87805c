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
