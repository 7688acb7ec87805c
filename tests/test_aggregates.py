from __future__ import annotations

import pyspark.sql.functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.queries import QUERIES


def test_approx_count_distinct_within_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r


def test_q18_runs(spark, sf_dir):
    rows = QUERIES["q18_approx_count_distinct"](spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(r.approx_orders > 0 and r.approx_median_price > 0 for r in rows)
