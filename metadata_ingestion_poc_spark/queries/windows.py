"""Window-function surface. SURVEY.md §2 B5/B6.

Each window shuffles once on its partition key then sorts within
partitions; at 100 TB the partition key choice (custkey/orderkey —
high-cardinality, unskewed) is what keeps state per-partition bounded.
Running sums go through DECIMAL so the prefix reduction is exact and
order-stable in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import query
from ._util import DEC


# ---------------------------------------------------------------------------
# row_number top-k per group — the canonical "top 3 orders per customer".
# ---------------------------------------------------------------------------
@query(
    "q20_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q20_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# rank / dense_rank / ntile with real ties (part sizes repeat).
# ---------------------------------------------------------------------------
@query(
    "q21_rank_dense_ntile",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk,
           ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS quartile
    FROM part
    ORDER BY p_brand, p_size, p_partkey
    """,
)
def q21_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size")
    wt = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wt).alias("quartile"),
    ).orderBy("p_brand", "p_size", "p_partkey")


# ---------------------------------------------------------------------------
# lag / lead over each customer's order history (time series deltas).
# ---------------------------------------------------------------------------
@query(
    "q22_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice
                 - lag(o_totalprice, 1, 0.0) OVER w, 6)::DOUBLE AS delta_prev,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q22_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 6
        ).alias("delta_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        "o_orderdate",
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey").drop("o_orderdate")


# ---------------------------------------------------------------------------
# Running (cumulative) sum + moving average over a rows frame.
# Decimal accumulation keeps the prefix sums bitwise-identical.
# ---------------------------------------------------------------------------
@query(
    "q23_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6)::DOUBLE AS running_total,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 6)::DOUBLE AS moving_avg3
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q23_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = wo.rowsBetween(-2, Window.currentRow)
    price_dec = F.col("o_totalprice").cast(DEC)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum(price_dec).over(w_run), 6)
            .cast("double")
            .alias("running_total"),
            F.round(
                F.sum(price_dec).over(w_mov).cast("double")
                / F.count(F.lit(1)).over(w_mov),
                6,
            )
            .cast("double")
            .alias("moving_avg3"),
            "o_orderdate",
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
        .drop("o_orderdate")
    )


# ---------------------------------------------------------------------------
# RANGE frame: for each order, total of this customer's orders within
# ±1000 of its price (value-based frame, not row-based).
# ---------------------------------------------------------------------------
@query(
    "q24_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
             ::BIGINT AS n_similar_price
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q24_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# first/last over an explicit frame (needs ignorenulls=false determinism:
# the ordering is total, so first/last are well-defined).
# ---------------------------------------------------------------------------
@query(
    "q25_first_last_frame",
    oracle="""
    SELECT o_custkey,
           first_value(o_orderkey) OVER w AS first_orderkey,
           last_value(o_orderkey)  OVER w AS last_orderkey,
           o_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q25_first_last_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
        "o_orderkey",
    ).orderBy("o_custkey", "o_orderkey")
