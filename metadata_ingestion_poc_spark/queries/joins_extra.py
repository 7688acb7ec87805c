"""Join-variant coverage beyond the basics (B3): theta/range joins,
cross joins, self-joins, plus classic TPC-H query shapes (Q3/Q6/Q18)
that exercise the heavy multi-join + aggregate paths the bench cares
about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import dsum, sql_dsum

_BANDS = [
    ("nano", 0.0, 25_000.0),
    ("small", 25_000.0, 75_000.0),
    ("mid", 75_000.0, 150_000.0),
    ("large", 150_000.0, 300_000.0),
    ("whale", 300_000.0, 10_000_000.0),
]

_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


# ---------------------------------------------------------------------------
# Theta (range) join: orders against a price-band dimension via
# lo <= price < hi. The band table is tiny → Spark broadcasts and the
# "join" is a nested-loop over 5 rows per order — no shuffle of orders.
# ---------------------------------------------------------------------------
@query(
    "q41_theta_band_join",
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES {_BANDS_SQL})
    SELECT b.band,
           COUNT(*)::BIGINT AS n_orders,
           {sql_dsum('o.o_totalprice', 'revenue')}
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
)
def q41_theta_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [Row(band=n, lo=lo, hi=hi) for n, lo, hi in _BANDS]
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Cross join (explicit cartesian of two small dims) + left join counts.
# ---------------------------------------------------------------------------
@query(
    "q42_cross_join_grid",
    oracle="""
    WITH grid AS (
      SELECT r.r_name, s.o_orderstatus
      FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    )
    SELECT g.r_name, g.o_orderstatus, COUNT(o.o_orderkey)::BIGINT AS n_orders
    FROM grid g
    LEFT JOIN (
      SELECT o.o_orderkey, o.o_orderstatus, r.r_name
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ) o ON o.r_name = g.r_name AND o.o_orderstatus = g.o_orderstatus
    GROUP BY g.r_name, g.o_orderstatus
    ORDER BY g.r_name, g.o_orderstatus
    """,
)
def q42_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense grid of (region × status) with order counts, zeros kept —
    the cross-join-then-left-join pattern for complete reports."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    statuses = o.select("o_orderstatus").distinct()
    grid = r.select("r_name").crossJoin(statuses)
    enriched = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("o_orderkey", F.col("o_orderstatus").alias("st"), F.col("r_name").alias("rn"))
    )
    return (
        grid.join(
            enriched,
            (enriched.rn == grid.r_name) & (enriched.st == grid.o_orderstatus),
            "left",
        )
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("r_name", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Self-join: co-occurrence of parts within an order (market-basket
# shape). Shuffles once on orderkey; pair fan-out is bounded by order
# size (~7 lines), so it scales linearly in lineitem.
# ---------------------------------------------------------------------------
@query(
    "q43_self_join_copurchase",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*)::BIGINT AS n_orders
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
)
def q43_self_join_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority revenue of unshipped orders.
# ---------------------------------------------------------------------------
@query(
    "q44_tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))), 6)::DOUBLE AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q44_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                "revenue",
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue change — pure filter + global agg;
# the whole query should collapse into the parquet scan + one partial agg.
# ---------------------------------------------------------------------------
@query(
    "q45_tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))), 6)
             ::DOUBLE AS revenue,
           COUNT(*)::BIGINT AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q45_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume customers (HAVING over a join-back).
# ---------------------------------------------------------------------------
@query(
    "q46_tpch_q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice::DOUBLE AS o_totalprice,
           b.total_qty::DOUBLE AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q46_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            # raw: o_totalprice is an exact source double; total_qty
            # is an exact sum of integer-valued doubles (r14)
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
