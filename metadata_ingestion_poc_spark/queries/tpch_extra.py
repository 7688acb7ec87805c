"""More classic TPC-H query shapes: Q13 (distribution via left join),
Q15 (CTE + global max), Q19 (OR-of-ANDs pushdown), Q22 (anti join +
scalar subquery). These exercise optimizer paths the basic set
doesn't: outer-join aggregation, CTE reuse, disjunctive predicate
pushdown, and NOT EXISTS + uncorrelated scalar in one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import dsum


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (how many customers have
# k orders, including zero) — left join + two-level aggregation.
# ---------------------------------------------------------------------------
@query(
    "q80_tpch_q13_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*)::BIGINT AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q80_tpch_q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier by revenue over a window of time — CTE
# computed once, reused for the max comparison (Catalyst reuses the
# subplan; at scale you'd .cache() the revenue CTE explicitly).
# ---------------------------------------------------------------------------
@query(
    "q81_tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(r.total_revenue, 6)::DOUBLE AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q81_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                ).cast("decimal(28,6)")
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 6).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive predicates (OR-of-ANDs) across
# a join — tests that the scan still prunes and the join stays tight
# with non-trivial residual predicates.
# ---------------------------------------------------------------------------
@query(
    "q82_tpch_q19_disjunctive",
    oracle="""
    SELECT ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
             AS DECIMAL(28,6))), 6)::DOUBLE AS revenue,
           COUNT(*)::BIGINT AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'BRAND#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'BRAND#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'BRAND#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q82_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "BRAND#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "BRAND#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "BRAND#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(cond).agg(
        dsum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
            "revenue",
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q22 shape: customers with above-average balance and no orders —
# scalar subquery + NOT EXISTS in one plan.
# ---------------------------------------------------------------------------
@query(
    "q83_tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT SUBSTRING(c.c_name, 10, 1) AS name_digit,
           COUNT(*)::BIGINT AS n_custs,
           ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))), 6)::DOUBLE AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY SUBSTRING(c.c_name, 10, 1)
    ORDER BY name_digit
    """,
)
def q83_tpch_q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("name_digit"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal", "total_bal"),
        )
        .orderBy("name_digit")
    )
