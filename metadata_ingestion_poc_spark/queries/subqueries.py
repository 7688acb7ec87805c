"""Subquery surface: correlated scalar subqueries, EXISTS/IN, and
uncorrelated scalar subqueries — Catalyst decorrelates these into
joins/aggregations, which is exactly what you want at scale (no
per-row re-execution). Expressed via spark.sql over the registered
views to exercise the SQL surface of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from . import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery — lineitems below 40% of
# their part's average quantity. Catalyst rewrites the correlation into
# an aggregate + join.
# ---------------------------------------------------------------------------
@query(
    "q47_correlated_scalar_subquery",
    oracle="""
    SELECT ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) / 7.0, 2)
             ::DOUBLE AS avg_yearly,
           COUNT(*)::BIGINT AS n_items
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.4 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    """,
)
def q47_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6)))
                     AS DOUBLE) / 7.0, 2) AS avg_yearly,
               COUNT(*) AS n_items
        FROM lineitem l
        WHERE l.l_quantity < (
          SELECT 0.4 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
        )
        """
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS subquery — orders with at least one lineitem
# shipped late, counted per priority. Decorrelates to a left-semi join.
# ---------------------------------------------------------------------------
@query(
    "q48_exists_subquery",
    oracle="""
    SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q48_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Uncorrelated scalar subquery + IN subquery: customers above global
# average balance, in nations that have suppliers.
# ---------------------------------------------------------------------------
@query(
    "q49_scalar_in_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal::DOUBLE AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND c_nationkey IN (SELECT DISTINCT s_nationkey FROM supplier)
    ORDER BY c_custkey
    """,
)
def q49_scalar_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "supplier")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal AS c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND c_nationkey IN (SELECT DISTINCT s_nationkey FROM supplier)
        ORDER BY c_custkey
        """
    )
