"""TPC-H Q7 shape (cross-nation trade matrix with two nation roles)
and NULL-semantics corners (the classic engine-parity traps: aggregate
NULL skipping, NULL grouping, null-safe equality, NULL ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import dsum


# ---------------------------------------------------------------------------
# Q7 shape: revenue between different nations (supplier nation ≠
# customer nation), per year — the same dimension table joined in two
# roles, both broadcast.
# ---------------------------------------------------------------------------
@query(
    "q84_nation_trade_matrix",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(o.o_orderdate)::INT AS yr,
           COUNT(*)::BIGINT AS n_items,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))), 6)::DOUBLE AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND n1.n_regionkey = 0 AND n2.n_regionkey = 0
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q84_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                "revenue",
            ),
        )
        .orderBy("supp_nation", "cust_nation", "yr")
    )


# ---------------------------------------------------------------------------
# NULL semantics corners on injected NULLs: COUNT(col) vs COUNT(*),
# SUM skipping NULLs, the NULL group in GROUP BY, null-safe equality
# join counts, and NULLS FIRST ordering.
# ---------------------------------------------------------------------------
@query(
    "q85_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'P') AS st,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS price
      FROM orders
    ),
    grp AS (
      SELECT st, COUNT(*)::BIGINT AS n_rows,
             COUNT(price)::BIGINT AS n_priced,
             ROUND(SUM(CAST(price AS DECIMAL(28,6))), 6)::DOUBLE AS sum_price
      FROM t GROUP BY st
    ),
    nullsafe AS (
      SELECT COUNT(*)::BIGINT AS n_nullsafe_self
      FROM t a JOIN t b
        ON a.o_orderkey = b.o_orderkey
       AND a.st IS NOT DISTINCT FROM b.st
    )
    SELECT g.st, g.n_rows, g.n_priced, g.sum_price, ns.n_nullsafe_self
    FROM grp g, nullsafe ns
    ORDER BY g.st NULLS FIRST
    """,
)
def q85_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("st"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    grp = t.groupBy("st").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("price").alias("n_priced"),  # COUNT(col) skips NULLs
        dsum("price", "sum_price"),  # SUM skips NULLs
    )
    a, b = t.alias("a"), t.alias("b")
    nullsafe = (
        a.join(
            b,
            (F.col("a.o_orderkey") == F.col("b.o_orderkey"))
            & F.col("a.st").eqNullSafe(F.col("b.st")),
        )
        .agg(F.count(F.lit(1)).alias("n_nullsafe_self"))
    )
    return (
        grp.crossJoin(F.broadcast(nullsafe))
        .orderBy(F.asc_nulls_first("st"))
    )
