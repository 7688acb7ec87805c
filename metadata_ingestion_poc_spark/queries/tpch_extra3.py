"""TPC-H Q10/Q14 shapes plus remaining window rank functions
(percent_rank/cume_dist/nth_value) and array set operations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import query
from ._util import dsum


# ---------------------------------------------------------------------------
# Q10 shape: top customers by returned-item revenue in a quarter.
# ---------------------------------------------------------------------------
@query(
    "q86_tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))), 6)::DOUBLE AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q86_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                "revenue",
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 shape: share of revenue from a part-type family (conditional
# aggregation over a join).
# ---------------------------------------------------------------------------
@query(
    "q87_tpch_q14_promo_share",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'SMALL%'
                      THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                AS DECIMAL(28,6))
                      ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE),
             6)::DOUBLE AS promo_share_pct,
           COUNT(*)::BIGINT AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
      AND l.l_shipdate < TIMESTAMP '1997-09-01'
    """,
)
def q87_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    net = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    promo = F.when(F.col("p_type").like("SMALL%"), net).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(net).cast("double"),
                6,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Remaining rank-family window functions.
# ---------------------------------------------------------------------------
@query(
    "q88_window_rank_extras",
    oracle="""
    SELECT s_suppkey,
           (percent_rank() OVER w)::DOUBLE AS pct_rank,
           (cume_dist() OVER w)::DOUBLE AS cdist,
           nth_value(s_suppkey, 2) OVER
             (ORDER BY s_acctbal DESC, s_suppkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_richest
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY s_suppkey
    """,
)
def q88_window_rank_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        # raw: percent_rank = (rank−1)/(n−1) and cume_dist = cum/n are
        # each ONE IEEE division of exact int64 operands in both
        # engines — the determinism.py safe class, no ROUND needed
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_richest"),
    ).orderBy("s_suppkey")


# ---------------------------------------------------------------------------
# Array set operations between adjacent documents' token sets.
# ---------------------------------------------------------------------------
@query(
    "q89_array_setops",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_distinct(string_split(lower(trim(text)), ' ')) AS toks
               FROM documents WHERE doc_id < 40),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.toks AS ta, b.toks AS tb
      FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    )
    SELECT id_a, id_b,
           len(list_intersect(ta, tb))::INT AS n_common,
           len(list_distinct(list_concat(ta, tb)))::INT AS n_union,
           (len(ta) - len(list_intersect(ta, tb)))::INT AS n_only_a
    FROM pairs
    ORDER BY id_a
    """,
)
def q89_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    t = d.select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "toks"
        ),
    )
    a = t.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb")).alias("n_common"),
            F.size(F.array_union("ta", "tb")).alias("n_union"),
            (F.size("ta") - F.size(F.array_intersect("ta", "tb"))).alias(
                "n_only_a"
            ),
        )
        .orderBy("id_a")
    )
