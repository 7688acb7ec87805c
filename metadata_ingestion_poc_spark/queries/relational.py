"""Relational core: scan → filter → project → join → aggregate → sort.

SURVEY.md §2 B1/B2/B3/B4/B6/B7. All plans are pure DataFrame built-ins;
Catalyst handles pushdown/pruning, AQE picks join strategies at runtime.
Small dimensions are explicitly broadcast (they stay small at any SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import davg, dsum, sql_davg, sql_dsum


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary.
# scan → filter (pushed to parquet) → groupBy partial-agg → sort.
# At scale: the map-side combine reduces 100 TB of lineitem to ~4 groups
# before the (tiny) shuffle; no skew risk, no broadcast needed.
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# B2: predicate soup — =, BETWEEN, IN, LIKE, IS NULL, AND/OR/NOT.
# All of these push down to the parquet scan (visible as PushedFilters).
# ---------------------------------------------------------------------------
@query(
    "q02_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey = 1)
      AND o_orderdate IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice").between(1000, 50000))
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_orderpriority").like("%URGENT%"))
        .filter(~(F.col("o_custkey") == 1))
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# B2: projection with computed columns (arithmetic, string concat, casts).
# ---------------------------------------------------------------------------
@query(
    "q03_projection_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           CAST(l_quantity AS BIGINT) AS qty_int,
           l_returnflag || '/' || l_linestatus AS flag_status
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q03_projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("net_price"),
            F.col("l_quantity").cast("bigint").alias("qty_int"),
            F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# B3: inner equi-join fact→dim with explicit broadcast of the dim side.
# customer is fixed-size; broadcasting removes the shuffle of orders
# entirely — the single most important join optimization at 100 TB.
# ---------------------------------------------------------------------------
@query(
    "q04_join_inner_broadcast",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))), 6)::DOUBLE AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q04_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# B3: left outer join preserving unmatched left rows (null right side).
# ---------------------------------------------------------------------------
@query(
    "q05_join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey)::BIGINT AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def q05_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# B3: left-semi ("customers with at least one high-value order") and
# left-anti ("customers with no orders") — existence joins with no
# row duplication; Spark keeps only the left columns.
# ---------------------------------------------------------------------------
@query(
    "q06_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def q06_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "q07_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    ORDER BY c_custkey
    """,
)
def q07_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# B3: multi-way star join (TPC-H Q5 shape): lineitem ⋈ orders ⋈ customer
# ⋈ supplier ⋈ nation ⋈ region. Dims broadcast; the only big shuffle is
# lineitem⋈orders on orderkey, which AQE plans.
# ---------------------------------------------------------------------------
@query(
    "q08_join_star_multiway",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))), 6)::DOUBLE AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q08_join_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# B4: global aggregation (no grouping) with distinct counts.
# ---------------------------------------------------------------------------
@query(
    "q09_agg_global",
    oracle=f"""
    SELECT COUNT(*)::BIGINT AS n_rows,
           COUNT(DISTINCT l_orderkey)::BIGINT AS n_orders,
           COUNT(DISTINCT l_partkey)::BIGINT AS n_parts,
           {sql_dsum('l_quantity', 'total_qty')},
           MIN(l_extendedprice)::DOUBLE AS min_price,
           MAX(l_extendedprice)::DOUBLE AS max_price
    FROM lineitem
    """,
)
def q09_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        dsum("l_quantity", "total_qty"),
        # raw: MIN/MAX SELECT an exact source double — rounding one
        # was the ROUND(non-6dp-clean-double) hazard class (r14)
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# B6: top-k with a total order (deterministic LIMIT). Spark plans this
# as TakeOrderedAndProject — no full sort materialization.
# ---------------------------------------------------------------------------
@query(
    "q10_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q10_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# B3: right outer join — all customers preserved, big orders optional.
# Semantically c LEFT JOIN o reversed; registered as its own query so the
# right-outer code path has a dedicated value oracle (SURVEY §2 names all
# four equi-join variants). The filter on orders is applied pre-join so
# Catalyst pushes it into the scan.
# ---------------------------------------------------------------------------
@query(
    "q112_join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           COUNT(o.o_orderkey)::BIGINT AS n_big_orders
    FROM (SELECT * FROM orders WHERE o_totalprice > 150000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    ORDER BY c_custkey
    """,
)
def q112_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# B3: full outer join — two yearly activity snapshots aligned on custkey;
# unmatched rows survive on BOTH sides (customers active only in one
# year). coalesce() folds the two key columns into one canonical key.
# ---------------------------------------------------------------------------
@query(
    "q113_join_full_outer",
    oracle="""
    WITH a AS (SELECT o_custkey AS ck, COUNT(*)::BIGINT AS n_1995
               FROM orders WHERE date_part('year', o_orderdate) = 1995
               GROUP BY o_custkey),
         b AS (SELECT o_custkey AS ck, COUNT(*)::BIGINT AS n_1996
               FROM orders WHERE date_part('year', o_orderdate) = 1996
               GROUP BY o_custkey)
    SELECT COALESCE(a.ck, b.ck) AS custkey,
           COALESCE(a.n_1995, 0)::BIGINT AS n_1995,
           COALESCE(b.n_1996, 0)::BIGINT AS n_1996
    FROM a FULL OUTER JOIN b ON a.ck = b.ck
    ORDER BY custkey
    """,
)
def q113_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_custkey").alias("ck_a"))
        .agg(F.count(F.lit(1)).alias("n_1995"))
    )
    b = (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("ck_b"))
        .agg(F.count(F.lit(1)).alias("n_1996"))
    )
    return (
        a.join(b, a.ck_a == b.ck_b, "full")
        .select(
            F.coalesce("ck_a", "ck_b").alias("custkey"),
            F.coalesce("n_1995", F.lit(0)).alias("n_1995"),
            F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
        )
        .orderBy("custkey")
    )
