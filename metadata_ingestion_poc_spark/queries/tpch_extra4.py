"""Remaining TPC-H query shapes adapted to the fixture schema.

The fixtures have no ``partsupp`` table and no comment/commitdate
columns, so Q2/Q9/Q11/Q16/Q17/Q21 are re-expressed over ``lineitem``
as the part↔supplier link while keeping each query's distinguishing
plan shape (reference has no queries at all — SURVEY.md §2 Part B3/B4
is the contract; shapes follow the public TPC-H spec):

- Q5  — region-constrained multiway equi-join with the extra
        ``c_nationkey = s_nationkey`` local-supplier condition.
- Q8  — market-share: two roles for ``nation`` in one query plus
        conditional share aggregation per year.
- Q9  — profit grouped by supplier nation × order year.
- Q11 — HAVING against a global-total scalar subquery (kept exact by
        comparing decimals via integer scaling, never doubles).
- Q16 — COUNT(DISTINCT supplier) with a NOT IN anti-subquery.
- Q17 — per-part average-quantity threshold (decorrelated to an
        aggregate join; threshold compared in exact decimal).
- Q21 — EXISTS plus NOT EXISTS against the same derived relation
        (semi + anti join on a conjunctive/inequality condition).
- Q2  — cheapest-supplier-per-part via min + tie-broken row_number.
- Q12 — two-way conditional line counts per order-priority class.
- Q20 — nested semi-join chain with a scale-relative exact-decimal
        threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import query
from ._util import DEC, dsum


def _net(dec: bool = True) -> F.Column:
    c = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return c.cast(DEC) if dec else c


# ---------------------------------------------------------------------------
# Q5: local supplier volume — customer and supplier must share a nation.
# ---------------------------------------------------------------------------
@query(
    "q96_tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))), 6)::DOUBLE AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q96_tpch_q5_local_supplier_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_net(dec=False), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q8: national market share — nation appears in two join roles; the
# share is a conditional aggregate over exact decimal volumes.
# ---------------------------------------------------------------------------
@query(
    "q97_tpch_q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(28,6)) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6)::DOUBLE AS mkt_share
    FROM rev
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q97_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nk"),
        F.col("n_regionkey").alias("cust_rk"),
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cust_nk"))
        .join(F.broadcast(r), F.col("cust_rk") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("supp_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _net().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(DEC)
    return (
        rev.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_1", F.col("volume")
                    ).otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by supplier nation and order year (no
# partsupp cost column in fixtures, so profit = net revenue).
# ---------------------------------------------------------------------------
@query(
    "q98_tpch_q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))), 6)::DOUBLE AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q98_tpch_q9_profit_by_nation_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(_net(dec=False), "profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11: parts whose traded value exceeds 1.2x the mean part value. The
# HAVING threshold is compared in exact decimal via integer scaling
# (val * cnt * 5 > total * 6) so no engine-dependent double boundary
# can flip a row.
# ---------------------------------------------------------------------------
@query(
    "q99_tpch_q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(28,6))) AS val
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(val) AS total, COUNT(*) AS cnt FROM v)
    SELECT l_partkey, ROUND(val, 6)::DOUBLE AS part_value
    FROM v, tot
    WHERE val * cnt * 5 > total * 6
    ORDER BY part_value DESC, l_partkey
    """,
)
def q99_tpch_q11_important_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(F.sum(_net()).alias("val"))
    total = v.agg(
        F.sum("val").alias("total"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        v.join(F.broadcast(total))
        .filter(F.col("val") * F.col("cnt") * 5 > F.col("total") * 6)
        .select(
            "l_partkey",
            F.round("val", 6).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q16: distinct-supplier counts per brand/type, excluding suppliers
# from a NOT IN subquery (negative account balance).
# ---------------------------------------------------------------------------
@query(
    "q100_tpch_q16_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
)
def q100_tpch_q16_supplier_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


# ---------------------------------------------------------------------------
# Q17: revenue from lineitems whose quantity is below 20% of the
# per-part average. The threshold l_quantity < 0.2 * avg(qty) is
# rewritten qty * 5 * cnt < sum(qty), all in exact decimal.
# ---------------------------------------------------------------------------
@query(
    "q101_tpch_q17_small_quantity_revenue",
    oracle="""
    WITH t AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(28,6))) AS qty_sum,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6)))
                 AS DOUBLE) / 7.0, 6)::DOUBLE AS avg_yearly,
           COUNT(*)::BIGINT AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND CAST(l.l_quantity AS DECIMAL(28,6)) * 5 * t.cnt < t.qty_sum
    """,
)
def q101_tpch_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    t = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty_sum"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(t, li.l_partkey == F.col("t_partkey"))
        .filter(
            F.col("l_quantity").cast(DEC) * 5 * F.col("cnt")
            < F.col("qty_sum")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q21: suppliers whose returned line is the only return on a
# multi-supplier order — EXISTS (semi join) + NOT EXISTS (anti join)
# against the same derived relation, both with inequality conditions.
# ---------------------------------------------------------------------------
@query(
    "q102_tpch_q21_sole_blame_supplier",
    oracle="""
    WITH rl AS (SELECT DISTINCT l_orderkey, l_suppkey
                FROM lineitem WHERE l_returnflag = 'R'),
         al AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name, COUNT(*)::BIGINT AS numwait
    FROM rl l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM al l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM rl l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q102_tpch_q21_sole_blame_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rl = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    al = li.select("l_orderkey", "l_suppkey").distinct()
    s = load_table(spark, sf_dir, "supplier")
    l2 = al.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = rl.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        rl.join(
            l2,
            (rl.l_orderkey == F.col("ok2"))
            & (rl.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q2: cheapest supplier per part — observed min unit price from
# lineitem, tie-broken by supplier key via row_number. Unit price is a
# single IEEE division of identical inputs, so it is bit-identical
# across engines and ships RAW (de-ROUNDed round 14).
# ---------------------------------------------------------------------------
@query(
    "q103_tpch_q2_cheapest_supplier",
    oracle="""
    WITH up AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'LARGE' AND p.p_size <= 15
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    best AS (
      SELECT l_partkey, l_suppkey, unit_price,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_price, l_suppkey) AS rn
      FROM up
    )
    SELECT b.l_partkey AS p_partkey, s.s_name, s.s_acctbal, n.n_name,
           b.unit_price::DOUBLE AS best_unit_price
    FROM best b
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE b.rn = 1
    ORDER BY p_partkey
    """,
)
def q103_tpch_q2_cheapest_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    up = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("unit_price")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    return (
        up.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "s_acctbal",
            "n_name",
            # raw: MIN selects one bit-identical exact-operand
            # IEEE quotient (r14)
            F.col("unit_price").cast("double").alias(
                "best_unit_price"
            ),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 shape: conditional line counts per order-priority class — the
# two-way CASE aggregation over a fact/dim join.
# ---------------------------------------------------------------------------
@query(
    "q110_tpch_q12_priority_lines",
    oracle="""
    SELECT o.o_orderpriority,
           SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
             AS returned_lines,
           SUM(CASE WHEN l.l_returnflag <> 'R' THEN 1 ELSE 0 END)::BIGINT
             AS kept_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q110_tpch_q12_priority_lines(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(ret).alias("returned_lines"),
            F.sum(F.lit(1) - ret).alias("kept_lines"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested semi-join chain — suppliers whose shipped quantity
# of 'blue%' parts exceeds 1.1x the per-supplier average, compared in
# exact decimal via integer scaling (sum * cnt * 10 > total * 11).
# ---------------------------------------------------------------------------
@query(
    "q111_tpch_q20_heavy_suppliers",
    oracle="""
    WITH g AS (
      SELECT l.l_suppkey,
             SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS qty
      FROM lineitem l
      WHERE l.l_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      GROUP BY l.l_suppkey
    ),
    tot AS (SELECT SUM(qty) AS total, COUNT(*) AS cnt FROM g)
    SELECT s.s_suppkey, s.s_name,
           ROUND(g.qty, 6)::DOUBLE AS blue_qty
    FROM supplier s
    JOIN g ON s.s_suppkey = g.l_suppkey, tot
    WHERE g.qty * tot.cnt * 10 > tot.total * 11
    ORDER BY s_suppkey
    """,
)
def q111_tpch_q20_heavy_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("blue%")
    )
    s = load_table(spark, sf_dir, "supplier")
    g = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    tot = g.agg(
        F.sum("qty").alias("total"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        g.join(F.broadcast(tot))
        .filter(F.col("qty") * F.col("cnt") * 10 > F.col("total") * 11)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("qty", 6).cast("double").alias("blue_qty"),
        )
        .orderBy("s_suppkey")
    )
