"""Aggregation surface: grouped/global aggs, rollup/cube/grouping sets,
order statistics, distinct counts, arg-min/max. SURVEY.md §2 B4.

Everything is built-in (`groupBy().agg`, `rollup`, `cube`); partial
aggregation (map-side combine) means the shuffle carries group states,
not rows — the property that makes these run at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import DEC, dsum, sql_dsum


# ---------------------------------------------------------------------------
# ROLLUP: hierarchical subtotals region→nation. grouping_id distinguishes
# subtotal rows from data rows with NULL keys.
# ---------------------------------------------------------------------------
@query(
    "q11_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           GROUPING(r.r_name, n.n_name)::BIGINT AS gid,
           COUNT(*)::BIGINT AS n_customers,
           ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))), 6)::DOUBLE AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_balance"),
        )
        .orderBy("gid", F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


# ---------------------------------------------------------------------------
# CUBE: all combinations of (returnflag, linestatus) subtotals.
# ---------------------------------------------------------------------------
@query(
    "q12_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
           COUNT(*)::BIGINT AS n_items,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", "sum_qty"),
        )
        .orderBy(
            "gid",
            F.asc_nulls_first("l_returnflag"),
            F.asc_nulls_first("l_linestatus"),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS via SQL surface (also proves spark.sql + temp views work).
# ---------------------------------------------------------------------------
@query(
    "q13_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS gid,
           COUNT(*)::BIGINT AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q13_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# Order statistics: exact percentiles (interpolated) + min/max/median.
# ---------------------------------------------------------------------------
@query(
    "q14_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6)::DOUBLE AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6)::DOUBLE AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6)::DOUBLE AS p99,
           MIN(l_extendedprice)::DOUBLE AS min_price,
           MAX(l_extendedprice)::DOUBLE AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q14_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank-based distributed exact percentiles, NOT the built-in
    # `percentile` object-aggregate: the built-in buffers every value
    # of a group on one executor (single-threaded merge locally, OOM
    # on a hot group at scale); the rank form is shuffle-only. Same
    # percentile_cont interpolation — identical values.
    from ..operators.percentiles import exact_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    pct = exact_percentiles(
        li,
        group_cols=["l_returnflag"],
        value_col="l_extendedprice",
        percentiles={"p50": 0.5, "p90": 0.9, "p99": 0.99},
    )
    # min/max SELECT exact source doubles — shipped raw (r14); the
    # interpolated percentiles keep ROUND(6): DuckDB's quantile_cont
    # lerp is engine-internal and may differ from the operator's
    # formula in the last ulp
    extrema = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    return (
        pct.join(extrema, "l_returnflag")
        .select(
            "l_returnflag",
            F.round("p50", 6).alias("p50"),
            F.round("p90", 6).alias("p90"),
            F.round("p99", 6).alias("p99"),
            "min_price",
            "max_price",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Dispersion stats, computed from exact decimal moments so the result is
# reduction-order-independent in both engines (built-in stddev is a
# floating one-pass algorithm whose partials combine in engine-specific
# order; the moment formula over decimals is exact, then one double op).
# ---------------------------------------------------------------------------
@query(
    "q15_variance_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*)::BIGINT AS n,
           ROUND((CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                  - CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                    * CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1), 4)::DOUBLE AS var_balance
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q15_variance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    sum_x = F.sum(bal.cast(DEC)).cast("double")
    sum_x2 = F.sum((bal * bal).cast(DEC)).cast("double")
    n = F.count(F.lit(1))
    return (
        c.groupBy("c_mktsegment")
        .agg(
            n.alias("n"),
            F.round((sum_x2 - sum_x * sum_x / n) / (n - F.lit(1)), 4)
            .cast("double")
            .alias("var_balance"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# arg-min/arg-max per group with deterministic tie-breaking via a total
# order (max_by alone is non-deterministic under ties — we break ties on
# the unique key by packing (price, orderkey) into a struct).
# ---------------------------------------------------------------------------
@query(
    "q16_argmax_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderpriority,
           o_orderkey AS top_orderkey,
           o_totalprice::DOUBLE AS top_price
    FROM ranked WHERE rn = 1
    ORDER BY o_orderpriority
    """,
)
def q16_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by(
                "o_orderkey",
                F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk")),
            ).alias("top_orderkey"),
            # raw: MAX selects an exact source double (r14)
            F.max("o_totalprice").alias("top_price"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Sorted collect_list — deterministic list aggregation (sort_array makes
# the order canonical; bare collect_list order is partition-dependent).
# Emitted as a '|'-joined string: every output cell is scalar so any
# row-hashing harness can canonicalize it (raw array<string> cells are
# unhashable in pandas). q17b keeps a native array column in its plan
# but likewise projects only scalar cells out of it.
# ---------------------------------------------------------------------------
@query(
    "q17_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def q17_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias(
                "nations"
            )
        )
        .orderBy("n_regionkey")
    )


# Native-array variant: builds the real array<string> aggregate, then
# projects only scalar cells from it (size / first / last) so every
# output cell is hashable by the harness while the plan still exercises
# collect_list -> sort_array -> element_at on a true array column.
@query(
    "q17b_collect_array",
    oracle="""
    SELECT n_regionkey,
           count(*)    AS n_nations,
           min(n_name) AS first_nation,
           max(n_name) AS last_nation
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def q17b_collect_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    arr = F.sort_array(F.collect_list("n_name"))
    return (
        n.groupBy("n_regionkey")
        .agg(arr.alias("nations"))
        .select(
            "n_regionkey",
            F.size("nations").cast("long").alias("n_nations"),
            F.element_at("nations", 1).alias("first_nation"),
            F.element_at("nations", -1).alias("last_nation"),
        )
        .orderBy("n_regionkey")
    )


# ---------------------------------------------------------------------------
# approx_count_distinct (HLL++): sketch values differ from DuckDB's HLL,
# so no value oracle — rows-only. Relative error vs exact is asserted in
# tests/test_aggregates.py. At 100 TB this replaces COUNT(DISTINCT)
# shuffles with mergeable fixed-size sketches — the only distinct-count
# that scales.
# ---------------------------------------------------------------------------
@query("q18_approx_count_distinct")
def q18_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.round(F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)), 2)
        .alias("approx_median_price"),
    )
