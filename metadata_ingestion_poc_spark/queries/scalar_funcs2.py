"""Second scalar-function batch: string transforms (reverse/translate/
repeat/ascii), boolean aggregates (every/any/count_if), and bitwise
operations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "q91_string_transforms",
    oracle="""
    SELECT n_nationkey,
           reverse(n_name) AS name_rev,
           translate(n_name, 'AEIOU', 'aeiou') AS name_lowvowel,
           repeat(substring(n_name, 1, 2), 3) AS prefix_x3,
           ascii(n_name)::INT AS first_char_code,
           length(replace(n_name, '_', ''))::INT AS len_no_underscore
    FROM nation
    ORDER BY n_nationkey
    """,
)
def q91_string_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.reverse("n_name").alias("name_rev"),
        F.translate("n_name", "AEIOU", "aeiou").alias("name_lowvowel"),
        F.repeat(F.substring("n_name", 1, 2), 3).alias("prefix_x3"),
        F.ascii("n_name").alias("first_char_code"),
        F.length(F.regexp_replace("n_name", "_", "")).alias(
            "len_no_underscore"
        ),
    ).orderBy("n_nationkey")


@query(
    "q92_bool_aggregates",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_above_1k,
           bool_or(o_totalprice > 400000) AS any_above_400k,
           count_if(o_orderstatus = 'F')::BIGINT AS n_finished,
           COUNT(*)::BIGINT AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q92_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.every(F.col("o_totalprice") > 1000).alias("all_above_1k"),
            F.some(F.col("o_totalprice") > 400000).alias("any_above_400k"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q93_bitwise_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_orderkey & 255)::BIGINT AS low_byte,
           (l_orderkey | 15)::BIGINT AS or_mask,
           xor(l_orderkey, l_linenumber::BIGINT)::BIGINT AS xored,
           (l_linenumber::BIGINT << 4)::BIGINT AS shifted_left,
           (l_orderkey >> 2)::BIGINT AS shifted_right,
           bit_count(l_orderkey)::INT AS popcount
    FROM lineitem
    WHERE l_orderkey <= 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q93_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ok = F.col("l_orderkey")
    ln = F.col("l_linenumber").cast("bigint")
    return (
        li.filter(ok <= 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            ok.bitwiseAND(F.lit(255)).alias("low_byte"),
            ok.bitwiseOR(F.lit(15)).alias("or_mask"),
            ok.bitwiseXOR(ln).alias("xored"),
            F.shiftleft(ln, 4).alias("shifted_left"),
            F.shiftright(ok, 2).alias("shifted_right"),
            F.bit_count(ok).alias("popcount"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
