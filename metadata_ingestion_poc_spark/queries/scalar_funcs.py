"""Scalar-function surface: strings, date/time, math, conditionals,
arrays (incl. higher-order), JSON. SURVEY.md §2 B8.

All expressions are JVM built-ins inside whole-stage codegen — no
Python crosses the row path. Cross-engine notes are inline where
Spark and DuckDB builtins differ (weekday numbering, ceil types, …).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, MapType, StringType

from ..catalog import load_table
from . import query


# ---------------------------------------------------------------------------
# Strings: upper/lower/trim/substring/split/regexp/concat/lpad/instr/length.
# ---------------------------------------------------------------------------
@query(
    "q30_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           lower(p_type) AS type_lc,
           substring(p_name, 1, 8) AS name_prefix,
           length(p_name)::INT AS name_len,
           lpad(p_size::VARCHAR, 4, '0') AS size_padded,
           instr(p_type, 'a')::INT AS first_a,
           regexp_extract(p_type, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           string_split(p_type, ' ')[1] AS type_head
    FROM part
    ORDER BY p_partkey
    """,
)
def q30_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr(F.col("p_type"), "a").alias("first_a"),
        F.regexp_extract("p_type", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Date/time: year/month/weekday/trunc/diff/add/epoch. Spark weekday() is
# 0=Monday; DuckDB isodow is 1=Monday — offset by one to align.
# ---------------------------------------------------------------------------
@query(
    "q31_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)::INT AS yr,
           month(o_orderdate)::INT AS mon,
           isodow(o_orderdate)::INT AS iso_weekday,
           date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '1998-12-01')::INT AS days_to_eoy,
           (o_orderdate::DATE + 30) AS plus_30d,
           epoch(o_orderdate)::BIGINT AS epoch_sec
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def q31_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.year(d).alias("yr"),
            F.month(d).alias("mon"),
            (F.weekday(d) + F.lit(1)).alias("iso_weekday"),
            F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
            F.datediff(F.lit("1998-12-01").cast("timestamp_ntz"), d).alias(
                "days_to_eoy"
            ),
            F.date_add(d, 30).alias("plus_30d"),
            # timestamp_ntz → interpret as UTC instant (session tz is UTC)
            F.unix_timestamp(d.cast("timestamp")).alias("epoch_sec"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Math: round/abs/ceil/floor/pow/sqrt/ln/greatest/least. DuckDB ceil of
# DOUBLE is DOUBLE while Spark's is BIGINT — cast both to BIGINT.
# ---------------------------------------------------------------------------
@query(
    "q32_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_discount - 0.05), 6)::DOUBLE AS abs_disc_diff,
           ceil(l_extendedprice)::BIGINT AS price_ceil,
           floor(l_extendedprice)::BIGINT AS price_floor,
           ROUND(pow(l_quantity, 2), 6)::DOUBLE AS qty_sq,
           ROUND(sqrt(l_extendedprice), 6)::DOUBLE AS price_sqrt,
           ROUND(ln(l_extendedprice + 1), 6)::DOUBLE AS price_ln,
           greatest(l_quantity, 25.0) AS qty_hi,
           least(l_tax, l_discount) AS tax_disc_lo
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q32_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc_diff"),
            F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
            F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
            F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
            F.least("l_tax", "l_discount").alias("tax_disc_lo"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Conditionals: CASE WHEN / coalesce / nullif (nullif manufactures NULLs
# so coalesce has real work to do).
# ---------------------------------------------------------------------------
@query(
    "q33_conditional_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'high'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           (o_totalprice > 100000 AND o_orderstatus = 'F') AS big_finished
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def q33_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return (
        o.filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.when(price > 150000, "high")
            .when(price > 50000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
            .alias("status_or_open"),
            ((price > 100000) & (F.col("o_orderstatus") == "F")).alias(
                "big_finished"
            ),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Arrays + higher-order functions over tokenized text: size, contains,
# distinct, element_at, transform+aggregate (sum of token lengths),
# filter (tokens longer than 4 chars).
# ---------------------------------------------------------------------------
@query(
    "q34_array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks)::INT AS n_tokens,
           len(list_distinct(toks))::INT AS n_unique,
           list_contains(toks, 'data') AS has_data,
           toks[1] AS first_token,
           list_aggregate(list_transform(toks, x -> length(x)), 'sum')::BIGINT
             AS total_token_chars,
           len(list_filter(toks, x -> length(x) > 4))::INT AS n_long_tokens
    FROM t
    ORDER BY doc_id
    """,
)
def q34_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_contains(toks, "data").alias("has_data"),
        F.element_at(toks, 1).alias("first_token"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_token_chars"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# JSON: get_json_object + from_json over events.props (a JSON string).
# ---------------------------------------------------------------------------
@query(
    "q35_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')::INT AS k_path,
           json_extract_string(props, '$.k')::INT AS k_typed,
           (json_extract_string(props, '$.k')::INT % 10)::INT AS k_mod10
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
)
def q35_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(
        F.col("props"), MapType(StringType(), IntegerType())
    ).getItem("k")
    return (
        ev.filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_path"),
            parsed.cast("int").alias("k_typed"),
            (parsed % 10).cast("int").alias("k_mod10"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# explode: one row per token (lateral fan-out), with position.
# ---------------------------------------------------------------------------
@query(
    "q36_explode_tokens",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 20)
    SELECT doc_id, toks[pos + 1] AS tok, pos::INT AS pos
    FROM t, unnest(range(len(toks))) AS u(pos)
    ORDER BY doc_id, pos
    """,
)
def q36_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
        )
        .select("doc_id", "tok", F.col("pos").cast("int").alias("pos"))
        .orderBy("doc_id", "pos")
    )
