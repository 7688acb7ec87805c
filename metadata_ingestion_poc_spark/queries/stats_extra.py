"""Statistical aggregates (correlation, covariance) and string
distance (Levenshtein) — both exact algorithms in Spark and DuckDB, so
both oracle-checkable with rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


# ---------------------------------------------------------------------------
# Pearson correlation + sample covariance per group. Numerically these
# are one-pass co-moment reductions in both engines; rounding to 4dp
# absorbs the reduction-order ulps (asserted stable across partition
# layouts by the vanilla-session harness run).
# ---------------------------------------------------------------------------
@query(
    "q76_corr_covar",
    oracle="""
    SELECT l_returnflag,
           (ROUND(corr(l_quantity, l_extendedprice), 4) + 0)::DOUBLE
             AS qty_price_corr,
           (ROUND(covar_samp(l_discount, l_tax), 6) + 0)::DOUBLE
             AS disc_tax_covar,
           COUNT(*)::BIGINT AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q76_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the + 0.0 normalizes IEEE -0.0 (tiny negatives rounding to zero
    # differ in sign between engines' reduction orders) to +0.0
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0))
            .alias("qty_price_corr"),
            (F.round(F.covar_samp("l_discount", "l_tax"), 6) + F.lit(0.0))
            .alias("disc_tax_covar"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Approximate frequent items (freqItems sketch) — sketch contents are
# engine-specific → rows-only; support bound asserted in tests. The
# item list ships comma-joined as a STRING: the harness canonicalizer
# requires every output cell scalar (the q17b rule; a raw array cell
# hard-errored q293 in round 12).
# ---------------------------------------------------------------------------
@query("q77_freq_items")
def q77_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = ev.freqItems(["event_type"], support=0.1)
    return out.select(
        F.array_join(
            F.sort_array(F.col("event_type_freqItems")), ","
        ).alias("frequent_types")
    )


# ---------------------------------------------------------------------------
# Levenshtein edit distance between document prefixes — exact DP
# algorithm in both engines. Bounded pair set (first 30 docs) keeps the
# n² explicit; the scale path for fuzzy matching is the n-gram/LSH
# family (q51/q52), with edit distance as the verifier.
# ---------------------------------------------------------------------------
@query(
    "q78_edit_distance",
    oracle="""
    WITH d AS (SELECT doc_id, substring(text, 1, 40) AS prefix
               FROM documents WHERE doc_id < 30)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.prefix, b.prefix)::INT AS edit_dist
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
)
def q78_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", F.substring("text", 1, 40).alias("prefix"))
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("pa", "pb").alias("edit_dist"),
        )
        .orderBy("id_a", "id_b")
    )
