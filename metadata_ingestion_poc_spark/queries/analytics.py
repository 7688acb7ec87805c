"""Event analytics + grouped-map UDF surface.

- funnel: signup→purchase conversion within a horizon, pure window
  functions (the scalable formulation — no joins, one shuffle per user).
- grouped-map z-score via applyInPandas (B11): per-group normalization
  where the group fits in memory — the sanctioned grouped-map pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import query


# ---------------------------------------------------------------------------
# Funnel: for each user, does a purchase follow their first signup
# within 7 days? One window pass per user.
# ---------------------------------------------------------------------------
@query(
    "q73_funnel_conversion",
    oracle="""
    WITH first_signup AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    converted AS (
      SELECT f.user_id,
             MAX(CASE WHEN e.event_type = 'purchase'
                       AND e.ts >= f.signup_ts
                       AND e.ts <= f.signup_ts + INTERVAL '7 days'
                      THEN 1 ELSE 0 END) AS converted
      FROM first_signup f
      JOIN events e ON e.user_id = f.user_id
      GROUP BY f.user_id
    )
    SELECT COUNT(*)::BIGINT AS n_signup_users,
           SUM(converted)::BIGINT AS n_converted,
           ROUND(SUM(converted) * 1.0 / COUNT(*), 6)::DOUBLE AS conversion_rate
    FROM converted
    """,
)
def q73_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    first_signup = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    per_event = ev.withColumn("signup_ts", first_signup).filter(
        F.col("signup_ts").isNotNull()
    )
    converted = per_event.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("signup_ts"))
                & (F.col("ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
            ).cast("int")
        ).alias("converted")
    )
    return converted.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.sum("converted").alias("n_converted"),
        F.round(F.sum("converted") / F.count(F.lit(1)), 6).alias(
            "conversion_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: z-score of event values per event_type.
# Oracle: the same standardization in SQL (population stddev). Rounded
# to 4dp — pandas' single-pass moments vs DuckDB's differ in last ulps.
# ---------------------------------------------------------------------------
@query(
    "q74_grouped_zscore",
    oracle="""
    SELECT event_id, event_type,
           (ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                  / stddev_pop(value) OVER (PARTITION BY event_type),
                  4) + 0)::DOUBLE AS zscore
    FROM events
    WHERE event_id < 5000
    ORDER BY event_id
    """,
)
def q74_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)

    def zscore(pdf):
        import numpy as np

        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=0)
        out = pdf[["event_id", "event_type"]].copy()
        # + 0.0 normalizes IEEE -0.0 for cross-engine hashing
        out["zscore"] = np.round((pdf["value"] - m) / s, 4) + 0.0
        return out

    return (
        ev.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(zscore, schema="event_id long, event_type string, zscore double")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Stratified sampling, deterministic: the per-stratum fraction is a
# pure function of the stratum key (ascii parity of the language's
# first letter → 50% or 20%) and the keep decision is a pure function
# of the doc id (multiplicative hash, q117 pattern with distinct
# constants) — so the sample is identical on any cluster size, any
# partition layout, and replays exactly in the DuckDB oracle. The id
# is folded mod a prime BEFORE the multiply so the product can never
# overflow int64 even at 100 TB id ranges (ANSI mode would error).
# No driver enumeration of strata: sampleBy's fractions-dict (and its
# distinct().collect()) is gone entirely.
# ---------------------------------------------------------------------------
@query(
    "q75_stratified_sample",
    oracle="""
    WITH s AS (
      SELECT lang, doc_id,
             CASE WHEN ascii(substring(lang, 1, 1)) % 2 = 0
                  THEN 500 ELSE 200 END AS keep_pm
      FROM documents)
    SELECT lang, COUNT(*)::BIGINT AS n_sampled,
           MIN(doc_id)::BIGINT AS first_doc,
           MAX(doc_id)::BIGINT AS last_doc
    FROM s
    WHERE (doc_id % 1000003) * 2246822507 % 1000 < keep_pm
    GROUP BY lang ORDER BY lang
    """,
)
def q75_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keep_pm = F.when(
        F.ascii(F.substring(F.col("lang"), 1, 1)) % 2 == 0, F.lit(500)
    ).otherwise(F.lit(200))
    sampled = d.withColumn("keep_pm", keep_pm).filter(
        F.pmod(
            F.pmod(F.col("doc_id"), F.lit(1000003)) * F.lit(2246822507),
            F.lit(1000),
        )
        < F.col("keep_pm")
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang")
    )
