"""Time-series utilities: generated date spines (gap detection) and
trailing time-range window frames (events-in-last-hour per event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import query


# ---------------------------------------------------------------------------
# Date spine via sequence + explode: which calendar days in a window
# had no HIGH-VALUE orders? (threshold keeps the result non-empty at
# every SF) Generators + anti-join — the "find the gaps" pattern.
# ---------------------------------------------------------------------------
@query(
    "q94_date_spine_gaps",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(DATE '1997-01-01', DATE '1997-03-31',
                                    INTERVAL '1 day'))::DATE AS day
    ),
    order_days AS (
      SELECT DISTINCT o_orderdate::DATE AS day FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND o_totalprice > 480000
    )
    SELECT s.day
    FROM spine s LEFT JOIN order_days o ON s.day = o.day
    WHERE o.day IS NULL
    ORDER BY s.day
    """,
)
def q94_date_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    order_days = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
            & (F.col("o_totalprice") > 480000)
        )
        .select(F.col("o_orderdate").cast("date").alias("day"))
        .distinct()
    )
    return (
        spine.join(order_days, "day", "left_anti")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Trailing time-range frame: for each event, how many events by the
# same user in the preceding hour (inclusive). Epoch-seconds range
# frame — identical semantics in both engines.
# ---------------------------------------------------------------------------
@query(
    "q95_trailing_hour_counts",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             ::BIGINT AS n_last_hour
    FROM events
    WHERE event_id < 5000
    ORDER BY event_id
    """,
)
def q95_trailing_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp(F.col("ts").cast("timestamp")))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity date, activity
# counted per whole-week offset from that cohort date. Offsets are
# pure integer day arithmetic (floor(days/7)) — deliberately NOT
# date_trunc('week', ...), whose week-start convention is an
# engine-semantics hazard. Two hash aggregates + one broadcast-able
# join (cohort table is |users| rows, tiny next to the event log).
# ---------------------------------------------------------------------------
@query(
    "q145_cohort_retention",
    oracle="""
    WITH u AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT cohort,
           CAST(floor((d - cohort) / 7.0) AS INT) AS week_offset,
           count(DISTINCT a.user_id)::BIGINT AS n_users
    FROM a JOIN u USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q145_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    activity = ev.distinct()
    return (
        activity.join(F.broadcast(cohorts), "user_id")
        .select(
            "cohort",
            F.floor(F.datediff("d", "cohort") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort", "week_offset")
    )
