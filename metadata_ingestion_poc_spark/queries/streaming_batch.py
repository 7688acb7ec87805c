"""Batch-equivalent runs of the streaming window operators (B9).

The exact plans `streaming/windows.py` builds for readStream inputs,
executed on the static events table so the DuckDB oracle can check the
window semantics (time_bucket / gaps-and-islands equivalents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..streaming.windows import session_stats, sliding_counts, tumbling_counts
from . import query


@query(
    "q70_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*)::BIGINT AS n_events,
           ROUND(SUM(CAST(value AS DECIMAL(28,6))), 6)::DOUBLE AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q70_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev, "1 hour").orderBy("window_start", "event_type")


@query(
    "q71_sliding_window",
    oracle="""
    WITH both_grids AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes')
        FROM events
    )
    SELECT window_start, COUNT(*)::BIGINT AS n_events
    FROM both_grids
    GROUP BY 1
    ORDER BY 1
    """,
)
def q71_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_counts(ev, "1 hour", "30 minutes").orderBy("window_start")


@query(
    "q72_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*)::BIGINT AS n_events,
           ROUND(SUM(CAST(value AS DECIMAL(28,6))), 6)::DOUBLE AS total_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def q72_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, "30 minutes").orderBy("user_id", "session_start")


# ---------------------------------------------------------------------------
# Stream-stream attribution join, batch-equivalent: each view matched
# to the same user's clicks within 10 minutes, aggregated to one row
# per converted view (earliest click wins, deterministic); the 4-hour
# window matches the fixture's event density (~2 events/user/day). The
# IDENTICAL
# builder (streaming/joins.py event_attribution) runs under readStream
# with watermarks on both sides — equality pinned in
# tests/test_streaming_joins.py; this registration gives the join
# semantics a full DuckDB value oracle.
# ---------------------------------------------------------------------------
@query(
    "q138_event_attribution",
    oracle="""
    WITH v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts AS click_ts FROM events
          WHERE event_type = 'click')
    SELECT v.view_id, v.user_id, v.view_ts,
           MIN(c.click_ts) AS first_click,
           COUNT(*)::BIGINT AS n_clicks,
           date_diff('microsecond', v.view_ts, MIN(c.click_ts))::BIGINT
             AS delay_us
    FROM v JOIN c ON c.user_id = v.user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts <= v.view_ts + INTERVAL 4 HOUR
    GROUP BY v.view_id, v.user_id, v.view_ts
    ORDER BY view_id
    """,
)
def q138_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..streaming.joins import event_attribution

    ev = load_table(spark, sf_dir, "events")
    j = event_attribution(ev, "view", "click", within="4 hours")
    return (
        j.groupBy(
            F.col("first_id").alias("view_id"),
            "user_id",
            F.col("first_ts").alias("view_ts"),
        )
        .agg(
            F.min("then_ts").alias("first_click"),
            F.count(F.lit(1)).alias("n_clicks"),
        )
        .withColumn(
            "delay_us",
            F.expr("timestampdiff(MICROSECOND, view_ts, first_click)"),
        )
        .orderBy("view_id")
    )


@query(
    "q286_stream_static_enrichment",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', e.ts) AS window_start,
           c.c_mktsegment AS segment,
           COUNT(*)::BIGINT AS n_events,
           ROUND(SUM(CAST(e.value AS DECIMAL(28,6))), 6)::DOUBLE
             AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q286_stream_static_enrichment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the stream-static enrichment join (round 11,
    streaming/joins.py static_enrichment): fact stream broadcast-
    enriched against the customer dimension, rolled up per (day,
    market segment). The true streaming execution — file-source
    micro-batches, availableNow — is pinned equal to this exact plan
    in tests/test_streaming_joins.py."""
    from ..streaming.joins import static_enrichment

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return static_enrichment(ev, cust, bucket="1 day").orderBy(
        "window_start", "segment"
    )
