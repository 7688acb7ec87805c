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
