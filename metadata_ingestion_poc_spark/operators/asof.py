"""As-of join: for each left row, the nearest right row per key —
at-or-before (backward), at-or-after (forward), or closest either way
(nearest), optionally within a tolerance. SURVEY.md §2 B3 [EXT];
feature parity with pandas ``merge_asof``.

Spark has no built-in as-of join (pandas-on-Spark merge_asof exists but
pulls both sides through pandas). The scalable pure-DataFrame plan is
the *union + observation-carried window*:

    1. tag right rows 0, left rows 1;
    2. union on (key, ts, tag, right-payload-struct);
    3. per key, ordered by (ts, tag), take last(right_payload,
       ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT ROW —
       ascending ts carries the latest right row at-or-before each
       left row (backward); descending ts carries the earliest right
       row at-or-after it (forward);
    4. keep tagged-left rows; ``nearest`` evaluates BOTH carries over
       the same union (one shuffle, two in-partition sorts) and picks
       the closer match, ties to backward.

Cost: ONE shuffle on the key + in-partition sorts — identical to any
single window function, independent of time-gap distribution. The
naive alternative (range join + min/max per left row) explodes
quadratically on hot keys; this never does, so it survives 100 TB.

Tag ordering makes matches inclusive in both directions (a right row
at ts == left ts sorts ahead of the left row in either scan), matching
DuckDB/pandas ASOF semantics. Right-side ties on ts resolve to the
last row in (ts, *tiebreak) order — i.e. the MAX tiebreak — in every
direction; pass ``tiebreak`` columns to pin this deterministically.

Tolerance: numeric ts columns use the column's own units; timestamp
columns take SECONDS (fractions allowed — compared exactly at
microsecond precision via unix_micros, so a boundary row at exactly
``tolerance`` seconds away matches, as with a closed SQL interval).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: list[str] | None = None,
    prefix: str = "r_",
    direction: str = "backward",
    tolerance: float | int | None = None,
) -> DataFrame:
    """Left as-of join: attach the nearest right row per ``on`` key.

    direction: ``backward`` (right_ts <= left_ts, the default),
    ``forward`` (right_ts >= left_ts), or ``nearest`` (closest match
    in either direction; equidistant ties go backward).

    Returns every left row (left outer semantics) plus
    ``{prefix}{col}`` for each payload column and ``{prefix}{right_ts}``
    for the matched right timestamp (NULL when no match, or when the
    match is farther than ``tolerance``).
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")

    payload_struct = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_payload],
    )

    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__event_ts"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    tb = [F.col(f"__payload.{c}") for c in (tiebreak or [])]
    lt = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__event_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    both = r.unionByName(lt)

    # microsecond-exact scalarization for tolerance / nearest-distance
    ts_type = dict(left.select(F.col(left_ts)).dtypes)[left_ts]
    is_time = ts_type.startswith("timestamp")

    def scalar(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp")) if is_time else c

    tol = None
    if tolerance is not None:
        tol = F.lit(
            int(round(tolerance * 1_000_000)) if is_time else tolerance
        )

    def carry(ascending: bool) -> Column:
        order = (
            F.col("__event_ts").asc() if ascending else F.col("__event_ts").desc()
        )
        w = (
            Window.partitionBy(*on)
            .orderBy(order, F.col("__side").asc(), *tb)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__payload", ignorenulls=True).over(w)

    def gated(match: Column, dist: Column) -> Column:
        """NULL the match when it is farther than tolerance."""
        if tol is None:
            return match
        return F.when(dist <= tol, match)

    here = scalar(F.col("__event_ts"))
    if direction == "backward":
        m = F.col("__m_b")
        matched = both.withColumn("__m_b", carry(True)).withColumn(
            "__match", gated(m, here - scalar(m["__ts"]))
        )
    elif direction == "forward":
        m = F.col("__m_f")
        matched = both.withColumn("__m_f", carry(False)).withColumn(
            "__match", gated(m, scalar(m["__ts"]) - here)
        )
    else:  # nearest: both carries over ONE union, pick the closer
        b, f = F.col("__m_b"), F.col("__m_f")
        db = here - scalar(b["__ts"])
        df_ = scalar(f["__ts"]) - here
        gb, gf = gated(b, db), gated(f, df_)
        matched = (
            both.withColumn("__m_b", carry(True))
            .withColumn("__m_f", carry(False))
            .withColumn(
                "__match",
                F.when(gb.isNull(), gf)
                .when(gf.isNull(), gb)
                .when(df_ < db, gf)
                .otherwise(gb),  # equidistant → backward
            )
        )

    out_cols: list[Column] = [
        F.col(f"__l_{c}").alias(c)
        for c in left.columns
    ]
    out_cols.append(F.col("__match.__ts").alias(f"{prefix}{right_ts}"))
    out_cols += [
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_payload
    ]
    return matched.filter(F.col("__side") == 1).select(*out_cols)
