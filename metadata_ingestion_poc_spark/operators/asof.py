"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key. SURVEY.md §2 B3 [EXT].

Spark has no built-in as-of join (pandas-on-Spark merge_asof exists but
pulls both sides through pandas). The scalable pure-DataFrame plan is
the *union + last-observation-carried-forward window*:

    1. tag right rows 0, left rows 1;
    2. union on (key, ts, tag, right-payload-struct);
    3. per key, ordered by (ts, tag), take last(right_payload,
       ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT ROW;
    4. keep tagged-left rows.

Cost: ONE shuffle on the key + an in-partition sort — identical to any
single window function, independent of time-gap distribution. The
naive alternative (range join + min/max per left row) explodes
quadratically on hot keys; this never does, so it survives 100 TB.

Tag ordering makes the match inclusive (right row at ts == left ts
sorts first, so it is visible), matching DuckDB/pandas ASOF semantics.
Right-side ties on ts resolve to the last row in (ts, *tiebreak)
order; pass `tiebreak` columns to pin this deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: attach the latest right row with
    ``right[right_ts] <= left[left_ts]`` per ``on`` key.

    Returns every left row (left outer semantics) plus
    ``{prefix}{col}`` for each payload column and ``{prefix}{right_ts}``
    for the matched right timestamp (NULL when no prior right row).
    """
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

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__event_ts"), F.col("__side"), *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(lt)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )

    out_cols: list[Column] = [
        F.col(f"__l_{c}").alias(c) for c in left.columns
    ]
    out_cols.append(F.col("__match.__ts").alias(f"{prefix}{right_ts}"))
    out_cols += [F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_payload]
    return matched.select(*out_cols)
