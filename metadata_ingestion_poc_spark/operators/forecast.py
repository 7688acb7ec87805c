"""Holt linear-trend exponential smoothing (double exponential
smoothing) as a per-group codegen fold.

Holt's method is inherently sequential IN TIME (state t depends on
state t-1), but embarrassingly parallel ACROSS SERIES — and that is
the only axis that matters at 100 TB, where the workload is millions
of short series (one per key), never one astronomically long series.
The Spark-native shape is therefore:

1. one (group, bucket) rollup to the series grain — the only
   data-sized exchange;
2. one ``collect_list`` per group into a sorted struct array — the
   array is bounded by the BUCKET RANGE (here the ~2.4k-day orders
   calendar), not by the data, the same boundedness argument as the
   Kaplan-Meier at-risk frame (analytics6 q237);
3. one ``aggregate()`` lambda fold per group, entirely inside
   whole-stage codegen — no UDF, no driver loop, no per-step shuffle.
   Each group's fold is an independent task; a billion groups scale
   out linearly.

Update equations, with the ENTIRE state held in exact decimals:

    pred_t  = l_{t-1} + b_{t-1}
    l_t     = ROUND(alpha * y_t + (1 - alpha) * pred_t, 6)
    b_t     = ROUND(beta * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}, 6)

alpha/beta enter as DECIMAL(8,6) literals, so every product and sum
is EXACT decimal arithmetic and ROUND(decimal, 6) is a deterministic
half-away-from-zero on both Spark (BigDecimal HALF_UP) and DuckDB —
this operator's first draft kept the state in doubles with per-step
ROUND and hit the inevitable failure mode: a one-step error landing
exactly on the 1e-6 grid is a rounding TIE whose direction depends on
the value's binary representation, and the engines disagreed by one
grid step. Decimals have no binary representation, hence no tie
ambiguity. Initialisation: l_1 = y_1, b_1 = 0, folding from t = 2;
one-step absolute errors |y_t - pred_t| are exact decimals already at
6 dp (no rounding at all) accumulated in a DECIMAL(28,6) sum, so
in-sample MAE = sae / (n - 1) is ONE raw double division (the q265
never-round-a-ratio rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec6(x: float) -> str:
    """A DECIMAL(8,6) literal — exact for any 6-dp coefficient."""
    return f"CAST({x:.6f} AS DECIMAL(8,6))"


def holt_linear(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 7,
) -> DataFrame:
    """Fit Holt's linear trend per group; one row per group.

    ``df`` must already be at the series grain (one row per
    (group, order) — duplicate order keys within a group would make
    the fold order undefined). ``value_col`` must be exactly
    representable as DECIMAL(20,6) — a decimal sum or a true
    fixed-point value, never an arbitrary double (the cast would
    silently round and the "exact state" guarantee above evaporates).
    NULL ``value_col`` rows fail loud (``raise_error`` inside the
    fold's output, checked per group with zero extra scans): a NULL y
    would otherwise propagate NULL level/trend/forecast through the
    whole group while ``n_points`` still counted the row — a silently
    poisoned series, the opposite of this module's style.

    Returns (group, n_points, level, trend, mae, forecast): level and
    trend are the final 6-dp state as doubles, mae the one-step
    in-sample mean absolute error (NULL for single-point series), and
    forecast the ``horizon``-step linear extrapolation
    level + horizon * trend, computed in decimal and emitted once as
    a double.
    """
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError(f"alpha/beta out of range: {alpha}, {beta}")
    if round(alpha, 6) != alpha or round(beta, 6) != beta:
        raise ValueError(
            f"alpha/beta must sit on the 6-dp grid: {alpha}, {beta}"
        )
    if horizon < 0:
        raise ValueError(f"negative horizon: {horizon}")

    series = (
        df.withColumn("_y6", F.col(value_col).cast("decimal(20,6)"))
        .groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(order_col).alias("o"),
                             F.col("_y6").alias("y"))
                )
            ).alias("ys"),
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("_y6").isNull().cast("bigint")).alias("_n_null"),
        )
    )

    a, b = _dec6(alpha), _dec6(beta)
    oma, omb = _dec6(1.0 - alpha), _dec6(1.0 - beta)
    lvl = f"CAST(ROUND({a} * s.y + {oma} * (acc.l + acc.b), 6) AS DECIMAL(20,6))"
    fold = f"""
    aggregate(
      slice(ys, 2, size(ys) - 1),
      named_struct(
        'l', ys[0].y,
        'b', CAST(0 AS DECIMAL(20,6)),
        'sae', CAST(0 AS DECIMAL(28,6))),
      (acc, s) -> named_struct(
        'l', {lvl},
        'b', CAST(ROUND({b} * ({lvl} - acc.l) + {omb} * acc.b, 6)
                  AS DECIMAL(20,6)),
        'sae', CAST(acc.sae + CAST(abs(s.y - (acc.l + acc.b))
                                   AS DECIMAL(22,6))
                    AS DECIMAL(28,6))),
      acc -> acc)
    """
    return (
        series.withColumn("st", F.expr(fold))
        .select(
            F.col(group_col),
            F.col("n_points"),
            F.when(
                F.col("_n_null") > 0,
                F.expr(
                    f"raise_error(concat('holt_linear: NULL {value_col}"
                    f" in group ', CAST({group_col} AS STRING)))"
                ),
            )
            .otherwise(F.col("st.l").cast("double"))
            .alias("level"),
            F.col("st.b").cast("double").alias("trend"),
            F.when(
                F.col("n_points") > 1,
                F.col("st.sae").cast("double")
                / (F.col("n_points") - F.lit(1)).cast("double"),
            ).alias("mae"),
            F.expr(
                f"CAST(st.l + CAST({horizon} AS DECIMAL(6,0)) * st.b"
                " AS DOUBLE)"
            ).alias("forecast"),
        )
    )
