"""Huber robust regression by IRLS (iteratively reweighted least
squares) — the robust member completing the regression family: ridge
(L2, operators/classify.py gd + analytics8 q268 closed form), pinball
(quantile/L1, q283), and now Huber (L2 near zero, L1 in the tails;
public literature: Huber 1964, the IRLS solution in any robust-
statistics text).

Why IRLS is the 100-TB shape: each iteration is an ordinary WEIGHTED
least-squares solve, and a weighted 2-parameter solve needs only five
map-combined sufficient statistics (Σw, Σwx, Σwy, Σwx², Σwxy) — so
one iteration is ONE scan of the checkpointed projection + one 1-row
collect, the kmeans/logreg literal-re-feed pattern
(operators/classify.py gd_train). Nothing data-sized reaches the
driver; the weight column is recomputed per scan from the two
re-literalized coefficients (pure codegen), never materialized.

Cross-engine determinism (the analytics8 discipline):
- residual r = y − (b0 + b1·x) is a fixed IEEE chain over exact
  operands — bit-identical on both engines;
- weight w = 1 if |r| ≤ δ else ROUND(δ/|r|, 6) — the one division is
  deterministic, the ROUND pins it to the 6-dp grid so products stay
  exact;
- each weighted summand is ROUNDed at 6 dp then summed in
  DECIMAL(28,6) (order-independent); with integer-valued x and y the
  products are EXACT 6-dp grid points, so the round has no tie
  hazard;
- the 2×2 solve is a chained IEEE expression → coefficients are
  ROUNDed HALF_UP at 6 dp (the q276 chain rule) before re-entering
  the next iteration, identically driver-side and oracle-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.determinism import DEC, _half_up


def huber_irls(
    base: DataFrame,
    x_expr: str,
    y_expr: str,
    delta: float,
    iters: int,
) -> DataFrame:
    """Huber IRLS census: one row per solve — (iter, b0, b1, n_down,
    sum_w), where (b0, b1) are the coefficients produced BY solve i
    and n_down/sum_w describe the weights USED for that solve
    (all-ones at iteration 0). Iteration 0 is therefore the plain
    (outlier-contaminated) OLS fit and the last row is the Huber fit,
    so the output carries the whole robustness story.

    ``x_expr``/``y_expr`` are SQL strings shared verbatim with the
    DuckDB oracle (the q269 contract). ``delta`` must sit on the 6-dp
    grid.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if delta <= 0 or round(delta, 6) != delta:
        raise ValueError(
            f"delta must be positive on the 6-dp grid: {delta}"
        )
    from .dedup import _spread

    # _spread before the checkpoint (the classify.py gd_train note):
    # without it the checkpoint pins the input's 2-3 parquet splits
    # and every IRLS scan runs nearly single-core.
    b = _spread(
        base.selectExpr(
            f"CAST({x_expr} AS DOUBLE) AS x",
            f"CAST({y_expr} AS DOUBLE) AS y",
        )
    ).localCheckpoint(eager=False)  # reused by iters+1 scans
    b0, b1 = 0.0, 0.0
    census: list[tuple] = []
    for it in range(iters + 1):
        if it == 0:
            w = F.lit(1.0)
        else:
            r = F.col("y") - (F.lit(b0) + F.lit(b1) * F.col("x"))
            w = F.when(
                F.abs(r) <= F.lit(delta), F.lit(1.0)
            ).otherwise(F.round(F.lit(delta) / F.abs(r), 6))
        proj = b.select(
            w.alias("w"), "x", "y"
        )

        def s(expr, alias):
            return F.sum(F.round(expr, 6).cast(DEC)).alias(alias)

        row = proj.agg(
            s(F.col("w"), "sw"),
            s(F.col("w") * F.col("x"), "swx"),
            s(F.col("w") * F.col("y"), "swy"),
            s(F.col("w") * F.col("x") * F.col("x"), "swxx"),
            s(F.col("w") * F.col("x") * F.col("y"), "swxy"),
            F.sum(F.when(F.col("w") < 1.0, 1).otherwise(0))
            .cast("long")
            .alias("n_down"),
        ).collect()[0]
        sw, swx, swy = float(row["sw"]), float(row["swx"]), float(row["swy"])
        swxx, swxy = float(row["swxx"]), float(row["swxy"])
        # the identical IEEE tree as the oracle's t{i} CTE, then the
        # chain rule: round at 6 dp before re-entering the plan
        b1 = _half_up(
            (sw * swxy - swx * swy) / (sw * swxx - swx * swx), 6
        )
        b0 = _half_up((swy - b1 * swx) / sw, 6)
        census.append(
            (it, b0, b1, int(row["n_down"]), _half_up(sw, 6))
        )
    return base.sparkSession.createDataFrame(
        census, "iter int, b0 double, b1 double, n_down long, sum_w double"
    ).orderBy("iter")
