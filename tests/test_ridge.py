"""Independent gate for the q268 closed-form ridge solve.

The q268 oracle replays the SAME Cramer/cofactor formula strings in
DuckDB, so a sign or transposition error in the formulas would pass
the sweep on both engines at once. This test is the independent
check: the solve must match numpy's on the identical normal
equations, and must recover a planted linear relationship."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from metadata_ingestion_poc_spark.queries.analytics8 import _ridge_fit


def _planted(spark, n=200):
    """y = 7 + 3*x1 - 40*x2 + deterministic 2-dp noise."""
    rows = []
    for i in range(n):
        x1 = float(i % 50 + 1)
        x2 = (i % 11) / 100.0
        noise = ((i * 13) % 7 - 3) / 100.0
        rows.append((x1, x2, round(7 + 3 * x1 - 40 * x2 + noise, 2)))
    return rows


def test_ridge_matches_numpy(spark):
    rows = _planted(spark)
    df = spark.createDataFrame(
        rows, "x1 double, x2 double, y double"
    ).select(
        F.col("x1").cast("decimal(14,2)").alias("x1"),
        F.col("x2").cast("decimal(14,2)").alias("x2"),
        F.col("y").cast("decimal(14,2)").alias("y"),
    )
    got = _ridge_fit(df).first()

    X = np.array([[1.0, x1, x2] for x1, x2, _ in rows])
    y = np.array([v for _, _, v in rows])
    lam = 1000.0
    A = X.T @ X + np.diag([0.0, lam, lam])  # intercept unpenalized
    w = np.linalg.solve(A, X.T @ y)
    assert abs(got["w0"] - w[0]) < 1e-8 * max(1, abs(w[0]))
    assert abs(got["w1"] - w[1]) < 1e-8 * max(1, abs(w[1]))
    assert abs(got["w2"] - w[2]) < 1e-8 * max(1, abs(w[2]))
    # with lambda dwarfed by n·Var(x1) the slope should sit near 3
    assert 2.5 < got["w1"] < 3.5
