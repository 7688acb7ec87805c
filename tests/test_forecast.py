"""Independent gate for the Holt linear-trend fold.

The q274 oracle replays the same recursion in DuckDB, so a shared
transcription error in the update equations would pass the sweep on
both engines at once. This test checks the fold against an
independent Python re-implementation, and pins the analytic limits:
a constant series fits with zero trend and zero error, and a pure
linear ramp is tracked with one-step error approaching zero."""

from __future__ import annotations

from decimal import Decimal

import pytest

from metadata_ingestion_poc_spark.operators.forecast import holt_linear


def _py_holt(ys, alpha, beta):
    """Reference fold on exact Decimals (the operator's contract)."""
    q6 = Decimal("0.000001")
    a, b_ = Decimal(str(alpha)), Decimal(str(beta))
    lvl, tr, sae = Decimal(ys[0]), Decimal(0), Decimal(0)
    for y in ys[1:]:
        y = Decimal(y)
        pred = lvl + tr
        new_l = (a * y + (1 - a) * pred).quantize(
            q6, rounding="ROUND_HALF_UP"
        )
        tr = (b_ * (new_l - lvl) + (1 - b_) * tr).quantize(
            q6, rounding="ROUND_HALF_UP"
        )
        sae += abs(y - pred)
        lvl = new_l
    return lvl, tr, sae


def _fit(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, t int, y decimal(20,6)")
    out = holt_linear(df, "g", "t", "y", **kw)
    return {r["g"]: r for r in out.collect()}


def test_matches_reference_fold(spark):
    ys = ["10.25", "12.5", "9.75", "14.0", "13.25", "11.0", "15.5"]
    rows = [("a", i, Decimal(y)) for i, y in enumerate(ys)]
    got = _fit(spark, rows, alpha=0.3, beta=0.1, horizon=7)["a"]
    lvl, tr, sae = _py_holt(ys, 0.3, 0.1)
    assert Decimal(str(got["level"])) == lvl
    assert Decimal(str(got["trend"])) == tr
    assert got["mae"] == pytest.approx(float(sae) / (len(ys) - 1))
    assert got["forecast"] == pytest.approx(float(lvl + 7 * tr))


def test_constant_series_is_flat(spark):
    rows = [("c", i, Decimal("42.5")) for i in range(20)]
    got = _fit(spark, rows)["c"]
    assert got["level"] == 42.5
    assert got["trend"] == 0.0
    assert got["mae"] == 0.0
    assert got["forecast"] == 42.5


def test_linear_ramp_is_tracked(spark):
    # y_t = 100 + 3t: the trend state must converge to ~3 and the
    # forecast must extrapolate ahead of the last level.
    rows = [("r", i, Decimal(100 + 3 * i)) for i in range(60)]
    got = _fit(spark, rows, alpha=0.5, beta=0.5, horizon=10)["r"]
    assert got["trend"] == pytest.approx(3.0, abs=0.05)
    assert got["forecast"] > got["level"]


def test_single_point_group(spark):
    rows = [("s", 0, Decimal("7.25")), ("r", 0, Decimal("1")),
            ("r", 1, Decimal("2"))]
    got = _fit(spark, rows)
    assert got["s"]["level"] == 7.25
    assert got["s"]["trend"] == 0.0
    assert got["s"]["mae"] is None
    assert got["r"]["mae"] is not None


def test_bad_params_fail_loud(spark):
    df = spark.createDataFrame(
        [("a", 0, Decimal("1"))], "g string, t int, y decimal(20,6)"
    )
    with pytest.raises(ValueError):
        holt_linear(df, "g", "t", "y", alpha=0.0)
    with pytest.raises(ValueError):
        holt_linear(df, "g", "t", "y", alpha=0.1234567)
    with pytest.raises(ValueError):
        holt_linear(df, "g", "t", "y", horizon=-1)


def test_null_value_fails_loud(spark):
    # A NULL y must not silently poison the group's whole state
    # (NULL level/trend/forecast with n_points still counting the
    # row): the fold output carries a raise_error guard instead.
    df = spark.createDataFrame(
        [("a", 0, Decimal("1")), ("a", 1, None), ("b", 0, Decimal("2"))],
        "g string, t int, y decimal(20,6)",
    )
    with pytest.raises(Exception, match="holt_linear: NULL y in group a"):
        holt_linear(df, "g", "t", "y").collect()
    ok = {r["g"]: r for r in
          holt_linear(df.filter("y is not null"), "g", "t", "y").collect()}
    assert ok["b"]["level"] == 2.0
