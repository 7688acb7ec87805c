"""Differential tests: rank-based exact percentiles ≡ Spark built-in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.operators.percentiles import (
    exact_percentiles,
)


def _diff(spark, df, group, col, ps):
    mine = {
        tuple(r[c] for c in group): [r[name] for name in ps]
        for r in exact_percentiles(df, group, col, ps).collect()
    }
    ref = {
        tuple(r[c] for c in group): [r[name] for name in ps]
        for r in df.groupBy(*group)
        .agg(
            *[
                F.percentile(col, F.lit(p)).alias(name)
                for name, p in ps.items()
            ]
        )
        .collect()
    }
    assert set(mine) == set(ref)
    for k in ref:
        for a, b in zip(mine[k], ref[k]):
            assert a == pytest.approx(b, abs=1e-9), (k, mine[k], ref[k])


def test_matches_builtin_on_lineitem(spark, sf_dir):
    from metadata_ingestion_poc_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    _diff(
        spark,
        li,
        ["l_returnflag"],
        "l_extendedprice",
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
    )


def test_matches_builtin_small_groups_and_edges(spark):
    # group sizes 1, 2, 3 + duplicated values + negative values:
    # every interpolation corner (frac=0, frac≠0, n=1 degenerate)
    rows = [
        ("a", 5.0), ("b", 1.0), ("b", 2.0),
        ("c", -1.0), ("c", -1.0), ("c", 4.0),
        ("d", 0.0), ("d", 0.0), ("d", 0.0), ("d", 10.0),
    ]
    df = spark.createDataFrame(rows, "g: string, v: double")
    _diff(
        spark,
        df,
        ["g"],
        "v",
        {"p0": 0.0, "p25": 0.25, "p50": 0.5, "p75": 0.75, "p100": 1.0},
    )


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", 1.0), ("a", 3.0)], "g: string, v: double"
    )
    out = exact_percentiles(df, ["g"], "v", {"p50": 0.5}).collect()
    assert len(out) == 1 and out[0].p50 == pytest.approx(2.0)


def test_rejects_empty_percentiles(spark):
    df = spark.createDataFrame([("a", 1.0)], "g: string, v: double")
    with pytest.raises(ValueError):
        exact_percentiles(df, ["g"], "v", {})
