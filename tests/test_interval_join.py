from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from metadata_ingestion_poc_spark.operators.interval_join import (
    interval_overlap_join,
)


def _mk(spark, rows, k1, s, e):
    return spark.createDataFrame(
        [Row(**{"key": key, k1: i, s: a, e: b}) for key, i, a, b in rows]
    )


def _brute(left, right, keyed=True):
    out = set()
    for lk, li, ls, le in left:
        for rk, ri, rs, re in right:
            if keyed and lk != rk:
                continue
            if ls <= re and rs <= le:
                out.add((lk, li, ri))
    return out


def _random_intervals(rng, n, span_max, lo, hi, keys):
    rows = []
    for i in range(n):
        s = rng.randint(lo, hi)
        rows.append((rng.choice(keys), i, s, s + rng.randint(0, span_max)))
    return rows


def test_matches_brute_force_across_bin_widths(spark):
    rng = random.Random(7)
    lrows = _random_intervals(rng, 60, 40, 0, 300, ["a", "b"])
    rrows = _random_intervals(rng, 60, 40, 0, 300, ["a", "b"])
    left = _mk(spark, lrows, "lid", "ls", "le")
    right = _mk(spark, rrows, "rid", "rs", "re")
    expect = _brute(lrows, rrows)
    for w in (1, 7, 32, 1000):
        got = {
            (r.key, r.lid, r.rid)
            for r in interval_overlap_join(
                left, right, "ls", "le", "rs", "re", bin_width=w, on=["key"]
            ).collect()
        }
        assert got == expect, f"bin_width={w}"


def test_each_pair_emitted_exactly_once(spark):
    # two long intervals sharing MANY bins must still produce one row
    left = _mk(spark, [("k", 1, 0, 100)], "lid", "ls", "le")
    right = _mk(spark, [("k", 2, 50, 200)], "rid", "rs", "re")
    rows = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=5, on=["key"]
    ).collect()
    assert len(rows) == 1


def test_no_keys_joins_globally(spark):
    left = _mk(spark, [("a", 1, 0, 10)], "lid", "ls", "le")
    right = _mk(spark, [("b", 2, 5, 6)], "rid", "rs", "re")
    out = interval_overlap_join(
        left.drop("key"),
        right.drop("key"),
        "ls",
        "le",
        "rs",
        "re",
        bin_width=4,
    ).collect()
    assert [(r.lid, r.rid) for r in out] == [(1, 2)]


def test_touching_endpoints_inclusive(spark):
    left = _mk(spark, [("k", 1, 0, 5)], "lid", "ls", "le")
    right = _mk(spark, [("k", 2, 5, 9), ("k", 3, 6, 9)], "rid", "rs", "re")
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=3, on=["key"]
    ).collect()
    assert {(r.lid, r.rid) for r in out} == {(1, 2)}


def test_negative_coordinates(spark):
    # floor division must bin negatives correctly (floor, not trunc)
    left = _mk(spark, [("k", 1, -10, -2)], "lid", "ls", "le")
    right = _mk(spark, [("k", 2, -4, 3)], "rid", "rs", "re")
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=4, on=["key"]
    ).collect()
    assert len(out) == 1


def test_bad_bin_width_raises(spark):
    df = _mk(spark, [("k", 1, 0, 1)], "lid", "ls", "le")
    with pytest.raises(ValueError):
        interval_overlap_join(df, df, "ls", "le", "ls", "le", bin_width=0)


def test_plan_is_equi_join_not_cartesian(spark):
    left = _mk(spark, [("k", 1, 0, 10)], "lid", "ls", "le")
    right = _mk(spark, [("k", 2, 5, 6)], "rid", "rs", "re")
    plan = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=4, on=["key"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
