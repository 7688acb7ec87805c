"""skyline2d (operators/skyline.py): two-phase Pareto frontier must
equal the brute-force dominance definition on every shape — random
clouds, the all-on-frontier diagonal worst case, duplicates, ties."""

from __future__ import annotations

import random

from metadata_ingestion_poc_spark.operators.skyline import skyline2d


def _brute(points):
    pts = set(points)
    out = []
    for a in pts:
        dominated = any(
            b[0] <= a[0] and b[1] <= a[1] and (b[0] < a[0] or b[1] < a[1])
            for b in pts
            if b != a
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def _run(spark, points, **kw):
    df = spark.createDataFrame(points, ["x", "y"])
    return sorted((r.x, r.y) for r in skyline2d(df, "x", "y", **kw).collect())


def test_skyline_random_cloud_matches_brute(spark):
    rnd = random.Random(42)
    pts = [(rnd.randint(0, 100), rnd.randint(0, 100)) for _ in range(400)]
    assert _run(spark, pts) == _brute(pts)


def test_skyline_diagonal_worst_case(spark):
    # every point is on the frontier — nothing may be dropped
    pts = [(i, 100 - i) for i in range(0, 101, 5)]
    assert _run(spark, pts, buckets=4, partitions=3) == sorted(pts)


def test_skyline_duplicates_and_ties(spark):
    # duplicates collapse to one frontier row; ties on one axis keep
    # only the point strictly better on the other
    pts = [(1, 5), (1, 5), (1, 3), (2, 3), (0, 9), (7, 1), (7, 0)]
    assert _run(spark, pts) == _brute(pts) == [(0, 9), (1, 3), (7, 0)]


def test_skyline_single_point_and_validation(spark):
    import pytest

    assert _run(spark, [(3, 4)]) == [(3, 4)]
    df = spark.createDataFrame([(1, 2)], ["x", "y"])
    with pytest.raises(ValueError):
        skyline2d(df, "x", "y", buckets=0)
