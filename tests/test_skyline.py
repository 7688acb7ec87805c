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


def test_functional_dependencies_profile(spark):
    from metadata_ingestion_poc_spark.operators.quality import (
        functional_dependencies,
    )
    import pytest

    df = spark.createDataFrame(
        [
            (1, "a"), (1, "a"),        # holds for key 1
            (2, "a"), (2, "b"),        # violated (2 values)
            (3, None), (3, "c"),       # null rhs counts as a value
            (None, "x"),               # null lhs excluded
        ],
        ["x", "y"],
    )
    out = functional_dependencies([(df, "x", "y", "fd")]).collect()[0]
    assert (out.n_lhs, out.n_violating, out.max_rhs_per_lhs) == (3, 2, 2)
    assert out.violation_rate == pytest.approx(2 / 3, abs=1e-6)
    with pytest.raises(ValueError):
        functional_dependencies([])
    with pytest.raises(ValueError):
        functional_dependencies([(df, "x", "y", "d"), (df, "y", "x", "d")])


# ---------------------------------------------------------------------------
# property-based: skyline and k-core vs brute-force models on
# arbitrary small graphs/clouds (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_POINTS = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_POINTS)
def test_skyline_property_matches_brute(spark, pts):
    assert _run(spark, pts, buckets=3, partitions=2) == _brute(pts)


def _brute_kcore_rounds(edges, k, rounds):
    es = {
        (min(u, v), max(u, v)) for u, v in edges if u != v
    }
    for _ in range(rounds):
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        es = {(a, b) for a, b in es if a in keep and b in keep}
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return dict(deg)


_EDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_EDGES, st.integers(1, 4))
def test_kcore_property_matches_model(spark, edges, k):
    from metadata_ingestion_poc_spark.operators.graph import kcore

    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r.node: r.deg for r in kcore(df, k=k, rounds=3).collect()
    }
    assert got == _brute_kcore_rounds(edges, k, 3)


def test_fd_audit_keeps_empty_dependency_row(spark):
    """Round-8 review fix: a dependency whose lhs is entirely NULL
    (or whose table is empty) must still get its output row
    (n_lhs=0) — the grouped-rollup rewrite had silently dropped it."""
    import pyspark.sql.functions as F

    from metadata_ingestion_poc_spark.operators.quality import (
        functional_dependencies,
    )

    ok = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "x long, y string"
    )
    empty = spark.createDataFrame([], "x long, y string")
    all_null = spark.createDataFrame(
        [(None, "a")], "x long, y string"
    )
    rows = {
        r["dep"]: r
        for r in functional_dependencies(
            [
                (ok, "x", "y", "ok"),
                (empty, "x", "y", "empty_dep"),
                (all_null, "x", "y", "null_lhs"),
            ]
        ).collect()
    }
    assert set(rows) == {"ok", "empty_dep", "null_lhs"}
    assert rows["ok"]["n_lhs"] == 2 and rows["ok"]["n_violating"] == 1
    for name in ("empty_dep", "null_lhs"):
        assert rows[name]["n_lhs"] == 0
        assert rows[name]["n_violating"] == 0
        assert rows[name]["violation_rate"] is None
        assert rows[name]["max_rhs_per_lhs"] is None
