"""Unit gates for operators/pca.py: eigenvector recovery on a known
covariance structure, partitioning invariance, and the symmetric
expansion of the upper-triangle sketch."""

from __future__ import annotations

import pytest

from metadata_ingestion_poc_spark.operators.pca import (
    covariance_upper,
    dim_means,
    pca_top_component,
    power_iteration,
)


def _stretched(spark, n=200):
    """Points along the (1, 1, 0, 0)/sqrt(2) axis with small noise in
    the other dims — the top component is known analytically."""
    rows = []
    for i in range(n):
        t = (i - n / 2) / 10.0  # dominant direction, var ~ 33
        e1 = ((i * 7) % 5 - 2) / 10.0  # small orthogonal noise
        e2 = ((i * 13) % 7 - 3) / 10.0
        rows.append((i, [t + e1, t - e1, e2, -e2]))
    return spark.createDataFrame(rows, "id long, vec array<double>")


def test_top_component_recovers_dominant_axis(spark):
    df = _stretched(spark)
    loadings, eig = pca_top_component(df, "vec", dims=4, iterations=8)
    s = 2 ** -0.5
    want = [s, s, 0.0, 0.0]
    got = loadings if loadings[0] > 0 else [-x for x in loadings]
    assert got == pytest.approx(want, abs=0.01)
    assert eig > 10.0  # dominant variance is ~2x the per-coord var


def test_covariance_partitioning_invariant(spark):
    df = _stretched(spark, n=80)
    n = df.count()
    m1 = dim_means(df.repartition(1), "vec", n)
    m2 = dim_means(df.repartition(13, "id"), "vec", n)
    assert m1 == m2
    c1 = covariance_upper(df.repartition(1), "vec", 4, m1, n)
    c2 = covariance_upper(df.repartition(13, "id"), "vec", 4, m2, n)
    assert c1 == c2
    assert set(c1) == {(i, j) for i in range(1, 5) for j in range(i, 5)}


def test_covariance_diagonal_is_variance(spark):
    """Cov(i, i) must equal the sample variance of dim i (computed
    independently from the same rounding discipline)."""
    df = _stretched(spark, n=60)
    n = df.count()
    means = dim_means(df, "vec", n)
    cov = covariance_upper(df, "vec", 4, means, n)
    vals = [r["vec"] for r in df.collect()]
    for d in range(4):
        ssq = sum(
            round((v[d] - means[d]) * (v[d] - means[d]), 6) for v in vals
        )
        assert cov[(d + 1, d + 1)] == pytest.approx(
            ssq / (n - 1), abs=2e-6
        )


def test_power_iteration_identity_like_matrix():
    """On a diagonal matrix the iteration must converge to the axis of
    the largest entry, eigenvalue equal to it."""
    cov = {(i, i): 0.1 for i in range(1, 5)}
    cov[(3, 3)] = 7.0
    v, eig = power_iteration(cov, dims=4, iterations=12)
    assert abs(v[2]) == pytest.approx(1.0, abs=1e-4)
    assert eig == pytest.approx(7.0, abs=1e-3)
