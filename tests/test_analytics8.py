"""Semantic gates for the analytics8 batch (q266-q270).

The oracle sweep proves cross-engine value equality; these pin the
statistical contracts a green hash can't: split-conformal coverage
must actually sit near the nominal level on exchangeable data, and
the GD census must describe a learning trajectory."""

from __future__ import annotations

from metadata_ingestion_poc_spark.queries.analytics8 import (
    q269_logreg_gd,
    q270_conformal_interval,
)

SF_DIR = "/root/testdata/sf0.01"


def test_conformal_coverage_near_nominal(spark):
    rows = q270_conformal_interval(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per order priority
    for r in rows:
        # finite-sample guarantee: coverage >= 0.9 in expectation over
        # exchangeable splits; the hash split is as-if random, so allow
        # sampling noise around the nominal level but nothing cliff-y
        assert 0.84 <= r["coverage"] <= 0.97, r
        assert r["radius"] > 0
        assert r["n_train"] > r["n_cal"] > 0 and r["n_test"] > 0
        assert 0 <= r["covered"] <= r["n_test"]


def test_logreg_census_learns(spark):
    rows = q269_logreg_gd(spark, SF_DIR).collect()
    assert [r["iter"] for r in rows] == [0, 1, 2, 3, 4]
    # the planted boundary weights are (+, -): signs must be learned
    assert rows[-1]["w1"] > 0 and rows[-1]["w2"] < 0
    assert rows[-1]["accuracy"] > rows[0]["accuracy"] + 0.3


def test_logreg_auc_discriminates(spark):
    from metadata_ingestion_poc_spark.queries.analytics8 import (
        q271_logreg_auc,
    )

    r = q271_logreg_auc(spark, SF_DIR).first()
    # the planted boundary is recoverable: AUC must be far above chance
    assert r["auc"] > 0.9
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    # scores live on the (quantity x discount) grid
    assert r["n_scores"] <= 50 * 11


def test_logreg_calibration_bins(spark):
    from metadata_ingestion_poc_spark.queries.analytics8 import (
        q272_logreg_calibration,
    )

    rows = q272_logreg_calibration(spark, SF_DIR).collect()
    assert 2 <= len(rows) <= 10
    n = sum(r["n"] for r in rows)
    assert all(0.0 <= r["pos_rate"] <= 1.0 for r in rows)
    # monotone trend: the top bin must be far more positive than the
    # bottom bin (the scorer separates the planted classes)
    assert rows[-1]["pos_rate"] > rows[0]["pos_rate"] + 0.5
    assert n == sum(r["n_pos"] for r in rows) + sum(
        r["n"] - r["n_pos"] for r in rows
    )


def test_ridge_cv_matches_numpy_loo_fit(spark):
    """The leave-fold-out-by-subtraction trick must equal a direct
    out-of-fold numpy ridge fit (fold 0, sf0.001)."""
    import numpy as np

    from metadata_ingestion_poc_spark.operators.clustering import (
        _HASH_MOD,
        _HASH_MULT,
    )
    from metadata_ingestion_poc_spark.queries.analytics8 import q273_ridge_cv

    sf = "/root/testdata/sf0.001"
    got = {r["fold"]: r for r in q273_ridge_cv(spark, sf).collect()}
    assert sorted(got) == [0, 1, 2, 3, 4]

    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .selectExpr(
            "l_quantity AS q",
            "l_discount AS d",
            "l_extendedprice AS p",
            "l_orderkey * 10 + l_linenumber AS key",
        )
        .collect()
    )
    rows = [
        (r["q"], r["d"], r["p"])
        for r in li
        if ((r["key"] % _HASH_MOD) * _HASH_MULT % _HASH_MOD) % 5 != 0
    ]
    X = np.array([[1.0, round(q, 2), round(d, 2)] for q, d, _ in rows])
    y = np.array([round(p, 2) for _, _, p in rows])
    A = X.T @ X + np.diag([0.0, 1000.0, 1000.0])
    w = np.linalg.solve(A, X.T @ y)
    for j, name in enumerate(["w0", "w1", "w2"]):
        assert abs(got[0][name] - w[j]) < 1e-7 * max(1.0, abs(w[j]))
    # held-out sizes partition the corpus ~evenly
    n = sum(r["n_test"] for r in got.values())
    assert all(0.1 < r["n_test"] / n < 0.3 for r in got.values())
    assert all(r["mse_k"] > 0 for r in got.values())
