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
