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
