"""Unit gates for operators/classify.py (aggregation-trained NB).

The oracle sweep (q266) proves the full posterior table vs DuckDB;
these pin the operator contracts a green hash can't isolate: that a
separable planted corpus is actually classified correctly, that the
model grid is densified (zero-count pairs carry the smoothing floor),
and that scores are partitioning-invariant (the decimal discipline)."""

from __future__ import annotations

import pyspark.sql.functions as F

from metadata_ingestion_poc_spark.operators.classify import (
    naive_bayes_model,
    naive_bayes_score,
)


def _corpus(spark):
    """Two clearly separable classes + one ambiguous shared token."""
    rows = []
    for i in range(20):
        rows.append((i, "a", "apple apple shared banana"))
        rows.append((100 + i, "b", "zebra zebra shared yak"))
    # one doc of each class with ONLY the shared token — prior decides
    rows.append((200, "a", "shared shared"))
    rows.append((201, "b", "shared"))
    return spark.createDataFrame(rows, "id long, label string, text string")


def test_planted_classes_recovered(spark):
    docs = _corpus(spark)
    model, priors = naive_bayes_model(docs, "text", "label")
    pred = naive_bayes_score(docs, model, priors, "text", "id", "label")
    rows = {r["id"]: r for r in pred.collect()}
    assert len(rows) == 42
    for i in range(20):
        assert rows[i]["pred_label"] == "a"
        assert rows[100 + i]["pred_label"] == "b"
        assert rows[i]["margin"] > 0
    # margin is best-minus-runner-up: strictly positive unless tied
    assert all(r["margin"] >= 0 for r in rows.values())


def test_model_grid_is_densified(spark):
    docs = _corpus(spark)
    model, _ = naive_bayes_model(docs, "text", "label")
    m = model.collect()
    labels = {r["label"] for r in m}
    toks = {r["tok"] for r in m}
    # full grid: every (label, token) pair, including zero counts
    assert len(m) == len(labels) * len(toks)
    # zero-count pair ("b", "apple") must carry the smoothing floor,
    # strictly below every observed-count conditional for that label
    lp = {(r["label"], r["tok"]): r["lp"] for r in m}
    assert lp[("b", "apple")] < lp[("b", "zebra")]


def test_scores_partitioning_invariant(spark):
    docs = _corpus(spark)

    def run(df):
        model, priors = naive_bayes_model(df, "text", "label")
        out = naive_bayes_score(df, model, priors, "text", "id", "label")
        return sorted(
            (r["id"], r["pred_label"], r["score"], r["margin"])
            for r in out.collect()
        )

    assert run(docs.repartition(1)) == run(docs.repartition(13, "id"))
