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


def _lr_frame(spark, n=400):
    """Planted boundary y = [x1 - x2 > 0] on a deterministic grid."""
    rows = [
        (float(i % 20 - 10) / 10.0, float((i * 7) % 20 - 10) / 10.0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "a double, b double")


def test_logreg_learns_planted_boundary(spark):
    from metadata_ingestion_poc_spark.operators.classify import logreg_gd

    df = _lr_frame(spark)
    out = logreg_gd(
        df,
        "a",
        "b",
        "CASE WHEN a - b > 0 THEN 1.0 ELSE 0.0 END",
        eta=1.0,
        iters=3,
    ).collect()
    assert [r["iter"] for r in out] == [0, 1, 2, 3]
    # iter 0 is the all-zero model; accuracy must improve materially
    assert out[0]["w0"] == out[0]["w1"] == out[0]["w2"] == 0.0
    assert out[-1]["accuracy"] > out[0]["accuracy"] + 0.2
    # learned slopes must carry the planted signs (+a, -b)
    assert out[-1]["w1"] > 0 and out[-1]["w2"] < 0
    # confusion counts always partition the corpus
    for r in out:
        assert r["tp"] + r["fp"] + r["tn"] + r["fn"] == 400


def test_logreg_partitioning_invariant(spark):
    from metadata_ingestion_poc_spark.operators.classify import logreg_gd

    df = _lr_frame(spark, n=120)
    y = "CASE WHEN a - b > 0 THEN 1.0 ELSE 0.0 END"

    def run(d):
        return [
            tuple(r)
            for r in logreg_gd(d, "a", "b", y, eta=1.0, iters=2).collect()
        ]

    assert run(df.repartition(1)) == run(df.repartition(11))


def test_auc_rank_sum_exact_cases(spark):
    from metadata_ingestion_poc_spark.operators.classify import auc_rank_sum

    def auc_of(rows):
        df = spark.createDataFrame(rows, "p double, y double")
        return auc_rank_sum(df, "p", "y").first()

    # perfect separation
    r = auc_of([(0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0)])
    assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2
    # perfect inversion
    assert auc_of([(0.1, 1.0), (0.9, 0.0)])["auc"] == 0.0
    # all scores tied -> midranks give exactly 0.5
    r = auc_of([(0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0)])
    assert r["auc"] == 0.5 and r["n_scores"] == 1
    # hand-computed mixed-tie case: pos ranks (midrank) sum
    #   scores: 0.1(neg), 0.4(pos,neg tie -> midrank 2.5), 0.7(pos)
    #   R+ = 2.5 + 4 = 6.5, AUC = (6.5 - 3) / (2*2) = 0.875
    r = auc_of([(0.1, 0.0), (0.4, 1.0), (0.4, 0.0), (0.7, 1.0)])
    assert abs(r["auc"] - 0.875) < 1e-15
