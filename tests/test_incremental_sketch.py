"""Tests for incremental cross-set dedup and HLL sketch rollups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.operators.dedup import (
    ngram_jaccard_pairs_against,
)


def test_incremental_pairs_are_cross_set_only(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    rows = ngram_jaccard_pairs_against(
        batch, corpus, id_col="doc_id", n=3, threshold=0.2, max_shingle_df=20
    ).collect()
    assert rows, "fixture corpus contains cross-set near-dups"
    for r in rows:
        assert r.batch_id % 2 == 1
        assert r.corpus_id % 2 == 0
        assert 0.2 <= r.jaccard <= 1.0


def test_incremental_finds_planted_duplicate(spark):
    corpus = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different words about spark shuffles and joins")],
        "doc_id: long, text: string",
    )
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (3, "nothing like anything in the corpus at all here")],
        "doc_id: long, text: string",
    )
    got = {
        (r.batch_id, r.corpus_id): r.jaccard
        for r in ngram_jaccard_pairs_against(
            batch, corpus, id_col="doc_id", n=3, threshold=0.5
        ).collect()
    }
    assert got == {(1, 0): 1.0}


def test_hll_rollup_error_bound_and_merge_consistency(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = {
        r.event_type: r.est
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    direct = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    # register-max merge is exact: rollup of daily sketches must equal
    # the sketch of the raw stream
    assert merged == direct
    for t, n in exact.items():
        assert merged[t] == pytest.approx(n, rel=0.05)
