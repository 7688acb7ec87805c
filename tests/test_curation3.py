"""Property tests for the third curation batch (q131-q137).

The value oracle is the driver's DuckDB differential; these tests pin
the operator-level invariants that survive any corpus: probability
bounds, conservation (splits partition the corpus), monotonicity, and
determinism under repartitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.queries import QUERIES


def test_bigram_lm_score_bounds_and_counts(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_toks = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id", F.size(F.split(F.lower(F.trim("text")), " ")).alias("n")
        ).collect()
    }
    rows = QUERIES["q131_bigram_lm_score"](spark, sf_dir).collect()
    assert len(rows) == sum(1 for n in n_toks.values() if n >= 2)
    for r in rows:
        # log-probs are strictly negative (smoothed P < 1 always)
        assert r.lm_score < 0, r
        assert r.n_bigrams == n_toks[r.doc_id] - 1, r


def test_lexical_diversity_invariants(spark, sf_dir):
    rows = QUERIES["q132_lexical_diversity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_types <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_types
        assert 0.0 < r.ttr <= 1.0
        assert 0.0 <= r.hapax_ratio <= 1.0


def test_vocab_growth_monotone_and_conserves(spark, sf_dir):
    from metadata_ingestion_poc_spark.operators.dedup import shingles

    rows = QUERIES["q133_vocab_growth"](spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r.bucket)
    cums = [r.cum_terms for r in rows]
    assert cums == sorted(cums)
    assert sum(r.new_terms for r in rows) == cums[-1]
    d = load_table(spark, sf_dir, "documents")
    total_types = (
        shingles(d, n=5)
        .select(F.explode("shingles").alias("s"))
        .distinct()
        .count()
    )
    assert cums[-1] == total_types


def test_gopher_rules_flags_consistent(spark, sf_dir):
    rows = QUERIES["q134_gopher_quality_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.passes == (
            r.flag_len and r.flag_word_len and r.flag_stop and r.flag_rep
        )
    # thresholds are tuned so the filter actually discriminates
    outcomes = {r.passes for r in rows}
    assert outcomes == {True, False}, "filter must split the corpus"


def test_source_kl_nonnegative(spark, sf_dir):
    rows = QUERIES["q135_source_kl_divergence"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Gibbs: KL >= 0 up to the 6dp per-term rounding
        assert r.kl >= -1e-4, r


def test_cross_source_containment_bounds(spark, sf_dir):
    rows = QUERIES["q136_cross_source_contamination"](spark, sf_dir).collect()
    assert rows
    seen = {(r.source_a, r.source_b) for r in rows}
    for r in rows:
        assert r.source_a != r.source_b
        assert 0 < r.n_common <= r.n_a
        assert 0.0 < r.containment <= 1.0
        # intersection is symmetric, so the reverse pair exists too
        assert (r.source_b, r.source_a) in seen


def test_dataset_split_partitions_corpus(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    total = d.count()
    rows = QUERIES["q137_dataset_split"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == total
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) <= {"train", "val", "test"}
    # 80/10/10 within sampling noise
    assert abs(by_split["train"] / total - 0.8) < 0.08
    # membership is a pure function of the id: repartition-invariant
    again = QUERIES["q137_dataset_split"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bpe_ish_token_count_pinned_cases(spark):
    from pyspark.sql import Row

    from metadata_ingestion_poc_spark.operators.text import (
        bpe_ish_token_count,
    )

    cases = [
        # (text, expected tokens per the pattern's alternation order)
        ("hello world", 2),          # " world" attaches its space
        ("it's fine", 3),            # it / 's / " fine"
        ("a1b2", 4),                 # a / 1 / b / 2
        ("wait... what?!", 4),       # wait / ... / " what" / ?!
        ("price: 42 dollars", 4),    # price / : / " 42" / " dollars"
        ("", 0),
    ]
    rows = [Row(doc_id=i, text=t) for i, (t, _) in enumerate(cases)]
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_ish_token_count(spark.createDataFrame(rows)).collect()
    }
    for i, (t, exp) in enumerate(cases):
        assert out[i] == exp, f"{t!r}: got {out[i]}, want {exp}"
