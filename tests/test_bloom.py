"""Bloom-filter join pruning (operators/bloom.py).

Contract under test:
- no false negatives: join-after-prune ≡ plain join (the transparent-
  prune guarantee q167's oracle also checks at driver level);
- bounded false positives: survivor count stays near the true match
  count when the filter is sized generously;
- merge is exact: bloom(a ∪ b) == merge(bloom(a), bloom(b)) word for
  word (the partial-build/rollup property);
- geometry hygiene: mismatched merges and malformed parameters raise
  instead of silently corrupting the bit space;
- plan shape: the probe side broadcasts the filter (BroadcastExchange)
  and never shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_prune,
)


@pytest.fixture(scope="module")
def sides(spark):
    small = spark.range(500).select((F.col("id") * 7).alias("k"))
    big = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    )
    return small, big


def test_no_false_negatives(spark, sides):
    small, big = sides
    bf = bloom_build(small, "k", num_bits=1 << 16, num_hashes=5)
    pruned = bloom_prune(big, bf, "k")
    exact = sorted(big.join(small, "k").collect())
    after = sorted(pruned.join(small, "k").collect())
    assert exact == after and len(exact) == 500


def test_false_positive_rate_bounded(spark, sides):
    small, big = sides
    # m=2^16, k=5, n=500 → theoretical FPR ≈ 2.7e-7; allow huge slack
    bf = bloom_build(small, "k", num_bits=1 << 16, num_hashes=5)
    survivors = bloom_prune(big, bf, "k").count()
    true_matches = big.join(small, "k").count()
    assert true_matches <= survivors <= true_matches + 0.01 * 20000


def test_null_keys_dropped(spark):
    probe = spark.createDataFrame(
        [(1,), (None,), (2,)], "k: bigint"
    )
    bf = bloom_build(
        spark.range(5).select(F.col("id").alias("k")), "k", num_bits=1 << 10
    )
    kept = [r["k"] for r in bloom_prune(probe, bf, "k").collect()]
    assert None not in kept and set(kept) == {1, 2}


def test_merge_equals_whole(spark):
    a = spark.range(300).select(F.col("id").alias("k"))
    b = spark.range(300, 700).select(F.col("id").alias("k"))
    whole = bloom_build(a.union(b), "k", num_bits=1 << 12, num_hashes=3)
    merged = bloom_merge(
        bloom_build(a, "k", num_bits=1 << 12, num_hashes=3),
        bloom_build(b, "k", num_bits=1 << 12, num_hashes=3),
    )
    assert list(whole.collect()[0]["words"]) == list(
        merged.collect()[0]["words"]
    )


def test_merge_geometry_mismatch_raises(spark):
    a = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="geometries differ"):
        bloom_merge(
            bloom_build(a, "k", num_bits=1 << 12),
            bloom_build(a, "k", num_bits=1 << 13),
        )


def test_bad_parameters_raise(spark):
    a = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(a, "k", num_bits=100)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_build(a, "k", num_hashes=0)


def test_empty_build_prunes_everything(spark, sides):
    _, big = sides
    bf = bloom_build(
        spark.range(0).select(F.col("id").alias("k")), "k", num_bits=256
    )
    assert bloom_prune(big, bf, "k").count() == 0


def test_repartition_invariance(spark, sides):
    small, big = sides
    w1 = bloom_build(small, "k", num_bits=1 << 12).collect()[0]["words"]
    w2 = bloom_build(small.repartition(7), "k", num_bits=1 << 12).collect()[
        0
    ]["words"]
    assert list(w1) == list(w2)


def test_plan_broadcasts_filter_no_probe_shuffle(spark, sides):
    small, big = sides
    bf = bloom_build(small, "k", num_bits=1 << 12)
    plan = (
        bloom_prune(big, bf, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    # probe rows stream straight into the broadcast cross join; every
    # non-broadcast exchange in the plan belongs to the filter build
    # (its tiny word groupBy + the single-row densify), so the whole
    # prune adds at most those two — never a probe-side shuffle.
    non_broadcast = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    ]
    assert len(non_broadcast) <= 2, plan
    assert "BroadcastNestedLoopJoin" in plan
