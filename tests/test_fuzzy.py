"""Blocked fuzzy join: equivalence to brute force (the completeness
claim), distance gating, and dedup of multi-block matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.operators.fuzzy import fuzzy_join_blocked

NAMES = [
    "red widget", "blue widget", "red bolt", "small ring", "mall ring",
    "hot gear", "hot gea", "big gizmo", "big gizmos",
]


def _tbl(spark, col, vals):
    return spark.createDataFrame([(v,) for v in vals], [col])


def test_blocked_equals_bruteforce_dist1(spark):
    left = _tbl(spark, "a", NAMES)
    right = _tbl(spark, "b", NAMES)
    blocked = {
        (r.a, r.b, r.dist)
        for r in fuzzy_join_blocked(left, right, "a", "b", 1).collect()
    }
    brute = {
        (r.a, r.b, r.dist)
        for r in left.crossJoin(right)
        .withColumn("dist", F.levenshtein("a", "b"))
        .filter(F.col("dist") <= 1)
        .collect()
    }
    # completeness for two-token strings at dist<=1 (pigeonhole on the
    # single edit): the blocked plan IS the brute-force result
    assert blocked == brute
    assert ("hot gear", "hot gea", 1) in blocked
    assert ("small ring", "mall ring", 1) in blocked
    assert ("red widget", "blue widget", 3) not in blocked


def test_identical_strings_single_row(spark):
    # matches via BOTH first- and last-token blocks -> must dedupe
    left = _tbl(spark, "a", ["red widget"])
    right = _tbl(spark, "b", ["red widget"])
    out = fuzzy_join_blocked(left, right, "a", "b", 1).collect()
    assert len(out) == 1 and out[0].dist == 0


def test_length_band_prunes_before_levenshtein(spark):
    left = _tbl(spark, "a", ["red widget"])
    right = _tbl(spark, "b", ["red widgetxxxx"])  # len diff 4 > max_dist
    assert fuzzy_join_blocked(left, right, "a", "b", 1).collect() == []


def test_extra_columns_carried_through(spark):
    left = spark.createDataFrame([(7, "hot gear")], ["lid", "a"])
    right = spark.createDataFrame([(9, "hot gea")], ["rid", "b"])
    out = fuzzy_join_blocked(left, right, "a", "b", 1).collect()
    assert [(r.lid, r.rid, r.dist) for r in out] == [(7, 9, 1)]
