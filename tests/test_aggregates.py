from __future__ import annotations

import pyspark.sql.functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.queries import QUERIES


def test_approx_count_distinct_within_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r


def test_q18_runs(spark, sf_dir):
    rows = QUERIES["q18_approx_count_distinct"](spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(r.approx_orders > 0 and r.approx_median_price > 0 for r in rows)


def test_stratified_sample_fractions(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    totals = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
    sampled = {
        r.lang: r.n_sampled
        for r in QUERIES["q75_stratified_sample"](spark, sf_dir).collect()
    }
    for lang in sorted(totals):
        frac = 0.5 if ord(lang[0]) % 2 == 0 else 0.2
        expect = totals[lang] * frac
        assert abs(sampled.get(lang, 0) - expect) <= max(10, 0.5 * expect), (
            lang, sampled.get(lang), expect
        )


def test_stratified_sample_deterministic(spark, sf_dir):
    # pure function of the row: identical membership across partition
    # layouts (the property rand()/sampleBy cannot give)
    a = QUERIES["q75_stratified_sample"](spark, sf_dir).collect()
    b = QUERIES["q75_stratified_sample"](spark, sf_dir).collect()
    assert a == b
