from __future__ import annotations

import pyspark.sql.functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (r.n, float(r.s))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, float(r.s))
        for r in salted_agg(
            li,
            keys=["l_returnflag"],
            partial_aggs=[
                F.count(F.lit(1)).alias("pc"),
                F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("ps"),
            ],
            final_aggs=[F.sum("pc").alias("n"), F.sum("ps").alias("s")],
            salt_buckets=16,
            salt_source="l_orderkey",
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(
            o.withColumnRenamed("o_custkey", "k"),
            c.withColumnRenamed("c_custkey", "k"),
            on=["k"],
            salt_buckets=4,
        )
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_agg_spreads_hot_key(spark):
    """A 100%-skewed key still produces correct results through salting."""
    df = spark.range(10_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    out = salted_agg(
        df,
        keys=["k"],
        partial_aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pc")],
        final_aggs=[F.sum("ps").alias("total"), F.sum("pc").alias("n")],
        salt_buckets=8,
        salt_source="v",
    ).first()
    assert out.total == sum(range(10_000))
    assert out.n == 10_000


def test_partition_histogram_counts_all_rows(spark):
    from metadata_ingestion_poc_spark.operators.skew import (
        partition_histogram,
    )

    df = spark.range(0, 1000).repartition(8)
    h = partition_histogram(df).collect()
    assert sum(r.n_rows for r in h) == 1000
    assert len(h) <= 8
    assert all(r.n_rows > 0 for r in h)


def test_skew_ratio_flags_hot_key(spark):
    from pyspark.sql import functions as F

    from metadata_ingestion_poc_spark.operators.skew import skew_ratio

    df = spark.range(0, 1100).withColumn(
        "k", F.when(F.col("id") < 1000, F.lit(0)).otherwise(F.col("id"))
    )
    r = skew_ratio(df, ["k"]).collect()[0]
    assert r.n_keys == 101
    assert r.max_rows == 1000
    assert r.skew_ratio >= 100


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime skew handling: with AQE skew-join on, a join against a
    hot key is split at execution time — the final adaptive plan
    carries the skew=true marker instead of one straggler partition.
    (Static salting in operators/skew.py is the planned-ahead lever;
    this pins the runtime fallback actually engaging.)"""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # 200k rows, ~95% on key 0 → one hot shuffle partition
        big = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        small = spark.range(2_000).select(F.col("id").alias("k"))
        joined = big.join(small, "k")
        # execute THIS DataFrame's QueryExecution (count() would spawn
        # a separate one and the inspected plan would never have run)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_agg_hot_key_actually_fans_out(spark):
    """Adversarial skew: 100% of rows share one key. Correctness under
    salting is pinned above; THIS pins the load-balancing claim itself —
    phase 1 must really spread the hot key over all salt_buckets
    reducer groups (counted through the public API: the number of
    partial rows merged per key IS the number of distinct salts hit),
    and no bucket may hold more than 2x the uniform share. A salt
    formula that quietly collapsed to a constant would keep results
    identical while resurrecting the straggler."""
    n, buckets = 16_000, 16
    df = spark.range(n).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    out = salted_agg(
        df,
        keys=["k"],
        partial_aggs=[F.count(F.lit(1)).alias("pc")],
        final_aggs=[
            F.count(F.lit(1)).alias("n_partials"),
            F.max("pc").alias("max_bucket"),
            F.sum("pc").alias("n_rows"),
        ],
        salt_buckets=buckets,
        salt_source="v",
    ).first()
    assert out.n_rows == n
    assert out.n_partials == buckets  # every salt bucket engaged
    assert out.max_bucket <= 2 * (n // buckets)  # no bucket >2x fair share


def test_salted_agg_null_key_and_null_salt_source(spark):
    """NULL keys form their own group (groupBy semantics) and NULL
    salt-source values hash to one bucket — both must survive the
    two-phase split with exact totals."""
    df = spark.range(3_000).select(
        F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(F.lit("k")).alias("k"),
        F.when(F.col("id") % 5 == 0, F.lit(None))
        .otherwise(F.col("id"))
        .cast("long")
        .alias("src"),
        F.lit(1).alias("v"),
    )
    rows = {
        r["k"]: r["n"]
        for r in salted_agg(
            df,
            keys=["k"],
            partial_aggs=[F.count(F.lit(1)).alias("pc")],
            final_aggs=[F.sum("pc").alias("n")],
            salt_buckets=8,
            salt_source="src",
        ).collect()
    }
    assert rows == {None: 1_000, "k": 2_000}


def test_salted_agg_constant_salt_source_degrades_safely(spark):
    """Worst-case salt source (a constant, perfectly correlated with
    the hot key): fan-out degrades to one bucket — the documented
    failure mode — but the merged result stays exact."""
    df = spark.range(5_000).select(
        F.lit("hot").alias("k"), F.lit(7).alias("c"), F.col("id").alias("v")
    )
    out = salted_agg(
        df,
        keys=["k"],
        partial_aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pc")],
        final_aggs=[
            F.sum("ps").alias("total"),
            F.sum("pc").alias("n"),
            F.count(F.lit(1)).alias("n_partials"),
        ],
        salt_buckets=8,
        salt_source="c",
    ).first()
    assert out.total == sum(range(5_000))
    assert out.n == 5_000
    assert out.n_partials == 1  # degenerate spread, correct merge
