"""Property-based checks (hypothesis) for the engine's algebraic
invariants: decimal-sum partition independence, dedup idempotence,
top-k containment, as-of ordering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metadata_ingestion_poc_spark.functions.determinism import DEC
from metadata_ingestion_poc_spark.operators.dedup import exact_dedup

_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(_floats, min_size=1, max_size=60), parts=st.integers(1, 7))
@_settings
def test_decimal_sum_is_partition_independent(spark, vals, parts):
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    a = df.coalesce(1).agg(F.sum(F.col("x").cast(DEC)).alias("s")).first().s
    b = df.repartition(parts).agg(F.sum(F.col("x").cast(DEC)).alias("s")).first().s
    assert a == b


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=50
    )
)
@_settings
def test_exact_dedup_idempotent_and_minimal(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    d1 = exact_dedup(df, ["k"], ["v"])
    d2 = exact_dedup(d1, ["k"], ["v"])
    got = sorted(map(tuple, d1.collect()))
    assert got == sorted(map(tuple, d2.collect()))
    # winner per key is the minimum v (order_cols order)
    expect = {}
    for k, v in rows:
        expect[k] = min(v, expect.get(k, v))
    assert got == sorted(expect.items())


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    ),
    k=st.integers(1, 5),
)
@_settings
def test_topk_per_group_contained_and_sized(spark, rows, k):
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, ["g", "v"])
    w = Window.partitionBy("g").orderBy(F.desc("v"))
    top = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "v")
    )
    got = {tuple(r) for r in top.collect()}
    src = {tuple(r) for r in df.collect()}
    assert got <= src
    by_g: dict[int, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        want = set(sorted(vs, reverse=True)[:k])
        assert {v for gg, v in got if gg == g} == want
