from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from metadata_ingestion_poc_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01 10:00"), lbl="a"),
            Row(k=1, ts=_ts("2024-01-01 12:00"), lbl="b"),
            Row(k=2, ts=_ts("2024-01-01 09:00"), lbl="c"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01 09:30"), v=1.0),
            Row(k=1, ts=_ts("2024-01-01 11:00"), v=2.0),
            Row(k=2, ts=_ts("2024-01-01 10:00"), v=3.0),  # after left → no match
        ]
    )
    out = {
        r.lbl: (r.r_ts, r.r_v)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_payload=["v"],
        ).collect()
    }
    assert out["a"] == (_ts("2024-01-01 09:30"), 1.0)
    assert out["b"] == (_ts("2024-01-01 11:00"), 2.0)
    assert out["c"] == (None, None)  # left outer: unmatched row kept


def test_asof_join_inclusive_on_equal_ts(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 10:00"), lbl="x")])
    right = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 10:00"), v=9.0)])
    r = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_payload=["v"]
    ).first()
    assert r.r_v == 9.0


def test_asof_join_row_count_preserved(spark):
    left = spark.range(100).selectExpr(
        "id % 5 AS k", "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts", "id"
    )
    right = spark.range(10).selectExpr(
        "id % 5 AS k",
        "timestamp_micros(CAST(id * 7000000 AS LONG)) AS ts",
        "id * 10 AS v",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_payload=["v"]
    )
    assert out.count() == 100
