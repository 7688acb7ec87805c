from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from metadata_ingestion_poc_spark.operators.scd import scd2_init, scd2_merge


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _history(spark):
    snap = spark.createDataFrame(
        [
            Row(k=1, city="madrid", ts=_ts("2024-01-01")),
            Row(k=2, city="paris", ts=_ts("2024-01-01")),
        ]
    )
    return scd2_init(snap, keys=["k"], attrs=["city"], ts_col="ts")


def test_scd2_change_closes_and_inserts(spark):
    hist = _history(spark)
    batch = spark.createDataFrame(
        [
            Row(k=1, city="berlin", ts=_ts("2024-02-01")),  # changed
            Row(k=2, city="paris", ts=_ts("2024-02-01")),   # unchanged
            Row(k=3, city="tokyo", ts=_ts("2024-02-01")),   # new key
        ]
    )
    out = scd2_merge(hist, batch, keys=["k"], attrs=["city"], change_ts_col="ts")
    rows = {(r.k, r.city): (r.valid_from, r.valid_to) for r in out.collect()}

    assert rows[(1, "madrid")] == (_ts("2024-01-01"), _ts("2024-02-01"))  # closed
    assert rows[(1, "berlin")] == (_ts("2024-02-01"), None)  # new open version
    assert rows[(2, "paris")] == (_ts("2024-01-01"), None)  # untouched
    assert rows[(3, "tokyo")] == (_ts("2024-02-01"), None)  # brand new
    assert len(rows) == 4


def test_scd2_idempotent_for_identical_batch(spark):
    hist = _history(spark)
    batch = spark.createDataFrame([Row(k=1, city="madrid", ts=_ts("2024-03-01"))])
    out = scd2_merge(hist, batch, keys=["k"], attrs=["city"], change_ts_col="ts")
    # identical attrs → no close, no insert
    assert out.count() == hist.count()
    assert out.filter("valid_to IS NOT NULL").count() == 0


def test_scd2_multiple_generations(spark):
    hist = _history(spark)
    b1 = spark.createDataFrame([Row(k=1, city="berlin", ts=_ts("2024-02-01"))])
    b2 = spark.createDataFrame([Row(k=1, city="lisbon", ts=_ts("2024-03-01"))])
    hist = scd2_merge(hist, b1, keys=["k"], attrs=["city"], change_ts_col="ts")
    hist = scd2_merge(hist, b2, keys=["k"], attrs=["city"], change_ts_col="ts")
    k1 = sorted(
        [(r.city, r.valid_from, r.valid_to) for r in hist.filter("k = 1").collect()],
        key=lambda t: t[1],
    )
    assert [c for c, *_ in k1] == ["madrid", "berlin", "lisbon"]
    assert k1[0][2] == _ts("2024-02-01")
    assert k1[1][2] == _ts("2024-03-01")
    assert k1[2][2] is None  # current version open
