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


def _random_frames(seed: int):
    import random

    rng = random.Random(seed)
    left = [
        (k, float(rng.randint(0, 500)) + 0.5, i)  # .5 offsets: left ts
        for i, k in enumerate(rng.choices(["a", "b", "c"], k=80))
    ]
    right = sorted(
        {
            (k, float(t))
            for k in "abc"
            for t in rng.sample(range(0, 500), 25)
        }
    )
    right = [(k, t, j * 10) for j, (k, t) in enumerate(right)]
    return left, right


def test_forward_nearest_tolerance_match_pandas(spark):
    # differential vs pandas merge_asof on random data. Right ts are
    # unique per key (so pandas' duplicate-ts choice can't diverge
    # from our max-tiebreak rule); equidistant nearest ties are
    # impossible by construction (left ts sit on .5 offsets).
    import pandas as pd

    from metadata_ingestion_poc_spark.operators.asof import asof_join

    lrows, rrows = _random_frames(11)
    left = spark.createDataFrame(lrows, "k: string, ts: double, lid: long")
    right = spark.createDataFrame(rrows, "k: string, rts: double, pay: long")
    lpd = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "rts", "pay"]).sort_values("rts")

    for direction in ("backward", "forward", "nearest"):
        for tolerance in (None, 30.0):
            got = {
                r.lid: (r.r_rts, r.r_pay)
                for r in asof_join(
                    left,
                    right,
                    on=["k"],
                    left_ts="ts",
                    right_ts="rts",
                    right_payload=["pay"],
                    direction=direction,
                    tolerance=tolerance,
                ).collect()
            }
            exp_df = pd.merge_asof(
                lpd,
                rpd,
                left_on="ts",
                right_on="rts",
                by="k",
                direction=direction,
                tolerance=tolerance,
            )
            exp = {
                int(row.lid): (
                    None if pd.isna(row.rts) else row.rts,
                    None if pd.isna(row.pay) else int(row.pay),
                )
                for row in exp_df.itertuples()
            }
            assert got == exp, f"{direction} tol={tolerance}"


def test_forward_inclusive_and_tie_to_max_tiebreak(spark):
    from metadata_ingestion_poc_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10.0, 1)], "k: string, ts: double, lid: long")
    right = spark.createDataFrame(
        [("k", 10.0, 7), ("k", 10.0, 9), ("k", 12.0, 1)],
        "k: string, rts: double, pay: long",
    )
    row = asof_join(
        left, right, ["k"], "ts", "rts", ["pay"],
        tiebreak=["pay"], direction="forward",
    ).collect()[0]
    assert (row.r_rts, row.r_pay) == (10.0, 9)  # inclusive; max tiebreak


def test_nearest_equidistant_prefers_backward(spark):
    from metadata_ingestion_poc_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10.0, 1)], "k: string, ts: double, lid: long")
    right = spark.createDataFrame(
        [("k", 8.0, 100), ("k", 12.0, 200)], "k: string, rts: double, pay: long"
    )
    row = asof_join(
        left, right, ["k"], "ts", "rts", ["pay"], direction="nearest"
    ).collect()[0]
    assert (row.r_rts, row.r_pay) == (8.0, 100)


def test_timestamp_tolerance_boundary_is_inclusive_microsecond_exact(spark):
    from datetime import datetime

    from metadata_ingestion_poc_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 0, 0, 0), 1)],
        "k: string, ts: timestamp, lid: long",
    )
    right = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1, 0, 30, 0), 1),        # exactly 1800 s
            ("k", datetime(2024, 1, 1, 0, 30, 0, 1), 2),     # 1800 s + 1 µs
        ],
        "k: string, rts: timestamp, pay: long",
    )
    rows = asof_join(
        left, right, ["k"], "ts", "rts", ["pay"],
        direction="forward", tolerance=1800,
    ).collect()
    assert (rows[0].r_rts, rows[0].r_pay) == (datetime(2024, 1, 1, 0, 30, 0), 1)

    rows = asof_join(
        left,
        right.filter("pay = 2"),
        ["k"], "ts", "rts", ["pay"],
        direction="forward", tolerance=1800,
    ).collect()
    assert rows[0].r_rts is None  # 1 µs past tolerance → no match


def test_bad_direction_and_tolerance_raise(spark):
    import pytest as _pytest

    from metadata_ingestion_poc_spark.operators.asof import asof_join

    df = spark.createDataFrame([("k", 1.0, 1)], "k: string, ts: double, lid: long")
    with _pytest.raises(ValueError):
        asof_join(df, df, ["k"], "ts", "ts", [], direction="sideways")
    with _pytest.raises(ValueError):
        asof_join(df, df, ["k"], "ts", "ts", [], tolerance=-1)
