"""True Structured Streaming tests: file-source micro-batches with the
availableNow trigger, checked against the identical batch plans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.streaming.pipeline import (
    dedup_within_watermark,
    read_stream,
    stream_upsert_to_hub,
)
from metadata_ingestion_poc_spark.streaming.windows import tumbling_counts
from metadata_ingestion_poc_spark.writer import read_hub


@pytest.fixture()
def event_dir(spark, sf_dir, tmp_path):
    """Events re-materialized as a multi-file parquet dir (a stream
    source needs a directory it can discover files in)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_stream")
    ev.repartition(4).write.parquet(path)
    return path, ev.schema, ev


def test_streaming_tumbling_counts_equal_batch(spark, tmp_path, event_dir):
    path, schema, ev = event_dir
    stream = read_stream(spark, path, schema, max_files_per_trigger=2)
    agg = tumbling_counts(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in tumbling_counts(ev, "1 hour").collect()
    }
    assert got == want


def test_streaming_dedup_within_watermark(spark, tmp_path, event_dir):
    path, schema, ev = event_dir
    # duplicate the stream source: same dir read twice via union of two
    # copies written to one dir → here simpler: write the same files again
    ev.limit(200).write.mode("append").parquet(path)

    stream = read_stream(spark, path, schema)
    deduped = dedup_within_watermark(stream, ["event_id"], "ts", "24 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT COUNT(DISTINCT event_id) AS n FROM dedup_test").first().n
    total = spark.sql("SELECT COUNT(*) AS n FROM dedup_test").first().n
    assert n == total  # no key appears twice post-dedup
    assert total == ev.count()


def test_stream_upsert_foreachbatch(spark, tmp_path, event_dir):
    path, schema, ev = event_dir
    stream = read_stream(spark, path, schema)
    latest = stream.select("user_id", "ts", "event_type", "value")
    hub = str(tmp_path / "hub_events")
    q = stream_upsert_to_hub(
        latest, hub, keys=["user_id"], checkpoint_dir=str(tmp_path / "ckpt_up"),
        order_col="ts",
    )
    q.awaitTermination(120)
    out = read_hub(spark, hub)
    assert out.count() == out.select("user_id").distinct().count()
    assert out.count() == ev.select("user_id").distinct().count()

def test_stream_fold_rollup_matches_batch(spark, tmp_path, event_dir):
    # multi-micro-batch stream folded through foreachBatch must equal a
    # single batch rollup over the same events — proves the additive
    # fold + per-batch idempotence markers compose under real epoch ids.
    from metadata_ingestion_poc_spark.operators.rollup import (
        read_rollup,
        rollup_batch,
    )
    from metadata_ingestion_poc_spark.streaming.pipeline import (
        stream_fold_rollup,
    )

    path, schema, ev = event_dir
    rollup_path = str(tmp_path / "rollup_stream")
    stream = read_stream(spark, path, schema, max_files_per_trigger=1)
    q = stream_fold_rollup(
        stream, rollup_path, checkpoint_dir=str(tmp_path / "ckpt_rollup")
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 4))
        for r in read_rollup(spark, rollup_path).collect()
    }
    batch = rollup_batch(ev)
    want = {
        (r.window_start, r.event_type): (
            r.n_events,
            round(float(r.sum_value), 4),
        )
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
