"""Stream-stream attribution join: availableNow micro-batches vs the
identical batch plan.

Inner join: every matched pair emits exactly once regardless of
micro-batching → exact equality with batch. Left outer: unmatched rows
need the watermark to PROVE no match can arrive, so only the stream's
older region emits null-matches before input ends — matched rows must
agree exactly, emitted unmatched rows must be a subset of the batch
left-join's unmatched rows.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.streaming.joins import event_attribution
from metadata_ingestion_poc_spark.streaming.pipeline import read_stream

WITHIN = "4 hours"


@pytest.fixture()
def event_dir(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_stream")
    ev.repartition(4).write.parquet(path)
    return path, ev.schema, ev


def _run(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_stream_inner_join_equals_batch(spark, tmp_path, event_dir):
    path, schema, ev = event_dir
    stream = read_stream(spark, path, schema, max_files_per_trigger=2)
    # watermark covers the fixture's whole 30-day span: nothing is ever
    # dropped as late across micro-batches (the files are written in
    # random time order), so the streaming result must EQUAL batch.
    joined = event_attribution(
        stream, "view", "click", within=WITHIN, watermark="40 days"
    )
    _run(joined, tmp_path, "ss_inner")
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, first_id, then_id FROM ss_inner"
        ).collect()
    }
    want = {
        (r.user_id, r.first_id, r.then_id)
        for r in event_attribution(ev, "view", "click", within=WITHIN).collect()
    }
    assert got == want
    assert got, "fixture must produce at least one attribution pair"


def test_stream_stream_left_outer_emits_proven_unmatched(
    spark, sf_dir, tmp_path
):
    ev = load_table(spark, sf_dir, "events")
    r = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = r["lo"] + (r["hi"] - r["lo"]) / 2
    path = str(tmp_path / "events_ordered")
    # two time-ordered files → two in-order micro-batches; the second
    # batch advances the watermark past the first half, PROVING its
    # old unmatched views can no longer match and emitting their nulls
    ev.filter(F.col("ts") < mid).coalesce(1).write.parquet(path)
    time.sleep(1.1)  # distinct mtimes: file-source processes in order
    ev.filter(F.col("ts") >= mid).coalesce(1).write.mode("append").parquet(
        path
    )
    stream = read_stream(spark, path, ev.schema, max_files_per_trigger=1)
    joined = event_attribution(
        stream, "view", "click", within=WITHIN, watermark="2 hours", how="left_outer"
    )
    _run(joined, tmp_path, "ss_left")
    rows = spark.sql(
        "SELECT user_id, first_id, then_id FROM ss_left"
    ).collect()
    got_matched = {tuple(r) for r in rows if r.then_id is not None}
    got_unmatched = {r.first_id for r in rows if r.then_id is None}

    batch = event_attribution(
        ev, "view", "click", within=WITHIN, how="left_outer"
    ).collect()
    want_matched = {
        (r.user_id, r.first_id, r.then_id)
        for r in batch
        if r.then_id is not None
    }
    want_unmatched = {r.first_id for r in batch if r.then_id is None}

    # in-order input → nothing late → every match emits, exactly once
    assert got_matched == want_matched
    # null-matches emit only where the watermark proved them final
    assert got_unmatched <= want_unmatched
    assert got_unmatched, "first half's unmatched views must have emitted"


def test_event_attribution_rejects_bad_join_type(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        event_attribution(ev, how="full_outer")


def test_stream_static_enrichment_equals_batch(spark, tmp_path, sf_dir):
    """The streaming execution of static_enrichment (file-source
    micro-batches, availableNow) must equal the identical batch plan
    — the stream-static join keeps no stream state for the dimension
    and the broadcast dimension is re-read per micro-batch."""
    from metadata_ingestion_poc_spark.catalog import load_table
    from metadata_ingestion_poc_spark.streaming.joins import (
        static_enrichment,
    )
    from metadata_ingestion_poc_spark.streaming.pipeline import read_stream

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "events_stream_static")
    ev.repartition(4).write.parquet(path)

    stream = read_stream(spark, path, ev.schema, max_files_per_trigger=2)
    agg = static_enrichment(stream, cust, bucket="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_static_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.segment): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM stream_static_test").collect()
    }
    want = {
        (r.window_start, r.segment): (r.n_events, r.total_value)
        for r in static_enrichment(ev, cust, bucket="1 day").collect()
    }
    assert got == want and got
