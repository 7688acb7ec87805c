"""Streaming rank-grid drift monitor: streaming ≡ batch BIT-EQUALITY
for every grid-based family member, plus replay idempotence.

The grid is the exact sufficient statistic (integer-add merge), so
unlike the sketch sinks the streamed ANSWERS — z-scores, H — must
equal the batch operators' outputs bit-for-bit, not just the state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.operators.ranktests import (
    kruskal_wallis,
    kruskal_wallis_from_counts,
    mann_whitney_battery,
    mann_whitney_from_counts,
    mood_from_counts,
    mood_scale_battery,
    rank_grid,
)
from metadata_ingestion_poc_spark.streaming.drift import (
    streaming_rank_grid_read,
    streaming_rank_grid_sink,
)
from metadata_ingestion_poc_spark.streaming.pipeline import read_stream


def _docs_lengths(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").selectExpr(
        "source", "length(text) AS x"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_grid_finalizes_bit_equal_to_batch(
    spark, sf_dir, tmp_path
):
    docs = _docs_lengths(spark, sf_dir)
    src_path = str(tmp_path / "docs_grid_src")
    docs.repartition(5).write.parquet(src_path)
    table = str(tmp_path / "grid_table")

    stream = read_stream(
        spark, src_path, docs.schema, max_files_per_trigger=2
    )
    q = (
        stream.writeStream.foreachBatch(
            streaming_rank_grid_sink(table, "source", "x")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_grid"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    grid = streaming_rank_grid_read(spark, table)
    # the merged grid IS the batch rollup, bit for bit
    assert _rows(grid) == _rows(rank_grid(docs, "source", "x"))
    # and every family member finalizes bit-identically to the batch
    # operator run on the raw rows — including the float columns
    assert _rows(mann_whitney_from_counts(grid, "src0")) == _rows(
        mann_whitney_battery(docs, "source", "x", "src0")
    )
    assert _rows(kruskal_wallis_from_counts(grid)) == _rows(
        kruskal_wallis(docs, "source", "x")
    )
    assert _rows(mood_from_counts(grid, "src0")) == _rows(
        mood_scale_battery(docs, "source", "x", "src0")
    )


def test_streaming_grid_replay_is_idempotent(spark, sf_dir, tmp_path):
    from metadata_ingestion_poc_spark.snapshots import snapshot_versions

    docs = _docs_lengths(spark, sf_dir).limit(60).cache()
    table = str(tmp_path / "grid_replay")
    handle = streaming_rank_grid_sink(table, "source", "x")
    handle(docs, 0)
    before = _rows(streaming_rank_grid_read(spark, table))
    handle(docs, 0)  # replayed micro-batch must no-op
    assert _rows(streaming_rank_grid_read(spark, table)) == before
    assert len(snapshot_versions(table)) == 1
    handle(docs, 1)  # a genuinely new batch does count
    doubled = {
        (r.grp, r.v): r.c
        for r in streaming_rank_grid_read(spark, table).collect()
    }
    assert doubled == {(g, v): 2 * c for (g, v, c) in before}


def test_incremental_drift_verdict_flips_when_drift_arrives(
    spark, sf_dir, tmp_path
):
    """The monitoring story end-to-end: a clean day commits, the MWU
    verdict is null-ish; drifted days commit, the verdict flips —
    without ever rescanning day 1."""
    docs = _docs_lengths(spark, sf_dir)
    table = str(tmp_path / "grid_drift")
    handle = streaming_rank_grid_sink(table, "source", "x")
    handle(docs, 0)  # day 1: no drift anywhere
    calm = {
        r["group"]: r.z
        for r in mann_whitney_from_counts(
            streaming_rank_grid_read(spark, table), "src0"
        ).collect()
    }
    assert all(abs(z) < 4 for z in calm.values())
    # days 2-3: src1 shifts +600 (the q303 planted magnitude); two
    # drifted commits so the drifted mass dominates the mixed sample
    day2 = docs.withColumn(
        "x",
        F.when(F.col("source") == "src1", F.col("x") + 600).otherwise(
            F.col("x")
        ),
    )
    handle(day2, 1)
    handle(day2, 2)
    drifted = {
        r["group"]: r.z
        for r in mann_whitney_from_counts(
            streaming_rank_grid_read(spark, table), "src0"
        ).collect()
    }
    assert drifted["src1"] > 5
    others = [z for g, z in drifted.items() if g != "src1"]
    assert all(abs(z) < 4 for z in others)
