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
