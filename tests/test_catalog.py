from __future__ import annotations

from metadata_ingestion_poc_spark.catalog import TABLES, load_table, register_views


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.count() > 0, name


def test_events_ts_normalized_to_microsecond_timestamp(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    row = ev.orderBy("event_id").first()
    assert row.ts.year == 2024


def test_register_views(spark, sf_dir):
    register_views(spark, sf_dir)
    assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").first().n > 0
