"""JDBC reader e2e against embedded Derby (ships in pyspark's jars/).

The reference drives JDBC through the same pass-through options dict
(readers/base_reader.py:16-29); these tests execute the real
``spark.read.format("jdbc")`` path — driver class loading, SQL type
mapping, predicate pushdown, and partitioned parallel scan — with no
network and no extra install: Derby runs embedded in the local JVM.
"""

from __future__ import annotations

import pytest

from metadata_ingestion_poc_spark.sources import get_reader

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


@pytest.fixture()
def seeded_db(spark, tmp_path):
    """A Derby db with table T seeded from a small DataFrame."""
    url = _derby_url(tmp_path, "db")
    df = spark.range(0, 100).selectExpr(
        "id", "id % 7 AS grp", "CAST(id * 1.5 AS DOUBLE) AS val"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "T")
        .option("driver", DERBY_DRIVER)
        .save()
    )
    return url, df


def test_jdbc_roundtrip(spark, seeded_db):
    url, df = seeded_db
    out = get_reader("jdbc")(
        spark, {"url": url, "dbtable": "T", "driver": DERBY_DRIVER}
    )
    assert {c.lower() for c in out.columns} == {"id", "grp", "val"}
    assert sorted(r[0] for r in out.select("id").collect()) == list(range(100))


def test_jdbc_partitioned_parallel_scan(spark, seeded_db):
    url, _ = seeded_db
    out = get_reader("jdbc")(
        spark,
        {
            "url": url,
            "dbtable": "T",
            "driver": DERBY_DRIVER,
            "partitionColumn": "ID",
            "lowerBound": "0",
            "upperBound": "100",
            "numPartitions": "4",
        },
    )
    # the partitioned scan must see every row exactly once across the
    # 4 stride ranges (boundary rows are the classic off-by-one bug)
    assert sorted(r[0] for r in out.select("id").collect()) == list(range(100))


def test_jdbc_subquery_pushdown(spark, seeded_db):
    url, _ = seeded_db
    out = get_reader("jdbc")(
        spark,
        {
            "url": url,
            # Spark's JDBC writer quotes identifiers, so Derby stores
            # them case-sensitively lowercase — quote them back.
            "dbtable": '(SELECT "grp", COUNT(*) AS "n" FROM T GROUP BY "grp") q',
            "driver": DERBY_DRIVER,
        },
    )
    got = {r[0]: r[1] for r in out.select("grp", "n").collect()}
    # 100 ids mod 7: groups 0..1 get 15, groups 2..6 get 14
    assert got == {g: (15 if g < 2 else 14) for g in range(7)}


def test_jdbc_through_metadata_ingestion(spark, tmp_path):
    # full parity path: a metadata-driven source of type jdbc flows
    # through the reader dispatch into the RAW/HUB zones.
    from metadata_ingestion_poc_spark.config import Config
    from metadata_ingestion_poc_spark.framework import run_source
    from metadata_ingestion_poc_spark.metadata import Source

    url = _derby_url(tmp_path, "ingdb")
    (
        spark.range(0, 10)
        .selectExpr("id AS pk", "CAST(id * 2 AS DOUBLE) AS metric")
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "SRC")
        .option("driver", DERBY_DRIVER)
        .save()
    )
    source = Source(
        id="derby_src",
        type="jdbc",
        domain="sales",
        entity="src",
        options={"url": url, "dbtable": "SRC", "driver": DERBY_DRIVER},
        hub_primary_keys=["PK"],
    )
    cfg = Config.from_defaults(
        {
            "raw_base": str(tmp_path / "raw"),
            "hub_base": str(tmp_path / "hub"),
        }
    )
    run_source(spark, source, cfg, ingest_date="2026-01-01")
    hub = spark.read.parquet(str(tmp_path / "hub" / "sales" / "src"))
    assert hub.count() == 10
    assert sorted(r[0] for r in hub.select("pk").collect()) == list(range(10))
