"""Tests for the deterministic shard export (operators/export.py)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.operators.export import (
    export_shards,
    shard_assignment,
)


def _shard_rows(path: str) -> dict[int, list]:
    """doc_ids per shard in FILE order (pyarrow preserves row order)."""
    out: dict[int, list] = {}
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        shard = int(d.rsplit("=", 1)[1])
        ids: list = []
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        out[shard] = ids
    return out


def test_export_roundtrip_and_order(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    export_shards(docs, path, id_col="doc_id", num_shards=8)

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns) | {"shard"}
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )

    # shard membership matches the declared pure-function assignment
    expected = {
        r["doc_id"]: r["__shard"]
        for r in shard_assignment(docs, "doc_id", 8)
        .select("doc_id", "__shard")
        .collect()
    }
    rows = _shard_rows(path)
    for shard, ids in rows.items():
        for i in ids:
            assert expected[i] == shard
        # intra-shard order is (md5(id), id) ascending
        keys = (
            spark.createDataFrame([(i,) for i in ids], "doc_id: long")
            .select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("k"))
            .collect()
        )
        km = {r.doc_id: r.k for r in keys}
        assert ids == [
            i for _, i in sorted((km[i], i) for i in ids)
        ]


def test_export_deterministic_under_layout(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    export_shards(docs, p1, id_col="doc_id", num_shards=8)
    # adversarial input layout: skewed repartition + reversed sort
    shuffled = docs.repartition(7, "lang").sortWithinPartitions(
        F.col("doc_id").desc()
    )
    export_shards(shuffled, p2, id_col="doc_id", num_shards=8)
    assert _shard_rows(p1) == _shard_rows(p2)


def test_export_rejects_bad_shard_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        export_shards(docs, "/tmp/unused", id_col="doc_id", num_shards=0)
    # non-power-of-two counts would bias shard sizes up to 2x via the
    # pmod fold; >65536 would leave shards permanently empty
    with pytest.raises(ValueError, match="power of two"):
        shard_assignment(docs, "doc_id", 12)
    with pytest.raises(ValueError, match="65536"):
        shard_assignment(docs, "doc_id", 131072)
    # boundary cases stay legal
    shard_assignment(docs, "doc_id", 1)
    shard_assignment(docs, "doc_id", 65536)
