from __future__ import annotations

import pytest

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.operators.multimodal import (
    decode_metadata,
    extract_features,
    sample_frames,
    synthetic_blob_table,
)


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return synthetic_blob_table(docs).cache()


def test_blob_table_schema(blobs):
    assert dict(blobs.dtypes) == {
        "blob_id": "bigint",
        "media_type": "string",
        "content": "binary",
        "n_bytes": "bigint",
    }
    assert blobs.count() == 500


def test_decode_metadata_batch_shape(blobs):
    decoded = decode_metadata(blobs)
    rows = decoded.collect()
    assert len(rows) == 500
    assert all(1 <= r.width <= 640 and 1 <= r.height <= 480 for r in rows)


def test_extract_features_fixed_dim_and_deterministic(blobs):
    a = {r.blob_id: list(r.features) for r in extract_features(blobs).collect()}
    b = {
        r.blob_id: list(r.features)
        for r in extract_features(blobs.repartition(9)).collect()
    }
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in a.values())  # normalized


def test_sample_frames_fanout(blobs):
    frames = sample_frames(blobs, every_n_bytes=32)
    per_blob = frames.groupBy("blob_id").count().collect()
    n_videos = blobs.filter("media_type = 'video/mp4'").count()
    assert len(per_blob) == n_videos
    assert all(r["count"] >= 1 for r in per_blob)
    first = frames.filter("frame_idx = 0").first()
    assert len(bytes(first.frame_bytes)) <= 32
