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


def test_binary_reader_to_features_end_to_end(spark, tmp_path):
    """Blob files on disk -> binary reader -> BLOB_SCHEMA adapter ->
    feature extraction: the full production ingestion path with the
    stub encoder."""
    from pyspark.sql import functions as F

    from metadata_ingestion_poc_spark.operators.multimodal import (
        extract_features,
    )
    from metadata_ingestion_poc_spark.sources import get_reader

    d = tmp_path / "media"
    d.mkdir()
    (d / "img0.jpg").write_bytes(bytes(range(64)) * 4)
    (d / "img1.jpg").write_bytes(b"\xff" * 300)

    raw = get_reader("binary")(
        spark, {"path": str(d), "pathGlobFilter": "*.jpg"}
    )
    blobs = raw.select(
        F.xxhash64("path").alias("blob_id"),
        F.lit("image").alias("media_type"),
        F.col("content"),
        F.col("length").alias("n_bytes"),
    )
    feats = extract_features(blobs, dim=8).collect()
    assert len(feats) == 2
    for r in feats:
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-6  # normalized histogram
