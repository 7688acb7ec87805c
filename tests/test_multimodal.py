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


def test_phash_deterministic_and_partitioning_invariant(blobs):
    """q262's hash stage: identical hashes on every run and under any
    input partitioning (the q65 pattern — Arrow batch boundaries must
    not leak into values)."""
    from metadata_ingestion_poc_spark.operators.multimodal import phash64

    a = {r.id: r.phash for r in phash64(blobs).collect()}
    b = {r.id: r.phash for r in phash64(blobs.repartition(7)).collect()}
    assert a == b
    assert len(a) == 500
    assert all(isinstance(v, int) for v in a.values())


def test_phash_banded_join_zero_recall_vs_brute_force(spark, sf_dir):
    """Round-11 contract: the Hamming band trick is pigeonhole-LOSSLESS
    — at max_hamming < bands every qualifying pair shares ≥ 1 chunk,
    so the banded candidate path must return EXACTLY the brute-force
    O(n²) pair set, not a subset."""
    import itertools

    from metadata_ingestion_poc_spark.operators.multimodal import (
        phash64,
        phash_near_dup_pairs,
        synthetic_blob_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    blobs = synthetic_blob_table(docs)
    hashes = {r.id: r.phash for r in phash64(blobs).collect()}

    def ham(x, y):
        return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")

    for max_h in (3, 7):  # exercises the 4-band AND 8-band layouts
        brute = {
            (a, b)
            for a, b in itertools.combinations(sorted(hashes), 2)
            if ham(hashes[a], hashes[b]) <= max_h
        }
        banded = {
            (r.id_a, r.id_b)
            for r in phash_near_dup_pairs(blobs, max_hamming=max_h).collect()
        }
        assert banded == brute, (
            f"max_hamming={max_h}: banded {len(banded)} != "
            f"brute {len(brute)}"
        )
        assert brute, "degenerate fixture: no near-dup pairs at all"


def test_phash_near_dup_finds_planted_edits(spark, sf_dir):
    """A small mid-string edit must stay a near-dup (local pixel
    change → low Hamming), while the pair set stays deterministic."""
    from metadata_ingestion_poc_spark.queries import QUERIES

    rows = QUERIES["q262_phash_near_dup"](spark, sf_dir).collect()
    planted = {
        (r.id_a, r.id_b) for r in rows
        if r.id_b == r.id_a + 1_000_000
    }
    assert len(planted) >= 5, f"only {len(planted)} planted pairs found"
    assert all(0 <= r.hamming <= 3 for r in rows)
    again = QUERIES["q262_phash_near_dup"](spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_phash_max_hamming_validation():
    from metadata_ingestion_poc_spark.operators.multimodal import (
        phash_near_dup_pairs,
    )

    with pytest.raises(ValueError, match=">= 0"):
        phash_near_dup_pairs(None, max_hamming=-1)
    with pytest.raises(ValueError, match="brute-force"):
        phash_near_dup_pairs(None, max_hamming=16)
