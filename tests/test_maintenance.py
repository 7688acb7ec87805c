"""Tests for compaction + Z-order layout (operators/maintenance.py)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.operators.maintenance import compact


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    """(min, max) of `col` per parquet file, from footer statistics."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        out.append((float(lo), float(hi)))
    return out


def test_compact_reduces_files_preserves_data(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 20000).selectExpr("id", "id % 97 AS k")
    df.repartition(40).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 40

    n_files = compact(spark, path, target_file_bytes=1 << 30)
    assert n_files == 1
    back = spark.read.parquet(path)
    assert back.count() == 20000
    assert back.agg(F.sum("id")).first()[0] == sum(range(20000))


def test_compact_crash_safe_recovery_dir_absent(spark, tmp_path):
    # after a successful compact no staging/_old residue remains
    path = str(tmp_path / "t")
    spark.range(0, 100).write.parquet(path)
    compact(spark, path, target_file_bytes=1 << 30)
    residue = [d for d in os.listdir(tmp_path) if "staging" in d or "_old" in d]
    assert residue == []


def test_zorder_files_have_tight_boxes_on_both_columns(spark, tmp_path):
    # two independent uniform columns: a single-column sort gives tight
    # x-ranges but full-width y-ranges; Z-order must bound BOTH.
    path = str(tmp_path / "t")
    df = spark.range(0, 40000).selectExpr(
        "CAST(id % 200 AS DOUBLE) AS x",
        "CAST(CAST(id / 200 AS INT) % 200 AS DOUBLE) AS y",
    )
    df.repartition(8).write.parquet(path)
    total = sum(
        os.path.getsize(f) for f in glob.glob(path + "/*.parquet")
    )
    # ~16 range-slices of the Z-curve so each file sits in a small
    # power-of-2-ish quadrant of (x, y) space
    compact(
        spark, path, target_file_bytes=max(1, total // 16),
        zorder_cols=["x", "y"], zorder_bits=8,
    )
    xr = _file_ranges(path, "x")
    yr = _file_ranges(path, "y")
    assert len(xr) >= 8, "need several files for the locality claim"
    full = 199.0
    avg_x = sum(hi - lo for lo, hi in xr) / len(xr)
    avg_y = sum(hi - lo for lo, hi in yr) / len(yr)
    # every file spanning the full range on either axis would be ~199;
    # a Z-layout must cut the average bounding box on BOTH axes (a
    # single-column sort would leave one axis at full width).
    assert avg_x < 0.6 * full, (avg_x, xr)
    assert avg_y < 0.6 * full, (avg_y, yr)
    # data preserved
    assert spark.read.parquet(path).count() == 40000


def test_compact_preserves_export_shard_layout(spark, tmp_path):
    """Composition: a shard export compacted per shard keeps the
    deterministic membership (partition dirs survive compaction of the
    files inside them — maintenance on a real curation output)."""
    from metadata_ingestion_poc_spark.catalog import load_table
    from metadata_ingestion_poc_spark.operators.export import (
        export_shards,
        shard_assignment,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "shards")
    export_shards(docs, path, id_col="doc_id", num_shards=4)

    back = spark.read.parquet(path)
    expected = {
        r["doc_id"]: r["__shard"]
        for r in shard_assignment(docs, "doc_id", 4)
        .select("doc_id", "__shard")
        .collect()
    }
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got == expected
    # compact each shard dir independently; membership is unchanged
    for d in (tmp_path / "shards").glob("shard=*"):
        compact(spark, str(d), target_file_bytes=1 << 30)
    back2 = spark.read.parquet(path)
    got2 = {r["doc_id"]: r["shard"] for r in back2.collect()}
    assert got2 == expected
