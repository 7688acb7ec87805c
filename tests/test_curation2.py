"""Property tests for the second curation batch (queries/curation2.py).

The driver's DuckDB oracle pins exact values; these tests pin the
*invariants* that must survive refactors and alternative inputs:
cap bounds, shard determinism under repartitioning, cluster/survivor
structure, and quantization error bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.queries.curation2 import (
    _DOMAIN_CAP,
    q121_domain_cap,
    q122_shuffle_shard_export,
    q124_semantic_dedup,
    q125_embedding_quantization,
)


def test_domain_cap_bounds(spark, sf_dir):
    rows = q121_domain_cap(spark, sf_dir).collect()
    assert rows, "at least one source"
    for r in rows:
        assert r.n_kept <= _DOMAIN_CAP
        assert r.n_kept + r.n_dropped == r.n_total
        assert r.chars_kept is not None and r.chars_kept > 0


def test_shuffle_shard_deterministic_and_balanced(spark, sf_dir):
    out = q122_shuffle_shard_export(spark, sf_dir)
    a = {(r.doc_id): (r.shard, r.pos) for r in out.collect()}
    # identical assignment when the input arrives pre-shuffled into an
    # adversarial layout — the export is a pure function of doc_id
    from metadata_ingestion_poc_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").repartition(7, "lang")
    keyed = d.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("ord_key")
    ).withColumn(
        "shard", F.conv(F.substring("ord_key", 1, 1), 16, 10).cast("int")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    b = {
        r.doc_id: (r.shard, r.pos)
        for r in keyed.withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert a == b
    # every shard's positions are 1..n with no gaps
    by_shard: dict[int, list[int]] = {}
    for shard, pos in a.values():
        assert 0 <= shard <= 15
        by_shard.setdefault(shard, []).append(pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_semantic_dedup_cluster_structure(spark, sf_dir):
    rows = q124_semantic_dedup(spark, sf_dir).collect()
    clusters: dict[int, list] = {}
    for r in rows:
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, members in clusters.items():
        # the representative is the min member id and the only kept one
        assert cid == min(m.vec_id for m in members)
        kept = [m for m in members if m.kept]
        assert len(kept) == 1 and kept[0].vec_id == cid


def test_quantization_error_bound(spark, sf_dir):
    rows = q125_embedding_quantization(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # int8 scalar quantization error per element is at most half a
        # quantization step; mse must sit far below (max|e| / 127)².
        # embeddings are unit-ish scale, so a loose absolute bound holds.
        assert 0.0 <= r.sum_mse / r.n_vecs < 1e-3
