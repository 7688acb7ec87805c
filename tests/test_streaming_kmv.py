"""Streaming KMV distinct-count: streaming ≡ batch-sketch equivalence
on file micro-batches (the q286 availableNow pattern), merge-order
insensitivity, and the update-fn unit contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.operators.sketches import kmv_sketch
from metadata_ingestion_poc_spark.streaming.pipeline import read_stream
from metadata_ingestion_poc_spark.streaming.sketches import (
    _estimate,
    _hash48,
    _make_kmv_update,
    streaming_kmv_distinct,
)

K = 16


def test_streaming_equals_batch_sketch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    path = str(tmp_path / "docs_kmv")
    # several files → several micro-batches, so the bottom-k state
    # genuinely merges across batches
    docs.repartition(6).write.parquet(path)

    stream = read_stream(
        spark, path, docs.schema, max_files_per_trigger=2
    )
    q = (
        streaming_kmv_distinct(stream, "source", "text", k=K)
        .writeStream.format("memory")
        .queryName("kmv_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_kmv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = spark.sql(
        """
        SELECT group_key, n_sketch, kth_hash, est_distinct FROM (
          SELECT *, row_number() OVER (PARTITION BY group_key
                                       ORDER BY n_updates DESC) AS rn
          FROM kmv_test
        ) WHERE rn = 1
        """
    )
    got = {
        r.group_key: (r.n_sketch, r.kth_hash, r.est_distinct)
        for r in final.collect()
    }
    want = {
        r[0]: (
            r.n_sketch,
            r.arr[K - 1] if r.n_sketch >= K else None,
            r.est_distinct,
        )
        for r in kmv_sketch(docs, "source", "text", k=K).collect()
    }
    assert got == want
    # the stream really did cross micro-batches
    n_updates = spark.sql(
        "SELECT MAX(n_updates) m FROM kmv_test"
    ).first().m
    assert n_updates > 1


def test_merge_is_order_insensitive(spark, sf_dir):
    # bottom-k(bottom-k(A) ∪ B) == bottom-k(A ∪ B): split the corpus,
    # fold the update fn over the two halves in both orders, compare.
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    rows = [r.text for r in docs.filter(F.col("source") == "src1").collect()]
    half = len(rows) // 2
    import pandas as pd

    class _S:
        def __init__(self):
            self._v, self.hasTimedOut = None, False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    def run(batches):
        st = _S()
        upd = _make_kmv_update("text", K, 0)
        for b in batches:
            list(upd(("src1",), iter([pd.DataFrame({"text": b})]), st))
        return st.get[0]

    a = run([rows[:half], rows[half:]])
    b = run([rows[half:], rows[:half]])
    c = run([rows])
    assert a == b == c
    # and equals the from-scratch bottom-k
    want = sorted({_hash48(t) for t in rows})[:K]
    assert a == want


def test_estimate_contract():
    # exact below k; (k-1)*2^48/h_k at and above
    assert _estimate([5, 9], K) == 2.0
    arr = list(range(1_000_000, 1_000_000 + K))
    est = _estimate(arr, K)
    assert est == (K - 1) * float(1 << 48) / arr[K - 1]


def test_k_validation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match=">= 1"):
        streaming_kmv_distinct(docs, "source", "text", k=0)
    with pytest.raises(ValueError, match=">= 1"):
        kmv_sketch(docs, "source", "text", k=0)


def test_streaming_cms_equals_batch_sketch(spark, sf_dir, tmp_path):
    # streaming fold over file micro-batches must yield the SAME
    # merged sketch table as one batch cms_build over everything —
    # CMS merge is element-wise addition, so merge-on-read over
    # per-batch partials is exact.
    from metadata_ingestion_poc_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from metadata_ingestion_poc_spark.streaming.sketches import (
        streaming_cms_read,
        streaming_cms_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    src_path = str(tmp_path / "docs_cms_src")
    docs.repartition(5).write.parquet(src_path)
    table = str(tmp_path / "cms_table")

    stream = read_stream(
        spark, src_path, docs.schema, max_files_per_trigger=2
    )
    q = (
        stream.writeStream.foreachBatch(
            streaming_cms_sink(table, "source", width=64, depth=3)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.d, r.bucket): r.c
        for r in streaming_cms_read(spark, table).collect()
    }
    want = {
        (r.d, r.bucket): r.c
        for r in cms_build(docs, "source", width=64, depth=3).collect()
    }
    assert got == want
    # and the merged sketch estimates like the batch one
    keys = docs.select("source").distinct()
    est = {
        r.source: r.est
        for r in cms_estimate(
            streaming_cms_read(spark, table), keys, "source"
        ).collect()
    }
    exact = {
        r.source: r.n
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s, n in exact.items():
        assert est[s] >= n  # CMS never under-estimates


def test_streaming_cms_replay_is_idempotent(spark, sf_dir, tmp_path):
    # at-least-once replay of the SAME batch_id must not double-count
    # into the sketch — the snapshot batch marker no-ops it.
    from metadata_ingestion_poc_spark.snapshots import snapshot_versions
    from metadata_ingestion_poc_spark.streaming.sketches import (
        streaming_cms_read,
        streaming_cms_sink,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .limit(50)
        .cache()
    )
    table = str(tmp_path / "cms_replay")
    handle = streaming_cms_sink(table, "source", width=32, depth=2)
    handle(docs, 0)
    before = {
        (r.d, r.bucket): r.c
        for r in streaming_cms_read(spark, table).collect()
    }
    handle(docs, 0)  # replayed micro-batch
    after = {
        (r.d, r.bucket): r.c
        for r in streaming_cms_read(spark, table).collect()
    }
    assert after == before
    assert len(snapshot_versions(table)) == 1
    handle(docs, 1)  # a genuinely new batch does count
    doubled = {
        (r.d, r.bucket): r.c
        for r in streaming_cms_read(spark, table).collect()
    }
    assert doubled == {k: 2 * v for k, v in before.items()}


def test_streaming_qsketch_equals_batch_sketch(spark, sf_dir, tmp_path):
    # streaming fold over file micro-batches must yield the SAME
    # merged DDSketch table as one batch qsketch_build over
    # everything — bucket-count addition is exactly associative, so
    # merge-on-read over per-batch partials is exact, and the merged
    # table must feed qsketch_quantiles identically.
    from metadata_ingestion_poc_spark.operators.sketches import (
        qsketch_build,
        qsketch_quantiles,
    )
    from metadata_ingestion_poc_spark.streaming.sketches import (
        streaming_qsketch_read,
        streaming_qsketch_sink,
    )

    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "source", "CAST(n_chars AS DOUBLE) AS v"
    )
    src_path = str(tmp_path / "docs_qs_src")
    docs.repartition(5).write.parquet(src_path)
    table = str(tmp_path / "qs_table")

    stream = read_stream(
        spark, src_path, docs.schema, max_files_per_trigger=2
    )
    q = (
        stream.writeStream.foreachBatch(
            streaming_qsketch_sink(
                table, "v", group_cols=["source"], alpha=0.02
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_qs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # the reader must declare the sink's geometry (alpha rides in the
    # partial schema); asking with the wrong one fails loud below
    merged = streaming_qsketch_read(
        spark, table, group_cols=["source"], alpha=0.02
    )
    got = {(r.source, r.bucket): r.n for r in merged.collect()}
    want = {
        (r.source, r.bucket): r.n
        for r in qsketch_build(
            docs, "v", group_cols=["source"], alpha=0.02
        ).collect()
    }
    assert got == want
    # quantile estimates from the streamed sketch honor the relative
    # error bound against the exact per-group median
    est = {
        r.source: r.est
        for r in qsketch_quantiles(
            merged, [0.5], group_cols=["source"], alpha=0.02
        ).collect()
    }
    import numpy as np

    exact = {}
    for r in docs.collect():
        exact.setdefault(r.source, []).append(r.v)
    for s, vals in exact.items():
        true_med = float(np.sort(vals)[int((len(vals) - 1) * 0.5)])
        assert abs(est[s] - true_med) <= 0.03 * true_med + 1e-9, s


def test_streaming_qsketch_replay_is_idempotent(spark, sf_dir, tmp_path):
    from metadata_ingestion_poc_spark.snapshots import snapshot_versions
    from metadata_ingestion_poc_spark.streaming.sketches import (
        streaming_qsketch_read,
        streaming_qsketch_sink,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("source", "CAST(n_chars AS DOUBLE) AS v")
        .limit(50)
        .cache()
    )
    table = str(tmp_path / "qs_replay")
    handle = streaming_qsketch_sink(table, "v", group_cols=["source"])
    handle(docs, 0)
    before = {
        (r.source, r.bucket): r.n
        for r in streaming_qsketch_read(
            spark, table, group_cols=["source"]
        ).collect()
    }
    handle(docs, 0)  # replayed micro-batch must no-op
    after = {
        (r.source, r.bucket): r.n
        for r in streaming_qsketch_read(
            spark, table, group_cols=["source"]
        ).collect()
    }
    assert after == before
    assert len(snapshot_versions(table)) == 1
    handle(docs, 1)  # a genuinely new batch does count
    doubled = {
        (r.source, r.bucket): r.n
        for r in streaming_qsketch_read(
            spark, table, group_cols=["source"]
        ).collect()
    }
    assert doubled == {k: 2 * v for k, v in before.items()}


def test_streaming_qsketch_mixed_geometry_fails_loud(
    spark, sf_dir, tmp_path
):
    # Two sinks with different alpha writing one path: bucket indices
    # from different log bases are NOT mergeable, so the read must
    # raise instead of silently summing nonsense (the CMS sink gets
    # the same guarantee from carrying width/depth in its key).
    import pytest

    from metadata_ingestion_poc_spark.streaming.sketches import (
        streaming_qsketch_read,
        streaming_qsketch_sink,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("source", "CAST(n_chars AS DOUBLE) AS v")
        .limit(50)
        .cache()
    )
    table = str(tmp_path / "qs_mixed")
    streaming_qsketch_sink(table, "v", group_cols=["source"], alpha=0.01)(
        docs, 0
    )
    streaming_qsketch_sink(table, "v", group_cols=["source"], alpha=0.05)(
        docs, 1
    )
    with pytest.raises(ValueError, match="geometry"):
        streaming_qsketch_read(
            spark, table, group_cols=["source"], alpha=0.01
        )
    # a single-geometry table read with the WRONG alpha also fails
    clean = str(tmp_path / "qs_clean")
    streaming_qsketch_sink(clean, "v", group_cols=["source"], alpha=0.01)(
        docs, 0
    )
    with pytest.raises(ValueError, match="geometry"):
        streaming_qsketch_read(
            spark, clean, group_cols=["source"], alpha=0.02
        )
    # and the matching alpha still reads clean
    assert (
        streaming_qsketch_read(
            spark, clean, group_cols=["source"], alpha=0.01
        ).count()
        > 0
    )
