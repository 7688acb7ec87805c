"""Streaming KMV (k-minimum-values) distinct-count: the streaming
twin of the q285 batch sketch family.

Why KMV streams so well: the sketch is a MERGEABLE summary — the
bottom-k hash set of a union is the bottom-k of (bottom-k(A) ∪ B), so
per-key state stays ≤ k longs forever while absorbing unbounded
input, and the merge is commutative + idempotent, which makes the
final state independent of micro-batch boundaries and replay order
(pinned streaming ≡ batch in tests/test_streaming_kmv.py). That is
the property the windowed built-ins can't give: an EXACT running
distinct-count needs unbounded state; approx_count_distinct streams
only inside windowed aggs. This is the custom-stateful shape
(applyInPandasWithState) of the stateful.py running totals, with a
bounded array as the state instead of two scalars.

Hash: the q64/q285 portable construction — first 12 hex chars of
md5(value) parsed as a 48-bit integer — so the streaming state is
bit-comparable with the batch sketch built in SQL/DataFrame
(conv(substring(md5(v), 1, 12), 16, 10)); hashlib.md5 and Spark's
md5 agree byte-for-byte on UTF-8 input.

Estimator: D̂ = (k−1)·2⁴⁸ / h₍ₖ₎ with the exact-below-k fallback (a
sketch smaller than k IS the distinct set) — identical to q285.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

KMV_M = 1 << 48


def _hash48(value: str) -> int:
    import hashlib

    return int(
        hashlib.md5(str(value).encode("utf-8")).hexdigest()[:12], 16
    )


def _estimate(arr: list[int], k: int) -> float:
    if len(arr) < k:
        return float(len(arr))
    return float(k - 1) * float(KMV_M) / float(arr[k - 1])


def _make_kmv_update(value_col: str, k: int, timeout_ms: int):
    """Per-group update fn (factored out for unit tests with a fake
    GroupState, the stateful.py discipline): merge the batch's hashes
    into the bottom-k state and emit the new sketch + estimate."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if timeout_ms > 0 and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {
                    "group_key": pd.Series([], dtype="object"),
                    "n_updates": pd.Series([], dtype="int64"),
                    "n_sketch": pd.Series([], dtype="int64"),
                    "kth_hash": pd.Series([], dtype="int64"),
                    "est_distinct": pd.Series([], dtype="float64"),
                }
            )
            return
        if state.exists:
            prev, n_updates = state.get
            hashes = set(prev)
        else:
            hashes, n_updates = set(), 0
        for pdf in pdfs:
            for v in pdf[value_col]:
                hashes.add(_hash48(v))
        arr = sorted(hashes)[:k]
        n_updates += 1
        state.update((arr, n_updates))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "group_key": [key[0]],
                "n_updates": [n_updates],
                "n_sketch": [len(arr)],
                "kth_hash": [arr[k - 1] if len(arr) >= k else None],
                # raw Python float division ≡ the batch operator's raw
                # IEEE division bit-for-bit (no round(): Python's
                # builtin is banker's rounding AND rounding a float at
                # 6 dp is the cross-version hash hazard — see
                # functions/determinism.py)
                "est_distinct": [_estimate(arr, k)],
            }
        )

    return update


def streaming_kmv_distinct(
    events: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 16,
    timeout_ms: int = 0,
) -> DataFrame:
    """Running per-group approximate distinct-count over a stream.

    Each micro-batch merges its values' 48-bit hashes into the
    per-group bottom-k state (≤ k longs per key — bounded regardless
    of stream length) and emits (group_key, n_updates, n_sketch,
    kth_hash, est_distinct). In update mode the row with the maximum
    n_updates per key is the final sketch; because KMV merge is
    commutative and idempotent, that final state equals the batch
    sketch over the union of all micro-batches no matter how the
    input was split (the equivalence test's claim).

    timeout_ms > 0 enables ProcessingTimeTimeout eviction for
    unbounded key domains, the stateful.py contract.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    group_type = events.schema[group_col].dataType
    out_schema = StructType(
        [
            StructField("group_key", group_type),
            StructField("n_updates", LongType()),
            StructField("n_sketch", LongType()),
            StructField("kth_hash", LongType()),
            StructField("est_distinct", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("hashes", ArrayType(LongType())),
            StructField("n_updates", LongType()),
        ]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(group_col).applyInPandasWithState(
        _make_kmv_update(value_col, k, timeout_ms),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming count-min sketch — the point-frequency streaming twin,
# built the OTHER canonical way from the KMV above: instead of
# per-key custom state, each micro-batch's PARTIAL sketch (a ≤
# depth×width-row table from the existing JVM-side cms_build) is
# committed as one idempotent snapshot version, and the current
# sketch is the merge-on-read groupBy over the partials — CMS merge
# is element-wise addition, so deferring it to read time is exact.
# No read-modify-write anywhere: replayed micro-batches no-op on the
# batch_id marker (the snapshot_sink exactly-once contract), so
# at-least-once delivery can never double-count a batch into the
# counters — the failure mode a naive read-merge-overwrite
# foreachBatch sink has.
# ---------------------------------------------------------------------------


def streaming_cms_sink(
    table_path: str,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    weight_col: str | None = None,
):
    """foreachBatch handler: commit each micro-batch's count-min
    partial sketch as one idempotent snapshot version. Pair with
    :func:`streaming_cms_read` for the live merged sketch."""
    from ..operators.sketches import cms_build
    from ..snapshots import snapshot_write

    def handle(batch: DataFrame, batch_id: int) -> None:
        sk = cms_build(
            batch, key_col, width=width, depth=depth,
            weight_col=weight_col,
        )
        snapshot_write(sk, table_path, mode="append", batch_id=batch_id)

    return handle


def streaming_cms_read(spark, table_path: str) -> DataFrame:
    """The current merged sketch over every committed micro-batch
    partial — exact, because CMS merge is element-wise addition
    (cms_merge semantics as one bounded groupBy; geometry columns
    ride in the key so mismatched sketches can never silently mix).
    Feed the result to operators/sketches.py cms_estimate /
    cms_screen like any batch sketch."""
    from pyspark.sql import functions as F

    from ..snapshots import snapshot_read

    return (
        snapshot_read(spark, table_path)
        .groupBy("d", "bucket", "width", "depth")
        .agg(F.sum("c").alias("c"))
    )


# ---------------------------------------------------------------------------
# Streaming DDSketch quantile sink — completes the streaming-sketch
# family (KMV = distinct via keyed state above, CMS = point frequency
# via snapshot partials, DDSketch = quantiles the same way): each
# micro-batch's partial (group, bucket, n) table from the existing
# JVM-side qsketch_build commits as one idempotent snapshot version,
# and the live sketch is the merge-on-read re-groupBy — DDSketch
# merge is bucket-count addition (exactly associative, Masson et al.
# VLDB 2019), so deferring it to read time is exact and the merged
# table feeds operators/sketches.py qsketch_quantiles like any batch
# sketch. Replay-safe for the same reason as the CMS sink: partials
# are append-only versions keyed by batch_id, never read-modify-
# write, so at-least-once delivery cannot double-count. Geometry
# discipline (round 14, mirroring the CMS sink's width/depth-in-key):
# the partial schema CARRIES alpha, because bucket indices are only
# mergeable between sketches built with the SAME log base — two sinks
# with different alpha writing one path would otherwise merge-on-read
# into nonsense; the read side validates the geometry and fails loud.
# ---------------------------------------------------------------------------


def streaming_qsketch_sink(
    table_path: str,
    value_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.01,
):
    """foreachBatch handler: commit each micro-batch's DDSketch
    partial as one idempotent snapshot version. Pair with
    :func:`streaming_qsketch_read` for the live merged sketch."""
    from pyspark.sql import functions as F

    from ..operators.sketches import qsketch_build, qsketch_gamma
    from ..snapshots import snapshot_write

    qsketch_gamma(alpha)  # validate the geometry before the stream starts

    def handle(batch: DataFrame, batch_id: int) -> None:
        sk = qsketch_build(
            batch, value_col, group_cols=group_cols, alpha=alpha
        ).withColumn("alpha", F.lit(float(alpha)))
        snapshot_write(sk, table_path, mode="append", batch_id=batch_id)

    return handle


def streaming_qsketch_read(
    spark,
    table_path: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.01,
) -> DataFrame:
    """The current merged DDSketch over every committed micro-batch
    partial (bucket-count addition as one bounded groupBy). Feed to
    operators/sketches.py qsketch_quantiles for estimates.

    ``alpha`` must match the sink's: bucket indices from different
    log bases are not mergeable, so the read FAILS LOUD (ValueError)
    if the table holds partials with any other alpha — the same
    can-never-silently-mix contract the CMS sink gets from carrying
    width/depth in its key. The validation is one distinct over the
    tiny partial table."""
    from pyspark.sql import functions as F

    from ..snapshots import snapshot_read

    keys = list(group_cols or [])
    partials = snapshot_read(spark, table_path)
    seen = sorted(
        r["alpha"] for r in partials.select("alpha").distinct().collect()
    )
    if seen != [float(alpha)]:
        raise ValueError(
            f"mixed/mismatched DDSketch geometry at {table_path}: "
            f"partials carry alpha={seen}, reader asked for {alpha} — "
            f"bucket indices from different log bases cannot merge"
        )
    return (
        partials
        .groupBy(*keys, "bucket")
        .agg(F.sum("n").alias("n"))
    )
