"""Training-data shard export: deterministic, resumable corpus writes.

The last stage of a curation pipeline is "write the corpus as N shards
a trainer can stream" — and it must be REPRODUCIBLE: rerunning the
export on the same input (on any cluster size, any partition layout,
after any retry) must produce byte-identical shard membership and
intra-shard order. rand()-based shuffles and zipWithIndex both break
that; this writer derives everything from a pure function of the id:

- shard(id)    = first hex nibbles of md5(id), `num_shards` buckets
- order-in-shard = (md5(id), id) ascending — a stable pseudo-random
  permutation within each shard

At scale: one shuffle (repartition on shard), sortWithinPartitions
(no global sort), one file per shard via maxRecordsPerFile-free
single-partition-per-shard layout. The export is also the write-side
twin of queries/curation2.q122 (the oracle-checked assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def shard_assignment(
    df: DataFrame, id_col: str, num_shards: int
) -> DataFrame:
    """Add `__shard` + `__ord` columns — a pure function of the id.

    num_shards must be a power of two ≤ 65536 (hex-nibble bucketing:
    1, 2 or 4 nibbles of the md5 are used, then pmod folds down).
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    if num_shards > 65536:
        raise ValueError(
            f"num_shards must be <= 65536 (4 md5 nibbles), got {num_shards}"
        )
    if num_shards & (num_shards - 1):
        raise ValueError(
            "num_shards must be a power of two (the pmod fold over "
            f"hex-nibble buckets is only unbiased then), got {num_shards}"
        )
    nibbles = 1 if num_shards <= 16 else (2 if num_shards <= 256 else 4)
    key = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(key, 1, nibbles), 16, 10).cast("int")
    return df.withColumn("__ord", key).withColumn(
        "__shard", F.pmod(bucket, F.lit(num_shards)).cast("int")
    )


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    fmt: str = "parquet",
) -> None:
    """Write `df` as `num_shards` deterministic shards under `path`.

    Layout: ``path/shard=K/part-*.{fmt}`` — one output partition per
    shard (repartition on the shard column, so each shard's rows are
    written by exactly one task, pre-sorted by the order key). A
    trainer reads ``path`` with partition discovery and streams shards
    in any order; within a shard the row order is the deterministic
    permutation. The helper columns are dropped before the write (a
    projection preserves intra-partition order), so files hold exactly
    the input schema.
    """
    assigned = shard_assignment(df, id_col, num_shards).withColumn(
        "shard", F.col("__shard")
    )
    (
        assigned.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "__ord", id_col)
        .drop("__shard", "__ord")
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )


def zorder_key(
    xcol: F.Column | str, ycol: F.Column | str, bits: int = 16
) -> F.Column:
    """Morton (Z-order) interleave of two non-negative ints → one long.

    Bit i of x lands at position 2i, bit i of y at 2i+1, for i in
    [0, bits). Sorting / range-partitioning on this key clusters rows
    that are close in BOTH dimensions, so after a z-ordered write the
    parquet min/max zone maps prune selective predicates on EITHER
    column — the layout trick behind multi-column data skipping at
    100 TB (a plain sort only prunes its leading column).

    Pure integer shift/mask arithmetic (2·bits terms, all inside
    whole-stage codegen), exactly replayable in any engine — see
    zorder_key_sql for the DuckDB twin.

    Sibling of maintenance.zorder_value, which handles N columns of
    any type via min/max linear bucketing (float arithmetic, the
    compaction-layout workhorse); THIS variant is the exact-integer
    2-column form whose key is bit-for-bit reproducible in SQL — use
    it when the key itself must be portable (oracle checks, external
    readers re-deriving file assignment).
    """
    # 31, not 32: at bits=32 y's bit 31 would land at interleaved
    # position 63 — the SIGN bit of the long — flipping the key
    # negative for the upper half of the grid and breaking the sort
    # order the whole layout depends on.
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    x = F.col(xcol) if isinstance(xcol, str) else xcol
    y = F.col(ycol) if isinstance(ycol, str) else ycol
    x = x.cast("long")
    y = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(x.bitwiseAND(F.lit(1 << i)), i))
            .bitwiseOR(F.shiftleft(y.bitwiseAND(F.lit(1 << i)), i + 1))
        )
    return z


def zorder_key_sql(xexpr: str, yexpr: str, bits: int = 16) -> str:
    """DuckDB SQL twin of zorder_key — identical arithmetic."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(f"((({xexpr}) & {1 << i}) << {i})")
        terms.append(f"((({yexpr}) & {1 << i}) << {i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    xcol: str,
    ycol: str,
    num_files: int,
    bits: int = 16,
) -> DataFrame:
    """Range-partition + sort a table by its Morton key for writing.

    repartitionByRange samples the z-key to cut balanced ranges (one
    exchange), then each partition sorts locally — no global sort.
    Writing the result produces `num_files` files whose per-file
    min/max stats are tight on BOTH xcol and ycol.
    """
    zdf = df.withColumn("__z", zorder_key(xcol, ycol, bits=bits))
    return (
        zdf.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
    )
