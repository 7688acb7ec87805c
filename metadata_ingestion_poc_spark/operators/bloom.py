"""Bloom-filter join pruning from pure DataFrame primitives.

Spark's own runtime row-level filtering (InjectRuntimeFilter) only
fires when the creation-side plan meets internal heuristics, and the
``bloom_filter_agg`` expression backing it is not registered in the
public function registry of this build. This module provides the same
capability as an explicit, composable operator — no UDF, no driver
bit-twiddling, no JVM internals:

- build: each key sets `num_hashes` bits (``pmod(xxhash64(key, seed),
  num_bits)``); the filter is ONE aggregate — a sparse (word, bits)
  bit_or groupBy densified into a single-row ``array<bigint>`` of
  ``num_bits/64`` words. At any scale the state is constant-size
  (num_bits/8 bytes), built map-side-combinable in one pass.
- merge: element-wise OR of word arrays — exactly associative, so
  per-partition / per-day filters roll up like the HLL (q127) and CMS
  sketches: ``bloom_build(a ∪ b) == bloom_merge(bloom_build(a),
  bloom_build(b))`` bit-for-bit (pinned by test).
- probe: a broadcast of the single-row filter crossed onto the probe
  side; the membership test is a pure JVM expression chain
  (element_at + bitwiseAND per hash) inside whole-stage codegen — the
  probe side never shuffles and never leaves codegen.

Guarantee: NO false negatives (pruning is transparent to a subsequent
equi-join); false-positive rate ≈ (1 − e^(−k·n/m))^k, k=num_hashes,
m=num_bits, n=#distinct keys.

At 100 TB this is the classic semi-join reduction: build the filter
on the small/filtered dimension (kilobytes of state), broadcast it,
and drop non-joining fact rows BEFORE the fact-side shuffle — the
shuffle that dominates a selective star join shrinks by the join's
selectivity. The same single-row table is also the right shape to
persist (parquet) and reuse across queries of a workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hash seeds disambiguate the num_hashes positions; the probe derives
# the SAME seeds from the filter's stamped num_hashes, so build and
# probe can never disagree (the cms_estimate geometry lesson).
_SEED_BASE = 0x5B10


def _positions(key: F.Column, num_bits: int, num_hashes: int) -> list[F.Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEED_BASE + i)), F.lit(num_bits)).cast(
            "long"
        )
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Single-row Bloom filter (words: array<bigint>, num_bits,
    num_hashes) over the non-null values of `key_col`.

    num_bits must be a multiple of 64 (whole words). The default
    2^23 bits = 1 MiB holds ~1M distinct keys at <1% FPR; size by
    m ≈ −n·ln(p) / ln(2)² for target FPR p.
    """
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    nwords = num_bits // 64
    key = F.col(key_col)
    sparse = (
        df.filter(key.isNotNull())
        .select(F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos"))
        .select(
            F.shiftright("pos", 6).alias("word"),
            # shiftleft's pyspark wrapper wants a python-int shift, so
            # the variable-shift mask goes through expr
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    # densify the ≤ nwords-row sparse table into one array<bigint> row
    # (absent words zero): spine ⟕ sparse, then ONE sorted collect —
    # O(nwords log nwords). (A map_from_arrays + per-slot element_at
    # formulation is O(nwords × entries): MapType lookups are linear
    # scans — measured 7 s vs 0.3 s at 2^20 bits.) collect_list here
    # is executor-side inside a single-row aggregate, not a driver
    # collect.
    spine = df.sparkSession.range(nwords).select(F.col("id").alias("word"))
    return (
        spine.join(F.broadcast(sparse), "word", "left")
        .select(
            "word", F.coalesce("bits", F.lit(0).cast("long")).alias("bits")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word", "bits"))),
                lambda s: s["bits"],
            ).alias("words")
        )
        .select(
            "words",
            F.lit(num_bits).alias("num_bits"),
            F.lit(num_hashes).alias("num_hashes"),
        )
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Element-wise OR of Bloom filters — exact, associative merge.

    All inputs must share geometry (num_bits, num_hashes); a mismatch
    raises instead of silently OR-ing incompatible bit spaces.
    """
    if not blooms:
        raise ValueError("need at least one bloom filter")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    merged = out.groupBy("num_bits", "num_hashes").agg(
        F.reduce(
            F.collect_list("words"),
            F.array_repeat(F.lit(0).cast("long"), F.size(F.first("words"))),
            lambda acc, w: F.zip_with(acc, w, lambda a, b: a.bitwiseOR(b)),
        ).alias("words")
    )
    geoms = merged.select("num_bits", "num_hashes").collect()
    if len(geoms) != 1:
        raise ValueError(
            "bloom geometries differ: "
            f"{sorted((g['num_bits'], g['num_hashes']) for g in geoms)}"
        )
    return merged.select("words", "num_bits", "num_hashes")


def bloom_prune(probe: DataFrame, bloom: DataFrame, key_col: str) -> DataFrame:
    """Rows of `probe` whose `key_col` MIGHT be in the filter.

    Superset-of-matches guarantee: every probe row whose key was fed
    to bloom_build survives; a bounded fraction of non-matching rows
    (the FPR) also survives — so ``prune(big) ⋈ small == big ⋈ small``
    always. Null keys are dropped (they cannot match an equi-join).

    Plan shape: the single-row filter broadcasts; the membership test
    is a pure expression — no shuffle, no explode on the probe side.
    The filter plan executes exactly once: its single row (bounded:
    num_bits/8 bytes + 2 ints) is collected and re-literalized, so
    the geometry read and the broadcast share one materialization.
    """
    rows = bloom.select("words", "num_bits", "num_hashes").collect()
    if len(rows) != 1:
        raise ValueError(f"bloom filter must be a single row, got {len(rows)}")
    num_bits, num_hashes = rows[0]["num_bits"], rows[0]["num_hashes"]
    bloom = probe.sparkSession.createDataFrame(
        rows, "words array<bigint>, num_bits int, num_hashes int"
    )
    key = F.col(key_col)
    cond = key.isNotNull()
    for i, pos in enumerate(_positions(key, num_bits, num_hashes)):
        word = F.element_at(
            F.col("__bloom_words"), (F.shiftright(pos, 6) + 1).cast("int")
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(`{key_col}`, "
            f"{_SEED_BASE + i}), {num_bits}) & 63 AS INT))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return (
        probe.crossJoin(
            F.broadcast(bloom.select(F.col("words").alias("__bloom_words")))
        )
        .where(cond)
        .drop("__bloom_words")
    )
