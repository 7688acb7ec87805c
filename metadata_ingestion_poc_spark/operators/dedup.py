"""Deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame built-ins (no pyspark.ml dependency, no
Python in the row path — everything stays in whole-stage codegen):

- exact_dedup:        hash-groupBy keep-first (deterministic winner)
- ngram_jaccard_pairs: exact n-gram Jaccard via inverted shingle index
- minhash_lsh_pairs:  MinHash signatures + banded LSH candidate
                      generation + exact Jaccard verification
- simhash_pairs:      64-bit SimHash + Hamming-band LSH

Scale notes (the reason for each design):
- exact: one shuffle on the dedup key; row_number not dropDuplicates,
  because dropDuplicates keeps an *arbitrary* row (first seen per
  partition) — non-deterministic under retries/repartition.
- jaccard/minhash/simhash candidate generation is join-on-bucket, so
  cost is Σ bucket² not n². High-frequency shingles are the skew
  hazard; `max_shingle_df` drops shingles that occur in more than
  that many docs from the *index* (stop-shingles carry no dedup
  signal but create quadratic hot buckets at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Default stop-shingle cap. Finite BY DEFAULT: a shingle shared by more
# than this many documents carries no dedup signal but costs O(df²)
# candidate pairs — an unbounded default is the footgun that melts a
# library caller's first 100 TB run. Pass max_shingle_df=None to opt
# back in to the exact unpruned index (small/audit corpora only).
DEFAULT_MAX_SHINGLE_DF = 1000


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lower-case whitespace tokenization → `tokens` array column."""
    return df.withColumn(
        "tokens", F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    )


def shingles(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingle strings → `shingles` array column.

    Built with sequence+transform (JVM higher-order funcs), one pass,
    no explode until the caller asks for the inverted index.

    The token array is materialized as its own projection first: writing
    the split() inline inside the lambda would evaluate it once per
    element_at reference — O(doc_len²) work per document. As a separate
    multiply-referenced alias, CollapseProject keeps it single-eval.
    """
    toks_df = df.withColumn(
        "__toks", F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    )
    toks = F.col("__toks")
    # slice(toks, i+1, n) + one concat_ws instead of n element_at
    # calls: one array bounds-check + bulk copy per shingle rather
    # than n indexed lookups each with its own cast — measured 2.4×
    # faster on the sf0.1 corpus (the shingle build is the CPU floor
    # of the whole near-dup family). Tail semantics are identical:
    # the final window (i = len-n) gets exactly n tokens, and a
    # shorter-than-n document yields its single partial shingle in
    # both forms.
    return toks_df.withColumn(
        "shingles",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).drop("__toks")


def _spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy per-row work can use every core.

    A small parquet file arrives as ONE input split, so shingling /
    signature stages would run on a single core regardless of cluster
    size. Repartitioning a small doc set is cheap; at real scale the
    input already has enough splits and this is a no-op.

    Gated on the optimizer's size estimate, not on ``inputFiles()``:
    a frame whose estimated bytes reach ``target × maxPartitionBytes``
    already scans as ≥ target splits, so repartitioning it would be a
    pure extra shuffle — and listing input files for a 100 TB manifest
    of millions of files is itself a driver-side cost. Only frames the
    stats say are small (where the shuffle moves little data but buys
    full-core parallelism for the CPU-bound shingle/hash stages) are
    repartitioned. Stats-unavailable frames are left untouched.
    """
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect session: no SparkContext handle
        target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # Connect / non-JVM frame: no stats handle
        return df
    if size >= target * _max_partition_bytes(spark):
        return df
    return df.repartition(target)


def _spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """Keyed sibling of ``_spread``: hash-layout by ``cols`` with the
    partition count PINNED to defaultParallelism when the stats say
    the frame is small. AQE sizes post-shuffle partitions by BYTES,
    so a small-byte frame collapses onto one or two tasks — which
    serializes any window/rollup keyed on ``cols`` no matter how much
    CPU it does per row. An explicitly numbered repartition disables
    that coalescing; downstream operators keyed on ``cols`` (or a
    superset) reuse the layout with no second exchange. Large frames
    (or stats-less ones) get a plain keyed repartition and keep AQE
    sizing — the production path.
    """
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect session: no SparkContext handle
        return df.repartition(*[F.col(c) for c in cols])
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df.repartition(*[F.col(c) for c in cols])
    if size >= target * _max_partition_bytes(spark):
        return df.repartition(*[F.col(c) for c in cols])
    return df.repartition(target, *[F.col(c) for c in cols])


def _max_partition_bytes(spark) -> int:
    """`spark.sql.files.maxPartitionBytes` as an int (handles the
    "134217728b" / "128MB" spellings a bytes-conf can come back as)."""
    raw = str(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    ).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    mult, digits = 1, raw.removesuffix("b")
    if digits and digits[-1] in units:
        mult, digits = units[digits[-1]], digits[:-1]
    try:
        return int(digits) * mult
    except ValueError:
        return 134217728


def exact_dedup(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Keep exactly one row per key, the first in ``order_cols`` order."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _shingle_index(
    docs: DataFrame, id_col: str, n: int, max_shingle_df: int | None
) -> DataFrame:
    """Inverted index (shingle → doc), stop-shingles pruned."""
    # explode_outer, not explode: the optimizer infers a size()>0 filter
    # from plain explode and pushes it below the shingle projection with
    # the whole O(len²) expression inlined — recomputing every shingle
    # array twice. explode_outer gets no inferred filter; the null rows
    # (empty docs) are dropped afterwards for the same semantics.
    idx = (
        shingles(docs, n=n)
        .select(F.col(id_col).alias("doc"), F.explode_outer("shingles").alias("sh"))
        .filter(F.col("sh").isNotNull())
        .distinct()
    )
    if max_shingle_df is not None:
        w = Window.partitionBy("sh")
        idx = idx.withColumn("__df", F.count(F.lit(1)).over(w)).filter(
            F.col("__df") <= max_shingle_df
        ).drop("__df")
    return idx


# Hard cap on the members-per-side of any single pair-generation row
# (round 15, replacing the docstring-only stop-bucket lever): one
# low-entropy bucket with 10⁵ members used to build all C(m,2) ≈
# 5·10⁹ pair structs inside ONE row before exploding — an executor
# OOM at scale no configuration can absorb. With the chunked explode
# below, no row ever materializes more than cap² pair structs
# (~25 MB at the default), whatever the bucket size.
PAIR_BUCKET_CAP = 1024


def _chunked_members(members: DataFrame, cap: int, *keep: str) -> DataFrame:
    """Bound a member-array frame for pair generation: split each
    bucket's SORTED array ``ms`` into ⌈m/cap⌉ contiguous chunks and
    emit one row per unordered chunk pair (ci ≤ cj) carrying
    ``ma`` = chunk ci and ``mb`` = chunk cj (NULL when ci = cj).
    Every unordered member pair lands in exactly ONE output row:
    within its chunk when both sides share it, else in the single
    (ci, cj) row — so downstream pair generation (C(|ma|,2) within,
    |ma|·|mb| across) is bit-identical to the unchunked C(m,2)
    explode, including order (slices of a sorted array are sorted,
    and every ma element precedes every mb element). A bucket with
    m ≤ cap degenerates to one row with ma = ms — the pre-cap plan.
    No extra exchange: the chunk fan-out is a codegen explode in the
    same stage as the rollup."""
    nc = f"((size(ms) - 1) div {cap})"
    return members.select(
        *keep,
        "ms",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, {nc}), ci -> "
                f"transform(sequence(ci, {nc}), cj -> "
                f"named_struct('ci', ci, 'cj', cj))))"
            )
        ).alias("cp"),
    ).select(
        *keep,
        F.expr(f"slice(ms, cp.ci * {cap} + 1, {cap})").alias("ma"),
        F.expr(
            f"if(cp.ci = cp.cj, null, slice(ms, cp.cj * {cap} + 1, {cap}))"
        ).alias("mb"),
    )


def _chunk_pairs_sql(pair_sql) -> str:
    """Pair-generation CASE over a `_chunked_members` row.
    ``pair_sql(x, y)`` renders the output pair struct from two member
    exprs, and must be valid for x preceding y in the bucket's sort
    order (which both branches guarantee). The else-branch empty
    array covers a trailing one-member chunk; CASE's lazy branch
    evaluation keeps the within-branch (whose sequence would be
    descending) from ever running on it."""
    within = (
        "flatten(transform(sequence(0, size(ma) - 2), i -> "
        "transform(sequence(i + 1, size(ma) - 1), j -> "
        + pair_sql(
            "element_at(ma, cast(i + 1 as int))",
            "element_at(ma, cast(j + 1 as int))",
        )
        + ")))"
    )
    cross = (
        "flatten(transform(ma, x -> transform(mb, y -> "
        + pair_sql("x", "y")
        + ")))"
    )
    return (
        f"case when mb is not null then {cross} "
        f"when size(ma) >= 2 then {within} "
        f"else array() end"
    )


def _bucket_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    item_col: str,
    cap: int = PAIR_BUCKET_CAP,
) -> DataFrame:
    """Candidate pairs from bucket co-membership, via ONE shuffle.

    groupBy(bucket) → sorted member array → chunked explode of the
    C(m,2) combinations (see `_chunked_members`: no single row ever
    holds more than cap² pair structs; pair multiplicity — one
    emission per co-membership — is preserved, which
    ngram_jaccard_pairs' n_common count depends on). Replaces the
    self-join-on-bucket plan (which shuffles the index twice and
    sort-merges); pair fan-out is still Σ m²/2 per bucket, so
    stop-bucket pruning remains the scale lever. Emits (a, b) with
    a < b, once per shared bucket.
    """
    # (round-14 note: a `_spread` of the member arrays before the
    # explode was A/B'd — it helps only when bucket fan-out is huge,
    # e.g. the perceptual-hash banding that now verifies in-stage in
    # multimodal.hamming_banded_pairs, and is break-even-to-negative
    # for the shingle consumers here, so it was reverted.)
    members = (
        df.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set(item_col)).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    pair = _chunk_pairs_sql(
        lambda x, y: f"named_struct('a', {x}, 'b', {y})"
    )
    pairs = _chunked_members(members, cap).select(
        F.explode(F.expr(pair)).alias("p")
    )
    return pairs.select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via inverted shingle index.

    jaccard(a,b) = |A∩B| / (|A|+|B|-|A∩B|), computed from the count of
    co-occurring shingles per pair — bucket-pair generation on the
    shingle key, then a pair-level aggregate. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b; jaccard ships RAW —
    one IEEE division of exact integer counts is bit-identical on
    every engine and version (functions/determinism.py safe class).

    Shingles occurring in more than ``max_shingle_df`` docs are pruned
    from the index (finite by default — see DEFAULT_MAX_SHINGLE_DF;
    None opts in to the exact unpruned computation).
    """
    docs = _spread(docs)
    idx = _shingle_index(docs, id_col, n, max_shingle_df)
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))

    common = (
        _bucket_pairs(idx, ["sh"], "doc")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            # raw: ONE IEEE division of exact int64 counts (the
            # determinism.py safe class — the ROUND(·,6) here was the
            # cross-version hash-hazard shape, dropped round 14)
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_against(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Cross-set exact Jaccard: batch docs vs an EXISTING corpus.

    The incremental-ingestion workflow: a new batch arrives and must be
    deduplicated against everything already accepted — without re-pairing
    the corpus with itself. Candidate generation is an inverted-index
    equi-join on the shingle key (batch index ⋈ corpus index), so cost
    tracks shared-shingle buckets: Σ |b_bucket|·|c_bucket|, never
    |batch|·|corpus|. ``max_shingle_df`` prunes corpus stop-shingles
    (df computed on the corpus side — that's where the hot buckets
    come from as the corpus grows).

    Returns (batch_id, corpus_id, jaccard ≥ threshold). At 100 TB the
    corpus index is the thing you PERSIST between runs (bucketed by
    shingle), so each day's batch joins against it without a rebuild.
    """
    # one materialization per raw index: each feeds several consumers
    # (the stop set, the anti-join probe, sizes, the cross join), and
    # re-expanding the explode+distinct subtree per consumer multiplies
    # the plan (~30 planned exchanges without the cut). This is also
    # the operational shape: at scale the corpus index is persisted
    # between runs, not rebuilt per consumer — see save_shingle_index /
    # ngram_jaccard_pairs_against_index.
    idx_b = _shingle_index(_spread(batch), id_col, n, None).localCheckpoint(
        eager=False
    )
    idx_c = _shingle_index(_spread(corpus), id_col, n, None).localCheckpoint(
        eager=False
    )
    return _cross_index_pairs(idx_b, idx_c, threshold, max_shingle_df)


def _cross_index_pairs(
    idx_b: DataFrame,
    idx_c: DataFrame,
    threshold: float,
    max_shingle_df: int | None,
) -> DataFrame:
    """Batch-index × corpus-index Jaccard pairs (shared tail of the
    build-both and load-corpus-index paths)."""
    if max_shingle_df is not None:
        # one consistent shingle universe: stop-shingles are decided by
        # corpus document frequency, then dropped from BOTH indexes
        # (sizes and intersections all count the same universe).
        stop = (
            idx_c.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("sh")
        )
        idx_b = idx_b.join(F.broadcast(stop), "sh", "left_anti")
        idx_c = idx_c.join(F.broadcast(stop), "sh", "left_anti")
    sizes_b = idx_b.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    sizes_c = idx_c.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))

    common = (
        idx_b.select(F.col("doc").alias("batch_id"), "sh")
        .join(idx_c.select(F.col("doc").alias("corpus_id"), "sh"), "sh")
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sb = sizes_b.select(F.col("doc").alias("batch_id"), F.col("n_sh").alias("n_b"))
    sc = sizes_c.select(F.col("doc").alias("corpus_id"), F.col("n_sh").alias("n_c"))
    return (
        common.join(sb, "batch_id")
        .join(sc, "corpus_id")
        .withColumn(
            # raw exact-operand division (see ngram_jaccard_pairs)
            "jaccard",
            F.col("n_common")
            / (F.col("n_b") + F.col("n_c") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


def save_shingle_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n: int = 3,
) -> None:
    """Materialize the corpus shingle index (doc, sh) to parquet —
    build nightly, dedup batches against it all day without re-reading
    the corpus (the q126 workflow with the rebuild amortized away).

    Laid out clustered by the join key: repartition(sh) +
    sortWithinPartitions(sh) so each parquet file covers a narrow
    shingle range (footer min/max enable skipping) and a batch-side
    join shuffles only the batch. The index grows with corpus token
    count — parquet+zstd column of repeated short strings compresses
    heavily.
    """
    idx = _shingle_index(_spread(docs), id_col, n, None)
    (
        idx.repartition("sh")
        .sortWithinPartitions("sh")
        .write.mode("overwrite")
        .parquet(path)
    )


def load_shingle_index(spark, path: str) -> DataFrame:
    """Reload a saved corpus shingle index for cross-set dedup."""
    return spark.read.parquet(path)


def ngram_jaccard_pairs_against_index(
    batch: DataFrame,
    corpus_index: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """``ngram_jaccard_pairs_against`` with a PRE-BUILT corpus index
    (from save_shingle_index/load_shingle_index): only the incoming
    batch is shingled; the corpus side is a parquet scan. ``n`` must
    match the index's build-time shingle width (the index stores
    n-token shingles — a mismatch silently yields no candidates, so
    pass the same n; load path validates nothing else).
    """
    idx_b = _shingle_index(_spread(batch), id_col, n, None).localCheckpoint(
        eager=False
    )
    idx_c = corpus_index.localCheckpoint(eager=False)
    return _cross_index_pairs(idx_b, idx_c, threshold, max_shingle_df)


def minhash_signature(
    docs: DataFrame, num_hashes: int = 16, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature column `sig` (array of num_hashes int64 minima).

    One-permutation hashing (Li/Owen/Zhang 2012): each shingle is
    hashed ONCE with xxhash64, the hash space is split into
    `num_hashes` bins by `pmod(h, num_hashes)`, and signature slot k
    is the minimum hash landing in bin k. This replaces the classic
    k-independent-permutations scheme (k full xxhash64-of-string
    passes per document — the dominant signature cost, since string
    hashing is O(bytes) while the bin pass is a long compare).

    Empty bins are densified deterministically from the global min
    (`xxhash64(global_min, k)`): identical shingle sets still map to
    identical signatures under any partitioning, and near-identical
    sets agree on densified slots whenever they agree on the global
    minimum — the property banded LSH needs.
    """
    with_sh = shingles(_spread(docs), n=n)
    hashed = with_sh.withColumn(
        "__h", F.transform("shingles", lambda s: F.xxhash64(s))
    ).drop("shingles")
    gmin = F.array_min(F.col("__h"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda k: F.coalesce(
            F.array_min(
                F.filter(
                    F.col("__h"), lambda h: F.pmod(h, F.lit(num_hashes)) == k
                )
            ),
            F.xxhash64(gmin, k),
        ),
    )
    return hashed.withColumn("sig", sig).drop("__h")


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact verification.

    Candidate pairs collide in ≥1 of `bands` bands (rows = num_hashes /
    bands); every candidate is then verified with exact shingle-set
    Jaccard, so the output has no false positives — LSH only bounds
    recall. Pair enumeration is per-bucket, so the cost tracks bucket
    sizes, not n².
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(docs, num_hashes=num_hashes, n=n, id_col=id_col)

    banded = sigs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", bi * rows_per_band + ri + 1)
                                for ri in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")

    candidates = _bucket_pairs(banded, ["band", "bucket"], "doc").distinct()
    candidates = candidates.localCheckpoint(eager=False)

    # exact verification: join shingle sets back on, Jaccard via
    # array_intersect (shingle arrays are bounded by doc length).
    # Shingle ONLY candidate docs (semi join) — candidates are a
    # vanishing fraction of the corpus, and this frame feeds both join
    # sides, so re-shingling the full corpus twice would dominate.
    cand_ids = (
        candidates.select(F.col("doc_a").alias("__cid"))
        .unionByName(candidates.select(F.col("doc_b").alias("__cid")))
        .distinct()
    )
    sh = shingles(
        docs.join(
            cand_ids, F.col(id_col) == F.col("__cid"), "left_semi"
        ),
        n=n,
    ).select(F.col(id_col).alias("doc"), F.col("shingles"))
    sh = sh.localCheckpoint(eager=False)
    sha = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    shb = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sha, "doc_a")
        .join(shb, "doc_b")
        .withColumn(
            # raw exact-operand division (see ngram_jaccard_pairs)
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / (
                F.size("sh_a")
                + F.size("sh_b")
                - F.size(F.array_intersect("sh_a", "sh_b"))
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _simhash_chunks_udf(bits: int = 64):
    """Arrow-batched pandas UDF: token-hash array → 16-bit chunk array.

    Per doc: bit-matrix of the int64 hashes, per-bit one-count, majority
    bit, packed into bits/16 little-endian 16-bit chunks. numpy views
    the signed hashes as uint64 so >> is a logical shift; bit i extracted
    by &1 is identical to the JVM's arithmetic shiftright(h, i) & 1.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    n_chunks = bits // 16
    weights = (1 << np.arange(16, dtype=np.int64))
    # bound the unpacked bit matrix (64 B/hash after unpackbits) to
    # ~64 MB per sub-batch regardless of Arrow batch size / doc length
    budget = 1 << 20

    def chunks(th):
        n = len(th)
        out = np.zeros((n, n_chunks), dtype=np.int64)
        arrs = [np.asarray(a, dtype="<i8") for a in th]
        lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
        start = 0
        while start < n:
            end, tot = start, 0
            while end < n and (tot == 0 or tot + lens[end] <= budget):
                tot += lens[end]
                end += 1
            seg_lens = lens[start:end]
            nz = np.nonzero(seg_lens)[0]
            if nz.size == 0:
                start = end
                continue
            flat = np.concatenate([arrs[start + i] for i in nz])
            # bit j of column j == (h >> j) & 1: little-endian byte view
            # + bitorder="little" reproduces the arithmetic-shift bits
            bits_mat = np.unpackbits(
                flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            offsets = np.zeros(nz.size, dtype=np.intp)
            np.cumsum(seg_lens[nz][:-1], out=offsets[1:])
            # reduceat is safe: every segment non-empty → offsets strictly
            # increasing; dtype widens the uint8 columns before summing
            ones = np.add.reduceat(bits_mat, offsets, axis=0, dtype=np.int64)
            maj = ones * 2 > seg_lens[nz][:, None]
            out[start + nz] = (
                maj.reshape(nz.size, n_chunks, 16) * weights
            ).sum(axis=2)
            start = end
        return pd.Series(list(out))

    # registered without annotations (see hyperplane_signatures note)
    return pandas_udf(chunks, "array<long>")


def simhash(docs: DataFrame, id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash as 4×16-bit chunk columns (`sh0`..`sh3`).

    Per-bit majority vote over token hashes, computed as a per-document
    higher-order fold: tokens → hash array (one xxhash64 per token,
    materialized so it isn't re-evaluated per bit) → aggregate() folds
    the ±1 votes into a 64-slot accumulator. Entirely within a single
    projection — NO shuffle, no explode, no UDF — so it scales as a map
    over the corpus. Chunked layout feeds Hamming-band LSH directly.
    """
    hashed = tokenize(_spread(docs)).withColumn(
        "__th", F.transform("tokens", lambda t: F.xxhash64(t))
    )
    # The hash family stays JVM-side (xxhash64 — deterministic across
    # runs/partitionings); the per-bit majority vote is an Arrow-batched
    # pandas UDF. Both pure-SQL shapes lose badly here: a 64-way
    # unrolled vote fold compiles a codegen tree whose JIT dominates,
    # and compact higher-order lambdas are interpreted per element
    # (~tokens×64 closure calls per doc). One numpy bit-matrix per
    # batch replaces both. Majority(+1) ⟺ ones*2 > n — identical bits
    # to the ±1-vote form (ties → 0 in both).
    chunk_udf = _simhash_chunks_udf(bits)
    voted = hashed.withColumn("__chunks", chunk_udf(F.col("__th")))
    return voted.select(
        F.col(id_col),
        *[
            F.element_at("__chunks", c + 1).alias(f"sh{c}")
            for c in range(bits // 16)
        ],
    )


def simhash_pairs(
    docs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming.

    Band trick: with 4 chunks and distance ≤ 3, at least one chunk is
    identical (pigeonhole) — candidates are generated by joining on
    each chunk, then verified with exact popcount of the XOR.
    """
    # one materialization: the signature plan feeds THREE branches
    # (banding + both verification sides); without the cut the whole
    # tokenize→hash→vote pipeline runs three times. Signatures are
    # tiny (id + 4 longs) at any corpus size.
    sh = simhash(docs, id_col=id_col).localCheckpoint(eager=False)
    chunk_cols = [c for c in sh.columns if c.startswith("sh")]

    banded = sh.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(c).alias("chunk"))
                    for i, c in enumerate(chunk_cols)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.chunk")

    candidates = _bucket_pairs(banded, ["band", "chunk"], "doc").distinct()

    fa = sh.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in chunk_cols],
    )
    fb = sh.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in chunk_cols],
    )
    hamming = sum(
        F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
        for c in chunk_cols
    )
    return (
        candidates.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Directed n-gram containment: |A∩B| / |A| per ordered pair.

    Jaccard punishes size mismatch — a 50-token doc quoted verbatim
    inside a 5000-token doc has near-zero Jaccard but containment ~1.0
    from the small side. Same inverted-index skeleton and cost model
    as ngram_jaccard_pairs (ONE bucket shuffle, stop-shingle cap);
    only the final arithmetic differs. Returns (doc_a, doc_b,
    containment_a, containment_b, jaccard) with doc_a < doc_b, kept
    when EITHER direction reaches ``threshold``; all ratios ship RAW
    (exact-operand IEEE divisions, the determinism.py safe class).
    """
    docs = _spread(docs)
    idx = _shingle_index(docs, id_col, n, max_shingle_df)
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))

    common = (
        _bucket_pairs(idx, ["sh"], "doc")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        # raw exact-operand divisions (see ngram_jaccard_pairs)
        .withColumn("containment_a", F.col("n_common") / F.col("n_a"))
        .withColumn("containment_b", F.col("n_common") / F.col("n_b"))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
        .select("doc_a", "doc_b", "containment_a", "containment_b", "jaccard")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: tuple[int, int] = (2, 5),
    text_col: str = "text",
) -> DataFrame:
    """Exact set-similarity join via PREFIX FILTERING (the classic
    Chaudhuri/Bayardo–Ramakrishnan pruning): all pairs with shingle
    Jaccard ≥ num/den over the FULL shingle universe — zero recall
    loss, proven by the brute-force oracle (q249).

    Complementary to :func:`ngram_jaccard_pairs`, whose stop-shingle
    df-cap redefines Jaccard over a pruned universe to kill hot
    buckets. Prefix filtering keeps the exact semantics and sidesteps
    the same hot buckets STRUCTURALLY: shingles are globally ordered
    rarest-first (df asc, shingle asc — a total order), each document
    indexes only its first |s| − ⌈t·|s|⌉ + 1 shingles in that order,
    and any pair with J ≥ t provably shares its rarest common shingle
    inside BOTH prefixes — so the candidate join only ever buckets on
    RARE shingles; corpus boilerplate sorts last and never enters an
    index. Candidate volume is Σ (prefix-bucket)², then candidates are
    verified with an exact intersection count.

    The threshold is a FRACTION (num, den): the prefix length and the
    final acceptance test (n_common·den ≥ num·(|a|+|b|−n_common)) are
    all-integer, so no float boundary can flip membership between
    engines. One shuffle to rank shingles by rarity, one prefix
    self-join, one verification join — every stage strictly shrinks.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError("threshold must be a fraction in (0, 1]")
    # _spread first: the shingle build is the CPU floor of the whole
    # family and the documents table often arrives as ONE file split.
    # explode_outer, not explode — the _shingle_index lesson: plain
    # explode gets an inferred size()>0 filter pushed below the
    # projection with the whole O(len²) shingle expression inlined,
    # recomputing every shingle array twice.
    sh = (
        shingles(_spread(df), n, text_col)
        .select(id_col, F.explode_outer("shingles").alias("s"))
        .filter(F.col("s").isNotNull())
    )
    sh = sh.localCheckpoint(eager=False)  # reused: df, prefix, verify
    sdf = sh.groupBy("s").agg(F.count(F.lit(1)).alias("sdf"))
    by_doc = Window.partitionBy(id_col)
    ranked = (
        sh.join(sdf, "s")
        .select(
            id_col,
            "s",
            F.row_number()
            .over(by_doc.orderBy("sdf", "s"))
            .alias("rn"),
            F.count(F.lit(1)).over(by_doc).alias("sz"),
        )
    )
    # prefix length |s| - ceil(num·|s|/den) + 1, all-integer ceil
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("sz")
        - F.expr(f"(({num} * sz + {den} - 1) div {den})")
        + F.lit(1)
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # Lossless candidate pruning on top of the prefix share (both
    # classic, both integer-exact, so the verified OUTPUT is
    # unchanged): (1) length filter — J ≥ num/den forces
    # den·min(|a|,|b|) ≥ num·max(|a|,|b|); (2) positional filter —
    # the remaining-suffix overlap bound min(|a|−pa, |b|−pb)+1 must
    # reach the equivalent-overlap requirement α =
    # ceil(num·(|a|+|b|)/(num+den)) (J ≥ t ⟺ overlap ≥
    # t/(1+t)·(|a|+|b|)).
    sza, szb = F.col("a.sz"), F.col("b.sz")
    # integer ceil via div — a float quotient here could over-prune
    alpha = F.expr(
        f"(({num} * (a.sz + b.sz) + {num + den - 1}) div {num + den})"
    )
    # candidates join on xxhash64(s), not the shingle string: cheaper
    # shuffle keys, and a hash collision only ADDS a candidate that
    # exact verification discards — the output is unaffected.
    cand = (
        a.join(
            b,
            (F.xxhash64(F.col("a.s")) == F.xxhash64(F.col("b.s")))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.lit(den) * F.least(sza, szb)
               >= F.lit(num) * F.greatest(sza, szb))
            & (
                F.least(sza - F.col("a.rn"), szb - F.col("b.rn"))
                + F.lit(1)
                >= alpha
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    # Repartition the candidate pairs before verification (round 14):
    # the pair frame is tiny in BYTES (two ids per row), so AQE
    # coalesces it onto 1-4 partitions — and the per-pair
    # array_intersect over both full shingle arrays (the CPU floor of
    # verification: measured 7.7s serial vs 3.2s spread, end-to-end
    # 6.3→3.2s at sf0.1) then runs nearly serially. The stats-gated
    # _spread cannot make this call: a self-join output's size
    # estimate is a row-product overestimate, so the gate always
    # skips. An explicit round-robin to defaultParallelism is correct
    # at every scale — the shuffle moves two ids per row while the
    # stage it feeds does work proportional to pairs/core.
    try:
        _target = cand.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect session: no SparkContext handle
        _target = int(
            cand.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    cand = cand.repartition(_target)
    # Verify with set arrays, not a re-exploded join: each candidate
    # pair carries both (sorted, distinct) shingle arrays and counts
    # the intersection in codegen — no pair×shingles shuffle.
    sets = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_set("s")).alias("arr"),
        F.count(F.lit(1)).cast("long").alias("n_sh"),
    )
    common = (
        cand.join(
            sets.select(
                F.col(id_col).alias("doc_a"),
                F.col("arr").alias("arr_a"),
                F.col("n_sh").alias("sa"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("doc_b"),
                F.col("arr").alias("arr_b"),
                F.col("n_sh").alias("sb"),
            ),
            "doc_b",
        )
        .withColumn(
            "n_common",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("long"),
        )
    )
    union_sz = F.col("sa") + F.col("sb") - F.col("n_common")
    return (
        common.filter(F.col("n_common") * den >= num * union_sz)
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            # raw exact-operand division (see ngram_jaccard_pairs)
            (F.col("n_common").cast("double") / union_sz).alias(
                "jaccard"
            ),
        )
    )
