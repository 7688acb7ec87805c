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


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lower-case whitespace tokenization → `tokens` array column."""
    return df.withColumn(
        "tokens", F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    )


def shingles(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingle strings → `shingles` array column.

    Built with sequence+transform (JVM higher-order funcs), one pass,
    no explode until the caller asks for the inverted index.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return df.withColumn(
        "shingles",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
                ),
            )
        ),
    )


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
    idx = (
        shingles(docs, n=n)
        .select(F.col(id_col).alias("doc"), F.explode("shingles").alias("sh"))
        .distinct()
    )
    if max_shingle_df is not None:
        w = Window.partitionBy("sh")
        idx = idx.withColumn("__df", F.count(F.lit(1)).over(w)).filter(
            F.col("__df") <= max_shingle_df
        ).drop("__df")
    return idx


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via inverted shingle index.

    jaccard(a,b) = |A∩B| / (|A|+|B|-|A∩B|), computed from the count of
    co-occurring shingles per pair — one self-join on the shingle key,
    then a pair-level aggregate. Returns (doc_a, doc_b, jaccard) with
    doc_a < doc_b and jaccard rounded to 6dp.
    """
    idx = _shingle_index(docs, id_col, n, max_shingle_df)
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))

    a = idx.alias("a")
    b = idx.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature(
    docs: DataFrame, num_hashes: int = 16, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature column `sig` (array of num_hashes int64 minima).

    Hash family: xxhash64 of the shingle salted with the hash index —
    deterministic across runs and partitionings.
    """
    with_sh = shingles(docs, n=n)
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("shingles"),
                    lambda s, k=k: F.xxhash64(s, F.lit(k)),
                )
            )
            for k in range(num_hashes)
        ]
    )
    return with_sh.withColumn("sig", sig).drop("shingles")


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

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )

    # exact verification: join shingle sets back on, Jaccard via
    # array_intersect (shingle arrays are bounded by doc length).
    sh = shingles(docs, n=n).select(
        F.col(id_col).alias("doc"), F.col("shingles")
    )
    sha = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    shb = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sha, "doc_a")
        .join(shb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / (
                    F.size("sh_a")
                    + F.size("sh_b")
                    - F.size(F.array_intersect("sh_a", "sh_b"))
                ),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash as 4×16-bit chunk columns (`sh0`..`sh3`).

    Per-bit majority vote over token hashes, computed as `bits`
    aggregate expressions in ONE pass over the exploded tokens (no UDF,
    no per-row Python). Chunked layout feeds Hamming-band LSH directly.
    """
    toks = tokenize(docs).select(
        F.col(id_col).alias("doc"), F.explode("tokens").alias("tok")
    )
    h = F.xxhash64("tok")
    bit_votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    voted = toks.groupBy("doc").agg(*bit_votes)
    chunks = []
    for c in range(bits // 16):
        expr = F.lit(0).cast("long")
        for i in range(16):
            bit = c * 16 + i
            expr = expr + F.when(F.col(f"b{bit}") > 0, F.lit(1 << i)).otherwise(0)
        chunks.append(expr.alias(f"sh{c}"))
    return voted.select(F.col("doc").alias(id_col), *chunks)


def simhash_pairs(
    docs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming.

    Band trick: with 4 chunks and distance ≤ 3, at least one chunk is
    identical (pigeonhole) — candidates are generated by joining on
    each chunk, then verified with exact popcount of the XOR.
    """
    sh = simhash(docs, id_col=id_col)
    chunk_cols = [c for c in sh.columns if c.startswith("sh")]

    banded = sh.select(
        F.col(id_col).alias("doc"),
        *chunk_cols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(c).alias("chunk"))
                    for i, c in enumerate(chunk_cols)
                ]
            )
        ).alias("bb"),
    ).select("doc", *chunk_cols, "bb.band", "bb.chunk")

    a, b = banded.alias("a"), banded.alias("b")
    hamming = sum(
        F.bit_count(
            F.col(f"a.{c}").bitwiseXOR(F.col(f"b.{c}"))
        )
        for c in chunk_cols
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
