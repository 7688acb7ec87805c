"""Sequence packing: greedily pack documents into fixed-size token
budgets (context windows) — the standard LLM pre-training step that
turns ragged documents into dense training sequences.

Packing is inherently sequential *within a bin stream*, so it runs as
grouped applyInPandas: each group (e.g. a source shard) packs
independently and in parallel; within a group the greedy first-fit
loop is vectorized-enough pandas. Determinism: documents are packed in
(sort_col) order, so the same input always yields the same packing —
required for reproducible training data.

At 100 TB you choose the group key so groups are ~executor-sized
(source × hash-bucket), giving full parallelism with bounded memory;
the operator never holds more than one group per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    IntegerType,
    StructField,
    StructType,
)

PACKED_SCHEMA = StructType(
    [
        StructField("group_key", LongType()),
        StructField("bin_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", IntegerType()),
        StructField("offset", IntegerType()),
    ]
)


def pack_documents(
    docs: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    group_col: str | None = "source",
    sort_col: str = "doc_id",
) -> DataFrame:
    """Greedy first-fit-decreasing-free packing (stable doc order).

    Returns one row per (bin, doc): which bin each document landed in,
    its token count, and its token offset within the bin. Documents
    longer than the budget get a bin of their own (truncation is the
    caller's policy decision).
    """
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    prepared = docs.select(
        (
            F.xxhash64(F.col(group_col)) if group_col else F.lit(0)
        ).alias("group_key"),
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("int").alias("n_tokens"),
        F.col(sort_col).alias("__sort"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__sort")
        bins, offsets = [], []
        bin_id, used = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > budget:
                bin_id += 1
                used = 0
            bins.append(bin_id)
            offsets.append(used)
            used += n
            if used >= budget:
                bin_id += 1
                used = 0
        out = pdf[["group_key", "doc_id", "n_tokens"]].copy()
        out["bin_id"] = bins
        out["offset"] = offsets
        return out[["group_key", "bin_id", "doc_id", "n_tokens", "offset"]]

    return prepared.groupBy("group_key").applyInPandas(pack, PACKED_SCHEMA)


def packing_stats(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Bin utilization report: docs per bin, fill ratio."""
    per_bin = packed.groupBy("group_key", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_used"),
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(F.avg("n_docs"), 4).alias("avg_docs_per_bin"),
        F.round(F.avg(F.col("tokens_used") / F.lit(budget)), 4).alias(
            "avg_fill_ratio"
        ),
        F.max("tokens_used").alias("max_tokens_in_bin"),
    )
