"""Third batch of [EXT] LLM-pipeline ops: PII-style redaction, document
chunking for training windows, and sequence packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


# ---------------------------------------------------------------------------
# Pattern redaction (PII scrubbing shape): mask email-like and long-digit
# tokens, report how much was touched. The docs corpus is word salad, so
# the patterns also cover plain long words as a stand-in — the operator
# shape (regexp_replace chain + impact accounting) is what matters.
# ---------------------------------------------------------------------------
@query(
    "q67_pattern_redaction",
    oracle="""
    WITH r AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                 '\\d{6,}', '<NUM>', 'g'),
               '\\b[a-z]{8,}\\b', '<LONG>', 'g') AS redacted,
             text
      FROM documents
    )
    SELECT doc_id,
           length(text)::INT AS n_before,
           length(redacted)::INT AS n_after,
           (text <> redacted) AS was_redacted
    FROM r
    ORDER BY doc_id
    """,
)
def q67_pattern_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), r"[a-z0-9._]+@[a-z0-9.]+", "<EMAIL>"),
            r"\d{6,}",
            "<NUM>",
        ),
        r"\b[a-z]{8,}\b",
        "<LONG>",
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_before"),
        F.length(redacted).alias("n_after"),
        (F.col("text") != redacted).alias("was_redacted"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Document chunking: fixed-size token windows with overlap (stride),
# one row per chunk — pure built-ins (sequence + slice + concat).
# ---------------------------------------------------------------------------
@query(
    "q68_doc_chunking",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
               FROM documents WHERE doc_id < 50),
    c AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - 8, 1), 24)) AS start
      FROM t
    )
    SELECT doc_id, (start / 24)::INT AS chunk_idx, start::INT AS start,
           least(32, len(toks) - start)::INT AS chunk_len,
           array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
)
def q68_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-token chunks with stride 24 (8-token overlap)."""
    size, stride = 32, 24
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    t = d.withColumn("toks", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    c = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("toks") - 9, F.lit(0)),
                F.lit(stride),
            )
        ).alias("start"),
    )
    return c.select(
        "doc_id",
        (F.col("start") / stride).cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start"),
        F.least(F.lit(size), F.size("toks") - F.col("start"))
        .cast("int")
        .alias("chunk_len"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("start") + 1, size)
        ).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Sequence packing — grouped-map pandas (deterministic greedy), rows-only
# (pandas loop isn't SQL); invariants pinned in tests/test_packing.py.
# ---------------------------------------------------------------------------
@query("q69_sequence_packing")
def q69_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_documents, packing_stats

    d = load_table(spark, sf_dir, "documents")
    packed = pack_documents(d, budget=512, group_col="source")
    return packing_stats(packed, budget=512)
