"""Python UDTF surface (functions/udtfs.py).

The chunker UDTF must stay semantics-identical to q68's JVM
sequence/slice chunker — the differential below is what allows the
docs to claim "UDTF = capability surface with a codegen twin".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.functions.udtfs import register_udtfs


def _jvm_chunks(d, size, stride):
    """q68's chunker shape (queries/llm_ops3.py), parameterized."""
    t = d.withColumn("toks", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    c = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("toks") - (size // 4) - 1, F.lit(0)),
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
    )


@pytest.mark.parametrize("size,stride", [(32, 24), (16, 16)])
def test_udtf_chunker_matches_jvm_twin(spark, sf_dir, size, stride):
    register_udtfs(spark)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    d.select("doc_id", "text").createOrReplaceTempView("__udtf_docs")
    got = sorted(
        map(
            tuple,
            spark.sql(
                f"""
                SELECT t.doc_id, c.chunk_idx, c.start, c.chunk_len,
                       c.chunk_text
                FROM __udtf_docs t,
                     LATERAL chunk_tokens(t.text, {size}, {stride}) c
                """
            ).collect(),
        )
    )
    want = sorted(map(tuple, _jvm_chunks(d, size, stride).collect()))
    assert got == want and got


def test_udtf_null_and_bad_args(spark):
    register_udtfs(spark)
    assert (
        spark.sql("SELECT * FROM chunk_tokens(NULL, 8, 4)").count() == 0
    )
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="size and stride"):
        spark.sql("SELECT * FROM chunk_tokens('a b c', 0, 4)").collect()
