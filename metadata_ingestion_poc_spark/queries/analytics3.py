"""Sixth analytics batch: Bloom-filter semi-join reduction.

- q167: selective star join with an explicit Bloom-filter prune on
  the fact side (operators/bloom.py) — the filter is built on the
  filtered part dimension, broadcast as a single-row array<bigint>,
  and drops non-joining lineitem rows BEFORE the join. The DuckDB
  oracle is the plain join, so the driver hash-check differentially
  proves the prune's no-false-negative guarantee end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ..catalog import load_table
from ._util import sql_dsum, dsum


@query(
    "q167_bloom_prune_join",
    oracle=f"""
    SELECT p.p_brand,
           COUNT(*) AS line_count,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 2
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q167_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by brand for small parts, with the fact side pruned by
    a Bloom filter on the filtered dimension's keys before the join.

    The filter (1 MiB of state regardless of SF) is what shrinks the
    fact-side work at 100 TB: only might-match rows reach the join —
    and, in the shuffle-join case this stands in for, the exchange.
    The subsequent broadcast equi-join removes the Bloom false
    positives, so the result is exactly the plain join's (the oracle
    proves it).
    """
    from ..operators.bloom import bloom_build, bloom_prune

    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 2)
    dim = part.select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    bf = bloom_build(dim, "p_partkey", num_bits=1 << 20, num_hashes=5)
    pruned = bloom_prune(li, bf, "l_partkey")
    return (
        pruned.join(
            F.broadcast(dim), pruned.l_partkey == dim.p_partkey, "inner"
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("line_count"),
            dsum("rev", "revenue"),
        )
        .orderBy("p_brand")
    )
