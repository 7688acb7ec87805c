"""Set operations: UNION [ALL], INTERSECT [ALL], EXCEPT [ALL].
SURVEY.md §2 B7. Spark implements these as aggregate/join rewrites;
distinct-based variants shuffle on the full row hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(F.col("s_nationkey").alias("nationkey"))


@query(
    "q26_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    ) ORDER BY nationkey
    """,
)
def q26_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .union(_supp_nations(spark, sf_dir))
        .distinct()
        .orderBy("nationkey")
    )


@query(
    "q27_union_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*)::BIGINT AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey ORDER BY nationkey
    """,
)
def q27_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .unionByName(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


@query(
    "q28_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q28_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .intersect(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@query(
    "q29_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    ORDER BY c_custkey
    """,
)
def q29_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in debt: EXCEPT-distinct via subtract."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey")
        .subtract(c.filter(F.col("c_acctbal") > 0).select("c_custkey"))
        .orderBy("c_custkey")
    )
