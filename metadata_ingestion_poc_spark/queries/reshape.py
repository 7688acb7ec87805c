"""Reshaping: pivot (long→wide) and unpivot/melt (wide→long)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "q19_pivot",
    oracle="""
    SELECT l_returnflag,
           COALESCE(SUM(CASE WHEN l_linestatus = 'F'
                 THEN CAST(l_quantity AS DECIMAL(28,6)) END), 0)
             ::DOUBLE AS qty_F,
           COALESCE(SUM(CASE WHEN l_linestatus = 'O'
                 THEN CAST(l_quantity AS DECIMAL(28,6)) END), 0)
             ::DOUBLE AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q19_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — at scale, always pass the
    pivot values (otherwise Spark runs an extra distinct job first)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")))
        .select(
            "l_returnflag",
            F.coalesce(F.col("F"), F.lit(0)).cast("double").alias("qty_F"),
            F.coalesce(F.col("O"), F.lit(0)).cast("double").alias("qty_O"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q19b_unpivot",
    oracle="""
    SELECT p_partkey, metric, ROUND(value, 6)::DOUBLE AS value
    FROM (
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
      FROM part
      UNION ALL
      SELECT p_partkey, 'p_size', p_size::DOUBLE FROM part
    )
    WHERE p_partkey <= 100
    ORDER BY p_partkey, metric
    """,
)
def q19b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return (
        p.select(
            "p_partkey",
            F.col("p_retailprice").cast("double"),
            F.col("p_size").cast("double"),
        )
        .melt(
            ids=["p_partkey"],
            values=["p_retailprice", "p_size"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .withColumn("value", F.round("value", 6))
        .orderBy("p_partkey", "metric")
    )
