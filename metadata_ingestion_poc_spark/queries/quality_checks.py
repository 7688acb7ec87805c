"""Data-quality validation query: the declarative expectations report
over the orders table, oracle-checked (every rule is plain SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.quality import validate
from . import query


@query(
    "q66_data_quality",
    oracle="""
    WITH t AS (SELECT COUNT(*) AS n FROM orders),
    v AS (
      SELECT 'o_orderkey' AS column, 'not_null' AS rule,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', 'in_range',
             SUM(CASE WHEN o_totalprice IS NOT NULL
                       AND (o_totalprice < 0 OR o_totalprice > 1000000)
                      THEN 1 ELSE 0 END)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', 'in_set',
             SUM(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O','F','P')
                      THEN 1 ELSE 0 END)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', 'regexp',
             SUM(CASE WHEN o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$')
                      THEN 1 ELSE 0 END)
      FROM orders
      UNION ALL
      SELECT 'o_orderkey', 'unique',
             COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
      FROM orders
    )
    SELECT v.column, v.rule, v.n_violations::BIGINT AS n_violations,
           t.n::BIGINT AS n_rows, v.n_violations = 0 AS passed
    FROM v, t
    ORDER BY v.column, v.rule
    """,
)
def q66_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rules = [
        {"column": "o_orderkey", "kind": "not_null"},
        {"column": "o_totalprice", "kind": "in_range", "min": 0, "max": 1_000_000},
        {"column": "o_orderstatus", "kind": "in_set", "values": ["O", "F", "P"]},
        {"column": "o_orderpriority", "kind": "regexp", "pattern": r"^[0-9]-[A-Z ]+$"},
        {"column": "o_orderkey", "kind": "unique"},
    ]
    return validate(o, rules).orderBy("column", "rule")
