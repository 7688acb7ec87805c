"""Cross-engine-deterministic aggregation helpers.

Summing doubles is order-dependent, and Spark's partial aggregation
order differs from DuckDB's (and from itself across partitionings).
Casting each addend to DECIMAL(28,6) first makes the reduction exact —
decimal addition is associative — so every engine and every partition
layout produces the identical value; results are rounded and cast back
to double for stable hashing. SQL equivalent:
``ROUND(SUM(CAST(x AS DECIMAL(28,6))), 6)::DOUBLE``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double column (exact via decimal)."""
    return F.round(F.sum(_c(col).cast(DEC)), 6).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, rounded."""
    c = _c(col)
    return (
        F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), 6)
        .cast("double")
        .alias(alias)
    )


def sql_dsum(expr: str, alias: str) -> str:
    return f"ROUND(SUM(CAST({expr} AS DECIMAL(28,6))), 6)::DOUBLE AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr}), 6)::DOUBLE AS {alias}"
    )
