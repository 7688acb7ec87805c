"""Query registry — the engine's declared operator surface.

Every operator family from SURVEY.md §2 registers here as one or more
named queries. Each query is a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) an equivalent DuckDB oracle SQL
string; the driver's correctness harness runs both and compares
row count + schema + order-insensitive value hash.

Conventions that make cross-engine hashing deterministic:

- every computed column is aliased identically on both sides;
- double aggregates go through DECIMAL(28,6) so the reduction is
  exact and order-independent, then are rounded and cast back to
  double (see queries/_util.py);
- timestamps in outputs are µs-precision (catalog.py normalizes);
- any intentionally-unordered sample (e.g. LIMIT without full
  ordering) is avoided — top-k always has a total order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registration side effects run.

    Import order IS registry order, and external harnesses sweep the
    registry in insertion order under a time budget — so cheap,
    sub-second families register first and the expensive embedding /
    near-dup suites register last. Keep new modules in cost order.
    """
    from . import (  # noqa: F401
        # -- cheap relational core (sub-second each at sf0.01) --
        relational,
        scalar_funcs,
        scalar_funcs2,
        setops,
        windows,
        subqueries,
        aggregates,
        reshape,
        stats_extra,
        timeseries,
        # -- joins + TPC-H composite shapes (1-2 s each) --
        joins_extra,
        tpch_extra,
        tpch_extra2,
        tpch_extra3,
        tpch_extra4,
        analytics,
        streaming_batch,
        # -- curation / text ops (moderate) --
        llm_ops3,
        llm_ops4,
        quality_checks,
        # -- embedding similarity + near-dup (most expensive) --
        llm_ops2,
        llm_ops,
    )


_load_all()
