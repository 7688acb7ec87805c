"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user statistics that survive across micro-batches: event
count and value sum. State is per-key and, when ``timeout_ms`` is set,
bounded by a processing-time timeout — the pattern for any custom
streaming aggregator the built-in windowed aggs can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _make_update(timeout_ms: int):
    """Build the per-group update fn (factored out so the eviction /
    accumulation logic is unit-testable with a fake GroupState)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if timeout_ms > 0 and state.hasTimedOut:
            # key idle past the horizon: evict its state. Emits nothing;
            # if the key reappears its totals restart from zero.
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "total_value": pd.Series([], dtype="float64"),
                }
            )
            return
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        total = round(total, 6)
        state.update((n, total))
        if timeout_ms > 0:
            # re-arm on every batch the key appears in: the clock
            # measures idleness, not total lifetime.
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return update


def running_user_totals(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Streaming per-user running totals with explicit state.

    Each micro-batch updates (n_events, total_value) per user and emits
    the new running totals — the custom-operator shape for sessionizers,
    CDC reducers, online feature aggregates, etc.

    timeout_ms > 0 enables ProcessingTimeTimeout: a key idle for that
    long is evicted at a later micro-batch. REQUIRED on unbounded key
    domains — with NoTimeout (the 0 default, fine for bounded keys)
    state grows forever.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
