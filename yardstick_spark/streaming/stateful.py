"""Custom stateful streaming operator via applyInPandasWithState.

`user_activity_stats` maintains per-user running aggregates (event
count, value sum, last-seen) across micro-batches and EMITS a session
summary when a user goes inactive past the timeout — the shape native
`session_window` cannot express when the output needs custom
state-transition logic (e.g. carrying arbitrary accumulator structs).

State is one small tuple per key; Spark shuffles by user_id once and
keeps state in the state store between triggers — the standard pattern
for a 100 TB event stream where per-key state fits memory.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("value_sum", DoubleType()),
    StructField("last_seen_ms", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("status", StringType()),   # active | expired
    StructField("n_events", LongType()),
    StructField("value_sum", DoubleType()),
])


def _update(key: Any, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    (user_id,) = key
    n, vsum, last = state.get if state.exists else (0, 0.0, 0)
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame({
            "user_id": [user_id], "status": ["expired"],
            "n_events": [n], "value_sum": [round(vsum, 2)],
        })
        return
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].max().value // 1_000_000))
    state.update((n, vsum, last))
    state.setTimeoutDuration(30 * 60 * 1000)  # 30 min inactivity
    yield pd.DataFrame({
        "user_id": [user_id], "status": ["active"],
        "n_events": [n], "value_sum": [round(vsum, 2)],
    })


def user_activity_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator with inactivity timeout.

    events: streaming DataFrame with (user_id, ts, value).
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
