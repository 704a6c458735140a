"""Custom stateful streaming operator via applyInPandasWithState.

No reference counterpart (SURVEY §2.11) — this is the extension point
for operators that need arbitrary per-key state across micro-batches
(running aggregates with custom merge logic, sessionization with
side conditions, dedup-within-horizon).

Shipped operator: ``running_user_stats`` — per-user running event count
+ running value sum + last-seen timestamp, updated every micro-batch
and emitted as one row per user per batch. State is a 3-tuple per key;
at 1000 executors the state store shards by key hash, and a watermark
(optional here — state is O(#users), not O(#events)) would bound it
for unbounded key spaces.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen timestamp"
)
STATE_SCHEMA = "n long, total double, last_us long"


def _update_user_stats(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max_us = int(
            pdf["ts"].values.astype("datetime64[us]").astype("int64").max()
        )
        last_us = max(last_us, batch_max_us)
    state.update((n, total, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [total],
        "last_seen": [pd.Timestamp(last_us, unit="us")],
    })


def running_user_stats(events: DataFrame) -> DataFrame:
    """Stateful per-user running stats over a streaming events frame
    (as produced by streaming.events.stream_events)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
