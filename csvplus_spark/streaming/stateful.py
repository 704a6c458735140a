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


SESSION_OUTPUT_SCHEMA = "user_id long, session_start timestamp, n_events long"
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def _session_closer(gap_us: int):
    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        def row(start_us: int, n: int) -> dict:
            return {"user_id": key[0],
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "n_events": n}

        if state.hasTimedOut:
            # watermark passed last event + gap: the session is closed
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame([row(start_us, n)])
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(
                pdf["ts"].values.astype("datetime64[us]").astype("int64").tolist())
        ts_us.sort()
        closed = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = n = None
        for t in ts_us:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us <= gap_us:
                # late-but-within-watermark data must never move the
                # session clock backward: a batch whose max ts is older
                # than the stored last_us would otherwise rewind
                # last_us, fire the timeout gap-after-a-stale-timestamp
                # and split one true session in two. Merge against the
                # stored extremes instead.
                start_us = min(start_us, t)
                last_us = max(last_us, t)
                n += 1
            else:  # gap inside the batch: close mid-batch session now
                closed.append(row(start_us, n))
                start_us, last_us, n = t, t, 1
        state.update((start_us, last_us, n))
        # event-time timeout: fires once the WATERMARK (not wall clock)
        # passes last event + gap — late data within the gap still merges
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        yield pd.DataFrame(closed, columns=["user_id", "session_start", "n_events"])

    return update


def rocksdb_state_conf() -> dict:
    """Session configs for the RocksDB state store — at production
    scale the default HDFS-backed in-memory store holds every open
    session on-heap, so #active-keys is bounded by executor memory;
    RocksDB spills state to local disk with changelog checkpointing and
    bounds the heap at a block-cache. Apply BEFORE the streaming query
    starts (state-store providers cannot change across restarts of the
    same checkpoint):

        for k, v in rocksdb_state_conf().items():
            spark.conf.set(k, v)

    Not applied by default here: tests run tiny state where RocksDB's
    native-library startup only adds latency.
    """
    return {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        # changelog checkpointing ships deltas, not full snapshots
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing."
        "enabled": "true",
        # bound the native block cache (per executor, all stores)
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    }


def sessionize_with_timeout(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user sessions CLOSED by event-time timeout: the custom-state
    twin of session_window that can carry arbitrary per-session state
    (here start + count). State per key is one open session; the
    timeout (watermark > last event + gap) emits and clears it, so
    memory is O(#active users) regardless of stream length. The input
    stream must carry a watermark on ``ts``. For large key cardinality
    pair this with :func:`rocksdb_state_conf`.
    """
    import re

    m = re.match(r"(\d+)\s*(second|minute|hour)s?", gap)
    unit_us = {"second": 1_000_000, "minute": 60_000_000,
               "hour": 3_600_000_000}[m.group(2)]
    gap_us = int(m.group(1)) * unit_us
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_closer(gap_us),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
