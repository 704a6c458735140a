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


def _parse_duration_us(text: str, what: str) -> int:
    """'<n> second(s)|minute(s)|hour(s)|day(s)' → microseconds (shared
    by the sessionizer gap and the running-stats TTL)."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", text)
    if m is None:
        raise ValueError(
            f"unsupported {what} {text!r}: expected '<n> second(s)|"
            f"minute(s)|hour(s)|day(s)'")
    unit_us = {"second": 1_000_000, "minute": 60_000_000,
               "hour": 3_600_000_000, "day": 86_400_000_000}[m.group(2)]
    return int(m.group(1)) * unit_us


def _make_update_user_stats(ttl_us: int | None):
    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        if ttl_us is not None and state.hasTimedOut:
            # idle past the TTL: evict silently — the user's stats
            # restart from zero if they ever reappear
            state.remove()
            return
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max_us = int(
                pdf["ts"].values.astype("datetime64[us]").astype("int64").max()
            )
            last_us = max(last_us, batch_max_us)
        state.update((n, total, last_us))
        if ttl_us is not None:
            # event-time eviction point; must land strictly beyond the
            # current watermark or Spark rejects the timestamp
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max((last_us + ttl_us) // 1000, wm_ms + 1))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        })

    return update


def running_user_stats(events: DataFrame, ttl: str | None = None) -> DataFrame:
    """Stateful per-user running stats over a streaming events frame
    (as produced by streaming.events.stream_events).

    State is one 3-tuple per user — O(#users), which is fine for a
    bounded user space but grows forever on an unbounded key space
    (device ids, session tokens). Pass ``ttl`` (e.g. ``"30 minutes"``)
    to bound it by EVENT-TIME idleness: a key whose last event is
    older than watermark − ttl is evicted (silently — its stats
    restart from zero if the key reappears), so state is O(#keys
    active within the TTL horizon). Requires a watermark on ``ts``
    upstream, same as the sessionizer (VERDICT r6 item 7)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user_stats(
                _parse_duration_us(ttl, "ttl") if ttl else None),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(GroupStateTimeout.EventTimeTimeout if ttl
                         else GroupStateTimeout.NoTimeout),
        )
    )


SESSION_OUTPUT_SCHEMA = "user_id long, session_start timestamp, n_events long"
#: COMPATIBILITY: this state layout replaced the earlier scalar
#: (start_us, last_us, n) schema when emission became watermark-final.
#: applyInPandasWithState has no state-schema migration — a checkpoint
#: written by the old layout cannot be resumed by this operator; drain
#: the old query (advance the watermark past every open session) or
#: start from a fresh checkpoint.
SESSION_STATE_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"


def _session_closer(gap_us: int):
    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        """Per-key session maintenance with WATERMARK-FINAL emission.

        State buffers EVERY session that late-but-within-watermark data
        could still touch, as parallel (start, last, n) arrays; a
        session is emitted only once watermark > last + gap, at which
        point no admissible event (ts ≥ watermark) can merge with it
        forward (t ≥ wm ≥ last+gap) or backward (t ≥ wm > start+gap).
        This fixes two review-r6 defects of the emit-on-mid-batch-gap
        form: a stray late event hours before the open session no
        longer rewinds it (it opens its OWN buffered session — merge is
        by interval distance, not t ≤ last+gap, whose negative deltas
        matched everything older), and a late event can no longer
        re-open an overlapping copy of an already-emitted session.
        """
        import pandas as pd

        wm_us = state.getCurrentWatermarkMs() * 1000

        sessions: list[tuple[int, int, int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            sessions = list(zip(starts, lasts, ns))

        ts_us: list[int] = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us.extend(
                    pdf["ts"].values.astype("datetime64[us]")
                    .astype("int64").tolist())

        # interval sweep: stored sessions + new points, sorted by
        # start; adjacent items merge when the gap between them closes
        # (a new point can legitimately BRIDGE two stored sessions)
        items = sessions + [(t, t, 1) for t in ts_us]
        items.sort(key=lambda x: (x[0], x[1]))
        merged: list[tuple[int, int, int]] = []
        for s, l, n in items:
            if merged and s - merged[-1][1] <= gap_us:
                ps, pl, pn = merged[-1]
                merged[-1] = (ps, max(pl, l), pn + n)
            else:
                merged.append((s, l, n))

        # emission must be STRICT: an admissible event can arrive with
        # ts == wm exactly, and merge uses `t - last <= gap`, so a
        # session with last + gap == wm could still absorb it — only
        # last + gap < wm is final
        final = [x for x in merged if x[1] + gap_us < wm_us]
        keep = [x for x in merged if x[1] + gap_us >= wm_us]
        if keep:
            state.update(([s for s, _, _ in keep],
                          [l for _, l, _ in keep],
                          [n for _, _, n in keep]))
            # event-time timeout at the earliest possible close; must
            # be strictly beyond the current watermark (guaranteed by
            # the keep predicate, +1ms guards the floor-division edge)
            state.setTimeoutTimestamp(
                max((min(l for _, l, _ in keep) + gap_us) // 1000,
                    wm_us // 1000 + 1))
        elif state.exists:
            state.remove()
        if final:
            yield pd.DataFrame(
                [{"user_id": key[0],
                  "session_start": pd.Timestamp(s, unit="us"),
                  "n_events": n} for s, l, n in final])

    return update


def check_session_checkpoint(spark, checkpoint_dir: str,
                             state_schema: str = SESSION_STATE_SCHEMA) -> bool | None:
    """Pre-flight a checkpoint against the CURRENT state layout.

    applyInPandasWithState has no state-schema migration: resuming a
    checkpoint written under an older layout (e.g. the scalar
    ``start_us/last_us/n`` form this operator used before emission
    became watermark-final) fails at runtime with an opaque JVM
    state-deserialization error (ADVICE r6). Call this with the
    writeStream's ``checkpointLocation`` BEFORE ``start()``:

    - returns ``None`` — no state schema recorded yet (fresh
      checkpoint, or a pre-schema-file Spark wrote it): safe to start;
    - returns ``True`` — recorded state fields match ``state_schema``;
    - raises ``ValueError`` with migration guidance on mismatch:
      either DRAIN the old query (advance the watermark past every
      open session so state empties, stop, then delete the checkpoint)
      or start from a fresh checkpoint and accept re-processing per
      the source's retention.

    Reads ``state/0/*/_metadata/schema`` through ``binaryFile`` so any
    checkpoint scheme (hdfs://, s3a://, local) works without extra FS
    plumbing.
    """
    import json

    from pyspark.sql.types import StructType

    expected = [f.name for f in StructType.fromDDL(state_schema).fields]
    try:
        rows = (spark.read.format("binaryFile")
                .load(checkpoint_dir.rstrip("/") + "/state/0/*/_metadata/schema")
                .select("content").limit(1).collect())
    except Exception:
        return None  # no state written yet — nothing to be incompatible with
    if not rows:
        return None
    raw = bytes(rows[0]["content"]).decode("utf-8", errors="replace")
    # the file is length-prefixed binary around JSON structs: extract
    # each {"type":"struct",...} object by brace matching and keep the
    # one carrying the groupState wrapper (the VALUE schema)
    stored: list[str] | None = None
    i = 0
    while True:
        i = raw.find('{"type"', i)
        if i < 0:
            break
        # brace-match SKIPPING quoted spans (review r7: a field name
        # containing a brace — legal via backticks — would otherwise
        # mis-slice the JSON and fail open)
        depth, j, in_str, esc = 0, i, False, False
        while j < len(raw):
            ch = raw[j]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        try:
            obj = json.loads(raw[i:j + 1])
            for f in obj.get("fields", []):
                if f.get("name") == "groupState":
                    stored = [g["name"] for g in f["type"]["fields"]]
        except Exception:
            pass
        i = j + 1
    if stored is None:
        return None
    if stored != expected:
        raise ValueError(
            f"checkpoint {checkpoint_dir} holds state fields {stored} but "
            f"this operator now expects {expected}; applyInPandasWithState "
            "cannot migrate state schemas. Either DRAIN the old query "
            "(advance the watermark past every open session, stop, delete "
            "the checkpoint) or start from a fresh checkpointLocation."
        )
    return True


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
    gap_us = _parse_duration_us(gap, "gap")
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
