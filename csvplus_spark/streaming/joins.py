"""Stream-stream joins — the last big Structured Streaming primitive
the engine exposes (SURVEY §2.11 extension surface; tumbling/sliding/
session windows, stateful sessionization, and ingest dedup live in the
sibling modules).

Spark buffers both sides in the state store and emits matches as they
arrive; WITHOUT watermarks + a time-range join condition that state
grows forever. This module builds the join with both bounds wired in,
so state for a row is dropped once the other side's watermark passes
its timestamp ± the interval — bounded memory on unbounded streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on_key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on_key`` where the right event lands
    within ±``within`` (event time) of the left event.

    Requirements Spark imposes on stream-stream joins are handled
    here: both inputs get event-time watermarks, and the join
    condition carries the explicit time-range predicate the state
    manager needs to evict buffered rows. ``how`` may be ``inner``,
    ``left`` (left-outer emits unmatched left rows once the watermark
    proves no match can arrive) or ``full`` (both sides' unmatched
    rows emit with nulls at state eviction — Spark supports full-outer
    stream-stream joins under the same watermark + time-range-condition
    requirements).

    Column naming: every right-side column is prefixed ``r_`` in the
    output (the join key and timestamps included), so self-joins of
    one stream need no manual aliasing.

    Scale: state per key is bounded by (watermark + within) of
    buffered rows per side; the join itself shuffles both streams by
    key — the same partitioning any keyed stateful op uses.
    """
    if how not in ("inner", "left", "leftOuter", "left_outer",
                   "full", "fullOuter", "full_outer"):
        raise ValueError(
            f"stream_interval_join supports inner/left/full, got {how!r}")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select(*[F.col(c).alias(f"r_{c}") for c in rw.columns])
    cond = (
        (F.col(on_key) == F.col(f"r_{on_key}"))
        & (F.col(f"r_{right_ts}")
           >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (F.col(f"r_{right_ts}")
           <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    join_type = ("full_outer" if how.startswith("full")
                 else "left_outer" if how.startswith("left") else "inner")
    return lw.join(rw, cond, join_type)
