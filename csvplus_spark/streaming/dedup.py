"""Streaming deduplication: keep the first arrival of each key, with
state bounded by the watermark horizon.

The batch dedup family (operators/dedup.py) answers "which docs in
this corpus are duplicates"; this module answers the INGEST-side
question — "drop re-arrivals of a doc we already admitted" — for a
continuously arriving corpus (crawler output, log shipping). Uses
``dropDuplicatesWithinWatermark``: exact within the watermark horizon,
and the per-key state is EVICTED once the watermark passes, so state
size is bounded by the horizon's key arrival rate rather than growing
forever (plain ``dropDuplicates`` on a stream retains every key ever
seen — an unbounded-state footgun at 100 TB ingest).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(stream: DataFrame, keys: Sequence[str] = ("fingerprint",),
                 ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """First-arrival-wins streaming dedup on ``keys``.

    A re-arrival is dropped if it lands within ``delay`` (event time)
    of the first arrival's watermark window; re-arrivals later than
    the horizon are admitted again (the trade every bounded-state
    streaming dedup makes — pick ``delay`` ≥ the dup-arrival spread,
    e.g. a crawler's recrawl interval). Exactly-once per key within
    the horizon, state bounded by keys-per-horizon.
    """
    return (
        stream.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def fingerprinted(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the same md5 normalized-text fingerprint the batch exact
    dedup keys on (operators/text.py::fingerprint) — so a streaming
    ingest dedup and a later batch compaction agree on identity."""
    from ..operators.text import fingerprint

    return stream.withColumn("fingerprint", fingerprint(text_col))
