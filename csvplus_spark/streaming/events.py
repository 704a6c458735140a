"""Event-time windowing over the ``events`` table.

No reference counterpart (SURVEY.md §2.11: the reference is bounded
batch) — this is pure Spark extension surface:

  * batch forms (``tumbling_agg``/``sliding_agg``/``session_agg``)
    express the same event-time semantics on a bounded DataFrame, so
    they are DuckDB-oracle-checkable;
  * ``stream_events``/``stream_tumbling_counts`` are the genuine
    Structured Streaming path (file source → watermark → windowed agg)
    with identical window semantics, verified in tests by comparing an
    availableNow run against the batch form.

Scale: windowed aggregations shuffle once on (window, key); watermarks
bound state for unbounded input; session windows use Spark's native
session_window (state-store backed, mergeable sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException


def tumbling_agg(df: DataFrame, window: str = "1 hour",
                 keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per window+keys."""
    w = F.window("ts", window)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys,
                "n_events", "sum_value")
    )


def sliding_agg(df: DataFrame, window_sec: int = 3600, slide_sec: int = 1800) -> DataFrame:
    """Sliding windows (window/slide in seconds): events count per window."""
    w = F.window("ts", f"{window_sec} seconds", f"{slide_sec} seconds")
    return (
        df.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_agg(df: DataFrame, gap: str = "10 minutes",
                key: str = "user_id") -> DataFrame:
    """Session windows per key with the given inactivity gap."""
    w = F.session_window("ts", gap)
    return (
        df.groupBy(w.alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), key, "n_events")
    )


# ----------------------------------------------------------------------
# genuine Structured Streaming path


def stream_events(spark: SparkSession, source_dir: str,
                  max_files_per_trigger: int | None = None,
                  schema=None) -> DataFrame:
    """readStream over a directory of events parquet files.

    Timestamp precision is NOT hardcoded: a one-off batch metadata read
    of the directory yields the footer-declared schema (ns → long under
    nanosAsLong, µs-no-tz → TIMESTAMP_NTZ), and the micro-batch stream
    then applies the SAME ``normalize_timestamps`` conversion as the
    batch source — the two paths share one code path and cannot
    silently diverge (guarded by tests/test_guards.py schema parity).

    The probe is driver-side footer metadata only (no data scan); at
    100 TB it costs one file-listing, amortized once per stream start.

    ``schema`` overrides the probe entirely — pass the RAW (pre-
    normalize) layout when starting a stream on an empty landing
    directory whose eventual files you know (ADVICE r5: the probe can't
    see files that haven't arrived). In particular a landing zone that
    will receive TIMESTAMP(NANOS) files needs ``ts`` declared LongType
    (the nanosAsLong surface form — normalize_timestamps div-1000s it);
    the no-schema cold-start fallback below assumes the driver's
    CURRENT events layout, µs TIMESTAMP_NTZ. The two raw forms are NOT
    interchangeable: declaring long against µs files silently reads
    raw micros as nanos (off by 1000×), declaring NTZ against ns files
    kills the stream — which is why the mismatch case is an explicit
    parameter, not a guess (tests pin both directions).
    """
    from ..sources.parquet import configure_parquet_session, normalize_timestamps

    configure_parquet_session(spark)
    if schema is None:
        try:
            # footer-only probe: schema as the streaming source will see it
            schema = spark.read.parquet(source_dir).schema
        except AnalysisException:
            # ONLY the missing/empty-path analysis error means "cold
            # start before the first file arrives" — a transient
            # listing/IO failure must PROPAGATE, not silently swap in
            # the fallback layout (a wrong guess here kills the stream
            # or misreads timestamps 1000×). Fallback = the documented
            # events layout, µs TIMESTAMP_NTZ ts, which
            # normalize_timestamps casts the same way as a probed schema
            from pyspark.sql.types import (DoubleType, LongType, StringType,
                                           StructField, StructType,
                                           TimestampNTZType)

            schema = StructType([
                StructField("event_id", LongType()),
                StructField("ts", TimestampNTZType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ])
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_timestamps(reader.parquet(source_dir))


def stream_session_counts(spark: SparkSession, source_dir: str,
                          gap: str = "10 minutes",
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming session windows per user: native session_window state
    merges sessions across micro-batches; the watermark closes sessions
    whose end has passed it (append-mode emission, bounded state)."""
    ev = stream_events(spark, source_dir).withWatermark("ts", watermark)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def write_stream_parquet(stream: DataFrame, path: str, checkpoint: str,
                         trigger_available_now: bool = True):
    """Parquet streaming sink with checkpointing: exactly-once file
    output via the streaming commit log. Returns the StreamingQuery."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sliding_counts(spark: SparkSession, source_dir: str,
                          window_sec: int = 3600, slide_sec: int = 1800,
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming sliding-window counts with a watermark for late data.

    Same window semantics as the batch :func:`sliding_agg` (each event
    lands in window/slide overlapping windows); state for a window is
    dropped once the watermark passes its end, so memory stays bounded
    at window/slide concurrent windows per key-partition.
    """
    ev = stream_events(spark, source_dir).withWatermark("ts", watermark)
    w = F.window("ts", f"{window_sec} seconds", f"{slide_sec} seconds")
    return (
        ev.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def stream_tumbling_counts(spark: SparkSession, source_dir: str,
                           window: str = "1 hour",
                           watermark: str = "1 hour") -> DataFrame:
    """Streaming tumbling-window counts with a watermark for late data.

    Append-mode compatible: state for a window is dropped once the
    watermark passes its end — bounded memory on unbounded streams.
    """
    ev = stream_events(spark, source_dir).withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
