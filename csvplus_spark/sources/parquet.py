"""Parquet source — the driver's typed tables (TESTDATA.md).

No reference counterpart (the reference is CSV-only); this is the
native-layer scan. Parquet scans get predicate pushdown, column
pruning, and row-group min/max skipping from Catalyst for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..frame import Frame


def configure_parquet_session(spark: SparkSession) -> None:
    """Session flags every parquet read (batch OR stream) depends on.

    * ``nanosAsLong``: Spark rejects parquet TIMESTAMP(NANOS) by default;
      read it as long and convert in :func:`normalize_timestamps`.
    * pinned-UTC session zone: timestamp semantics must not depend on the
      caller's TZ — date_trunc / window alignment / ts→string all read
      the session zone, and the DuckDB oracle sees naive (UTC-equivalent)
      values.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Canonicalize event-time columns to µs TIMESTAMP, whatever the
    parquet footer declared. Shared by the batch source and the
    streaming source so the two paths can never diverge (the r4 bug:
    only the batch path learned the µs layout).

    * TIMESTAMP_NTZ (µs parquet timestamps without a timezone — Spark 4
      inferTimestampNTZ): cast to TIMESTAMP. With the session zone
      pinned UTC the cast is a wall-clock identity, matching DuckDB's
      naive reading exactly.
    * TIMESTAMP(NANOS) (surfaces as LongType under nanosAsLong, only
      for the known ns columns): exact integer ns→µs truncation like
      DuckDB's parquet reader. Integer division — ns values exceed
      double's 53-bit mantissa.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, LongType, MapType, StructType,
                                   TimestampNTZType, TimestampType)

    def _swap_ntz(dt):
        """Rewrite TIMESTAMP_NTZ→TIMESTAMP anywhere inside a (possibly
        nested) type; returns None when nothing needs converting."""
        if isinstance(dt, TimestampNTZType):
            return TimestampType()
        if isinstance(dt, StructType):
            fields = {f.name: _swap_ntz(f.dataType) for f in dt.fields}
            if any(v is not None for v in fields.values()):
                return StructType([
                    f.__class__(f.name, fields[f.name] or f.dataType,
                                f.nullable, f.metadata)
                    for f in dt.fields
                ])
        if isinstance(dt, ArrayType):
            inner = _swap_ntz(dt.elementType)
            if inner is not None:
                return ArrayType(inner, dt.containsNull)
        if isinstance(dt, MapType):
            k, v = _swap_ntz(dt.keyType), _swap_ntz(dt.valueType)
            if k is not None or v is not None:
                return MapType(k or dt.keyType, v or dt.valueType,
                               dt.valueContainsNull)
        return None

    for c in df.columns:
        dt = df.schema[c].dataType
        swapped = _swap_ntz(dt)
        if swapped is not None:
            # cast recurses through struct/array/map fields (ADVICE r4:
            # nested NTZ must not silently pass through); df[c] — not
            # F.col — so dotted raw parquet names resolve literally
            df = df.withColumn(c, df[c].cast(swapped))
        elif c in _NANOS_COLS and isinstance(dt, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def from_parquet(spark: SparkSession, path: str, string_mode: bool = False) -> Frame:
    from pyspark.sql import functions as F

    configure_parquet_session(spark)
    df = normalize_timestamps(spark.read.parquet(path))
    if string_mode:
        df = df.select(*[df[c].cast("string").alias(c) for c in df.columns])
    return Frame(df, None, string_mode)


#: columns known to be ns-precision timestamps in the driver tables
_NANOS_COLS = {"ts"}


def load_table(spark: SparkSession, sf_dir: str, name: str, string_mode: bool = False) -> Frame:
    """Load one driver table, e.g. ``load_table(spark, sf_dir, "lineitem")``."""
    return from_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"), string_mode)
