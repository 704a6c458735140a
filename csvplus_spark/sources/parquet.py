"""Parquet source — the driver's typed tables (TESTDATA.md).

No reference counterpart (the reference is CSV-only); this is the
native-layer scan. Parquet scans get predicate pushdown, column
pruning, and row-group min/max skipping from Catalyst for free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..frame import Frame


def from_parquet(spark: SparkSession, path: str, string_mode: bool = False) -> Frame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    # Spark rejects parquet TIMESTAMP(NANOS) by default (the driver's
    # events.ts is ns-precision); read it as long and convert below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp semantics must not depend on the caller's session TZ:
    # date_trunc / window alignment / ts→string all read the session
    # zone, and the DuckDB oracle sees naive (UTC-equivalent) values
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in df.columns:
        dt = df.schema[c].dataType
        if isinstance(dt, TimestampNTZType):
            # µs-precision parquet timestamps with no timezone surface as
            # TIMESTAMP_NTZ (Spark 4 inferTimestampNTZ). unix_micros /
            # window() / session_window() want TIMESTAMP; with the session
            # zone pinned UTC the cast is a wall-clock identity, matching
            # DuckDB's naive reading exactly.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif c in _NANOS_COLS and isinstance(dt, LongType):
            # TIMESTAMP(NANOS) columns surface as LongType; truncate ns→us
            # exactly like DuckDB's parquet reader does.
            # integer division: ns values exceed double's 53-bit mantissa
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    if string_mode:
        df = df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])
    return Frame(df, None, string_mode)


#: columns known to be ns-precision timestamps in the driver tables
_NANOS_COLS = {"ts"}


def load_table(spark: SparkSession, sf_dir: str, name: str, string_mode: bool = False) -> Frame:
    """Load one driver table, e.g. ``load_table(spark, sf_dir, "lineitem")``."""
    return from_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"), string_mode)
