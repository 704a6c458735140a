"""Column profiling — the ANALYZE-style pass a pipeline runs before
choosing dedup keys, join keys, or partition columns.

No reference counterpart (the reference exposes no stats surface);
pure extension. Deterministic by construction: counts only, no float
aggregation, so the DuckDB oracle matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct) for every column, in ONE
    aggregate job.

    The multi-`count_distinct` aggregate becomes a single Expand +
    two-phase hash aggregate in Spark (rows × #columns intermediate —
    the standard profile cost, still one shuffle); the one output row
    is then exploded into a row per column. ``n_distinct`` ignores
    NULLs, matching SQL ``COUNT(DISTINCT col)``.
    """
    aggs = [F.count(F.lit(1)).alias("__cp_rows__")]
    for i, c in enumerate(df.columns):
        aggs.append(
            F.sum(F.when(df[c].isNull(), 1).otherwise(0)).alias(f"__cp_nn_{i}__"))
        aggs.append(F.count_distinct(df[c]).alias(f"__cp_nd_{i}__"))
    one = df.agg(*aggs)
    per_col = F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__cp_nn_{i}__").cast("long").alias("n_nulls"),
            F.col(f"__cp_nd_{i}__").cast("long").alias("n_distinct"),
        )
        for i, c in enumerate(df.columns)
    ])).alias("p")
    return one.select(F.col("__cp_rows__").alias("n_rows"), per_col).select(
        F.col("p.col_name").alias("col_name"),
        "n_rows",
        F.col("p.n_nulls").alias("n_nulls"),
        F.col("p.n_distinct").alias("n_distinct"),
    )
