"""Bucketed tables: co-located joins without a shuffle.

The 100 TB pattern for a fact table joined repeatedly on the same key
(orders ⋈ lineitem on orderkey, user events ⋈ profiles on user_id):
write both sides ``bucketBy(N, key)`` once, and every subsequent join
on that key is planned WITHOUT an Exchange on either side — the
bucketing IS the shuffle, paid once at write time instead of per
query. ``sortBy`` additionally lets the SortMergeJoin skip its sorts
when each bucket is a single file.

Uses Spark's built-in session catalog (no Hive needed); bucketing
metadata lives with the table, so any reader through
``spark.table(name)`` gets the co-location for free. Pinned by
tests/test_plans.py::test_bucketed_join_avoids_shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str] | str,
                   n_buckets: int = 32, sort: bool = True,
                   single_file_buckets: bool = False) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table in the session catalog.

    ``n_buckets`` must MATCH on both sides of a co-located join.
    ``single_file_buckets`` repartitions by the bucket columns first so
    each bucket is one file — required for full sort elimination, at
    the cost of one shuffle during the write (which replaces every
    future join shuffle, so it amortizes immediately).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if single_file_buckets:
        df = df.repartition(n_buckets, *cols)
    writer = (
        df.write.format("parquet").mode("overwrite")
        .bucketBy(n_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read; bucketing metadata rides along automatically."""
    return spark.table(table)
