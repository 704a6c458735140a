"""SQL facade: register the driver tables as temp views so users can
mix the fluent Frame API with plain ``spark.sql``.

Everything the engine plans fluently is equally expressible here —
both routes produce the same Catalyst logical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.parquet import load_table

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def register_tables(spark: SparkSession, sf_dir: str,
                    tables: tuple[str, ...] = TABLES,
                    string_mode: bool = False) -> None:
    """Create one temp view per driver table (ns-timestamps and session
    TZ handled by load_table)."""
    import os

    for t in tables:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t, string_mode).df.createOrReplaceTempView(t)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
