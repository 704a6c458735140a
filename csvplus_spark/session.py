"""SparkSession bootstrap tuned for the engine.

Defaults are chosen for correctness-vs-DuckDB (UTC session timezone,
ANSI off so compat casts return NULL and the engine raises explicitly)
and for scale (AQE on, skew-join handling on, Arrow on for the few
pandas-UDF paths).

On a real cluster these settings hold; ``shuffle_partitions`` should be
raised to ~2-3x total cores (set via ``CSVPLUS_SHUFFLE_PARTITIONS``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # deterministic timestamp rendering vs the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: coalesce tiny partitions, split skewed ones
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dimension tables (region/nation/customer/part/supplier) broadcast
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Arrow for pandas-UDF paths (resolve_duplicates, multimodal)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # engine raises its own errors; try_cast-style NULLs in compat layer
    "spark.sql.ansi.enabled": "false",
}


def get_spark(
    app_name: str = "csvplus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster, leave it unset and let spark-submit supply it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("CSVPLUS_SHUFFLE_PARTITIONS", "32"))
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # local mode runs driver+executors in ONE JVM: the 1g driver
    # default OOMs once a long session accumulates broadcasts and
    # checkpoint blocks (bench runs 35 queries in one JVM). Only
    # effective at JVM launch — under spark-submit the submitted
    # --driver-memory wins, as it should on a cluster.
    conf.setdefault(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
