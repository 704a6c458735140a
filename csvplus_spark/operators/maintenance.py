"""Table-maintenance operators.

Small files are THE quiet operational scale problem for a long-lived
parquet dataset: streaming micro-batches, per-task outputs, and
incremental upserts each leave files far below the scan-efficient
size, and at 100 TB a table of 1 MB files turns every query into
footer/open overhead and starves the scheduler with million-split
scans. Compaction rewrites the dataset into ~target-size files and
swaps it in with the same crash-recoverable two-rename dance the
streaming upsert sink uses (streaming/sinks.py — plain parquet has no
atomic overwrite; a transactional table format would replace the
dance with OPTIMIZE).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from ..streaming.sinks import _Fs


def compact_parquet(spark: SparkSession, path: str,
                    target_bytes: int = 128 << 20,
                    partition_by: list[str] | None = None) -> tuple[int, int]:
    """Compact the parquet dataset at ``path`` toward ``target_bytes``
    per file. Returns ``(files_before, files_after)``; a dataset whose
    file count is already at or below the target count is left
    UNTOUCHED (no rewrite, no swap — idempotent by inspection).

    For a hive-partitioned table pass ``partition_by`` — the rewrite
    then repartitions by the partition columns (so each output task
    writes into one directory) and preserves the directory layout;
    omitting it on a partitioned table would flatten the layout.

    The rewrite is one repartition job (shuffle sized by the data, no
    driver materialization); the swap is rename-based and heals the
    mid-swap crash window on the next call, exactly like the upsert
    sink it is modeled on.
    """
    fs = _Fs(spark, path)
    prev = path + "__prev__"
    if fs.exists(prev) and not fs.exists(path):
        # crashed between the two renames of an earlier swap — heal
        fs.rename(prev, path)
    df = spark.read.parquet(path)
    n_before = len(df.inputFiles())
    total = fs.length(path)
    n_out = max(1, math.ceil(total / target_bytes))
    if n_out >= n_before:
        return n_before, n_before
    tmp = path + "__tmp__"
    if partition_by:
        from pyspark.sql import functions as F

        (df.repartition(n_out, *[F.col(c) for c in partition_by])
         .write.mode("overwrite").partitionBy(*partition_by).parquet(tmp))
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    if fs.exists(prev):
        fs.delete(prev)
    fs.rename(path, prev)
    fs.rename(tmp, path)
    fs.delete(prev)
    return n_before, len(spark.read.parquet(path).inputFiles())
