"""Streaming sinks beyond the built-ins.

``foreach_batch_upsert`` — keyed upsert (merge) into a parquet
directory via foreachBatch: each micro-batch replaces existing rows
with matching keys and appends the rest. The classic pattern for
maintaining a deduplicated "latest state" table from a stream when the
target store has no native MERGE (plain parquet).

Scale notes: the merge rewrites the whole target per batch in this
plain-parquet form — at 100 TB the same callback body would target a
format with transactional merge granularity; the foreachBatch plumbing
(exactly-once via the streaming commit log + idempotent overwrite) is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_upsert(stream: DataFrame, path: str, checkpoint: str,
                         key_cols: list[str], trigger_available_now: bool = True):
    """Start a foreachBatch query upserting each micro-batch into
    ``path`` by ``key_cols`` (batch rows win). Returns StreamingQuery."""
    spark = stream.sparkSession

    def _merge(batch: DataFrame, batch_id: int) -> None:
        batch = batch.dropDuplicates(key_cols)
        try:
            current = spark.read.parquet(path)
        except Exception:
            batch.write.mode("overwrite").parquet(path)
            return
        merged = current.join(batch.select(*key_cols), key_cols, "left_anti") \
            .unionByName(batch)
        # write to a temp dir then swap: plain parquet has no atomic
        # overwrite-while-reading; the swap keeps the window tiny
        tmp = path + "__tmp__"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(path)
        shutil.move(tmp, path)

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
