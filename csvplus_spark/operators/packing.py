"""Context-window preparation for LLM training: fixed-size token
chunking and deterministic sequence packing (BASELINE.json north-star;
no reference counterpart — the reference is a CSV ETL library).

Both operators are pure codegen (regexp tokenize + array slice +
window arithmetic) — no Python, no driver materialization — and both
are bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def chunk_docs(df: DataFrame, size: int = 32, stride: int | None = None,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split each document's token stream into fixed-``size`` chunks
    every ``stride`` tokens (defaults to non-overlapping;
    stride < size gives sliding-window overlap for long-context
    training mixes). Returns (id, chunk_id, chunk_text, n_tokens);
    the final chunk per doc may be short — callers drop or pad it.

    Shape: one row per chunk via posexplode of the chunk-start
    sequence; the token array is computed once per doc in the child
    projection and sliced per chunk. All per-row arithmetic — no
    shuffle at all, so chunking 100 TB parallelizes with the scan.
    """
    if stride is None:
        stride = size
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got {size}/{stride}")
    t = df.select(F.col(id_col), tokens(text_col).alias("__t__")) \
        .withColumn("__n__", F.size("__t__")) \
        .filter(F.col("__n__") >= 1)
    return (
        t.select(
            F.col(id_col), "__t__", "__n__",
            F.posexplode(F.sequence(F.lit(1), F.col("__n__"), F.lit(stride)))
            .alias("chunk_id", "__start__"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("int"),
            F.array_join(F.slice("__t__", F.col("__start__"), size), " ")
            .alias("chunk_text"),
            F.least(F.lit(size), F.col("__n__") - F.col("__start__") + 1)
            .cast("int").alias("n_tokens"),
        )
    )


def pack_sequences(df: DataFrame, capacity: int = 512,
                   text_col: str = "text", id_col: str = "doc_id",
                   shard_col: str = "source") -> DataFrame:
    """Concat-and-split sequence packing: documents are laid head to
    tail per shard (ordered by id) and the stream is cut every
    ``capacity`` tokens. Each doc learns which pack it STARTS in and
    at what token offset — (id, shard, n_tokens, pack_id, pack_offset)
    — which is exactly the index a dataloader needs to materialize
    packed context windows without padding waste.

    Packing is per-``shard_col`` (real pipelines pack within shards,
    not across the global corpus): one window per shard keyed by the
    shard column, so at 100 TB the only shuffle is the shard
    partitioning and no global total order is ever required. A
    single-stream variant (shard_col=None is deliberately NOT offered)
    would serialize the whole corpus through one partition.
    """
    w = (Window.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    t = df.select(F.col(id_col), F.col(shard_col),
                  F.size(tokens(text_col)).cast("long").alias("n_tokens"))
    return (
        t.withColumn("__before__",
                     F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            F.col(id_col), F.col(shard_col), "n_tokens",
            F.expr(f"__before__ div {capacity}").alias("pack_id"),
            (F.col("__before__") % capacity).cast("long").alias("pack_offset"),
        )
    )
