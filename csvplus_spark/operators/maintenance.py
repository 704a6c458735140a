"""Table-maintenance operators.

Small files are THE quiet operational scale problem for a long-lived
parquet dataset: streaming micro-batches, per-task outputs, and
incremental upserts each leave files far below the scan-efficient
size, and at 100 TB a table of 1 MB files turns every query into
footer/open overhead and starves the scheduler with million-split
scans. Compaction rewrites the dataset into ~target-size files and
swaps it in with the crash-recoverable two-rename dance shared with
the streaming upsert sink (streaming/sinks.py::replace_dataset —
plain parquet has no atomic overwrite; a transactional table format
would replace this with OPTIMIZE).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..streaming.sinks import _Fs, heal_swap, replace_dataset


def compact_parquet(spark: SparkSession, path: str,
                    target_bytes: int = 128 << 20,
                    partition_by: list[str] | None = None,
                    allow_flatten: bool = False) -> tuple[int, int]:
    """Compact the parquet dataset at ``path`` toward ``target_bytes``
    per file. Returns ``(files_before, files_after)``; a dataset whose
    file count is already at or below the target count is left
    UNTOUCHED (no rewrite, no swap — idempotent by inspection; crash
    leftovers from an interrupted earlier swap are healed/cleaned
    first, so the early return never strands a ``__prev__`` copy).

    For a hive-partitioned table pass ``partition_by`` — the rewrite
    then shuffles on (partition columns, salt) so each hive partition
    is split across ``ceil(n_out / n_partitions)`` writer tasks: the
    layout is preserved AND big partitions still honor the target size
    (hashing on the partition columns alone would funnel each
    partition value into ONE task → one arbitrarily large file and a
    straggler). Omitting ``partition_by`` on a hive-partitioned table
    raises — the rewrite would silently flatten the ``key=value``
    layout and kill partition pruning for every downstream reader
    (ADVICE r6); pass ``allow_flatten=True`` to do it on purpose.
    """
    fs = _Fs(spark, path)
    heal_swap(fs, path)
    df = spark.read.parquet(path)
    n_before = len(df.inputFiles())
    if not partition_by and not allow_flatten:
        # detect a hive layout from the data-file paths themselves:
        # any key=value directory segment under `path` means the table
        # is partitioned, whether or not this read resolved it. The
        # compare FS-qualified URI COMPONENTS, not raw substrings
        # (review r7: a substring match scanned ancestor directories —
        # an ancestor named run=7 falsely flagged an unpartitioned
        # table; and `file:/x` vs `file:///x` normalization differences
        # would silently disable detection)
        from urllib.parse import urlparse

        def canon(u: str) -> tuple[str, str, str]:
            pr = urlparse(u)
            if not pr.scheme:
                return ("file", "", u)
            return (pr.scheme, pr.netloc, pr.path)

        q_scheme, q_auth, q_path = canon(fs.qualify(path))
        q_path = q_path.rstrip("/") + "/"
        for f in df.inputFiles():
            f_scheme, f_auth, f_path = canon(f)
            if (f_scheme, f_auth) != (q_scheme, q_auth) \
                    or not f_path.startswith(q_path):
                continue  # foreign root — never scan ancestors
            rel = f_path[len(q_path):]
            segs = [s for s in rel.split("/")[:-1] if "=" in s]
            if segs:
                keys = sorted({s.split("=", 1)[0] for s in segs})
                raise ValueError(
                    f"compact_parquet: {path} is hive-partitioned by "
                    f"{keys}; pass partition_by={keys} to preserve the "
                    "layout, or allow_flatten=True to rewrite it flat"
                )
    total = fs.length(path)
    n_out = max(1, math.ceil(total / target_bytes))
    if n_out >= n_before:
        return n_before, n_before

    if partition_by:
        n_parts = df.select(*partition_by).distinct().count()
        splits = max(1, math.ceil(n_out / max(1, n_parts)))
        # layout-only salt: spreads each partition value over `splits`
        # writer tasks; xxhash64 of the full row is deterministic but
        # carries no cross-engine contract (file layout never does)
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(splits))
        out = df.repartition(n_out, *[F.col(c) for c in partition_by], salt)

        def write_tmp(tmp: str) -> None:
            out.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    else:
        out = df.repartition(n_out)

        def write_tmp(tmp: str) -> None:
            out.write.mode("overwrite").parquet(tmp)

    replace_dataset(fs, path, write_tmp)
    return n_before, len(spark.read.parquet(path).inputFiles())


#: bits per dimension in the interleaved z-value (64 quantile buckets)
ZORDER_BITS = 6


def zorder_write(df, path: str, cols: list[str],
                 target_files: int = 64,
                 quantile_error: float = 0.01) -> None:
    """Write ``df`` as parquet clustered by the Z-order (Morton) curve
    over ``cols`` — the multi-column answer to min/max pruning. A
    plain sort only tightens file statistics for its LEADING column;
    bit-interleaving per-column quantile ranks makes every output file
    cover a small hyper-rectangle in ALL z columns, so parquet
    file/row-group min-max stats prune scans filtered on any of them
    (the same layout Delta's OPTIMIZE ZORDER produces).

    Mechanics: per column, 2**ZORDER_BITS quantile boundaries come
    from ``approxQuantile`` (a bounded driver collect, like the IVF
    seeds); each row's per-column rank is the count of boundaries ≤
    value (a 64-element array HOF — light enough per NOTES' trap
    because the per-element work is one comparison, and this is a
    one-time layout job, not a query path); ranks are bit-interleaved
    JVM-side and the write is ``repartitionByRange`` on the z-value,
    so files tile the curve. Quantile (not linear) bucketing keeps
    skewed columns balanced.

    Numeric columns only (quantile ranks need an order embedding; hash
    a string column to a number first if needed).
    """
    if len(cols) < 2:
        raise ValueError("zorder_write: need >= 2 columns (use a plain "
                         "sortWithinPartitions for one)")
    n_buckets = 1 << ZORDER_BITS
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE quantile pass for every z column (review r7: a per-column
    # loop scanned the dataset len(cols) times)
    all_bounds = df.approxQuantile(cols, probs, quantile_error)
    rank_cols = []
    for c, bounds in zip(cols, all_bounds):
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        rank = F.size(F.filter(barr, lambda b: b <= F.col(c).cast("double")))
        rank_cols.append(F.coalesce(rank, F.lit(0)))  # NULL values -> bucket 0
    z = F.lit(0).cast("long")
    for bit in range(ZORDER_BITS - 1, -1, -1):
        for rank in rank_cols:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(rank.cast("long"), bit)
                .bitwiseAND(F.lit(1).cast("long")))
    out = (df.withColumn("__z__", z)
           .repartitionByRange(target_files, "__z__")
           .sortWithinPartitions("__z__")
           .drop("__z__"))
    # crash-safe in-place re-clustering (review r7): the natural call
    # reads and rewrites the SAME path, so use the two-rename swap the
    # compactor uses — a raw overwrite would destroy the old files
    # mid-commit with nothing for heal_swap to recover
    fs = _Fs(df.sparkSession, path)
    heal_swap(fs, path)
    if fs.exists(path):
        replace_dataset(fs, path, lambda tmp:
                        out.write.mode("overwrite").parquet(tmp))
    else:
        out.write.mode("overwrite").parquet(path)


def merge_upsert(spark: SparkSession, path: str, updates,
                 key_cols: list[str],
                 delete_filter=None) -> tuple[int, int]:
    """Batch MERGE into a plain-parquet table: rows of ``updates`` win
    over current rows sharing the same key (left-anti + union —
    exactly the streaming foreachBatch upsert's shape, exposed for
    batch jobs); ``delete_filter`` (a Column over the CURRENT table)
    optionally drops matching current rows in the same swap. Returns
    (rows_before, rows_after).

    Crash safety: the same two-rename swap as the compactor
    (heal_swap + replace_dataset) — the table is never live-deleted,
    and a crash in either window heals on the next maintenance call.
    Bootstrap: a missing table is created from ``updates`` alone —
    gated on genuine non-existence via the path's own Hadoop FS,
    never on a failed read. Scale: one anti-join keyed on the merge
    key + one union write; at a 100 TB table this is the
    full-table-rewrite MERGE of plain parquet — a transactional
    format (Delta/Iceberg) replaces the rewrite with file-level
    commits, which is the right tool past ~TB churn rates.
    """
    from ..streaming.sinks import _Fs, heal_swap, replace_dataset

    updates = updates.dropDuplicates(key_cols)
    fs = _Fs(spark, path)
    heal_swap(fs, path)
    if not fs.exists(path):
        updates.write.mode("overwrite").parquet(path)
        n = updates.count()
        return 0, n
    current = spark.read.parquet(path)
    n_before = current.count()
    kept = current.join(updates.select(*key_cols), key_cols, "left_anti")
    if delete_filter is not None:
        # MERGE delete semantics KEEP rows the predicate doesn't match;
        # NULL-evaluating rows (NULL in a filtered column) must be kept
        # too — a bare ~NULL is NULL and would silently drop them
        kept = kept.filter(~F.coalesce(delete_filter, F.lit(False)))
    merged = kept.unionByName(updates)
    # ordering note: replace_dataset writes the WHOLE merge to the tmp
    # dir FIRST and only then renames `path` aside — the lazy read of
    # `path` inside `merged` always sees the original files (same
    # contract the streaming upsert relies on)
    replace_dataset(fs, path, lambda tmp:
                    merged.write.mode("overwrite").parquet(tmp))
    n_after = spark.read.parquet(path).count()
    return n_before, n_after


def scd2_apply(history, updates, key_cols: list[str],
               tracked_cols: list[str], ts_col: str = "ts_us",
               valid_from: str = "valid_from_us",
               valid_to: str = "valid_to_us"):
    """Apply one batch of updates to a TYPE-2 slowly-changing-dimension
    history table: the warehouse primitive that keeps every key's full
    value timeline instead of overwriting (MERGE ... WHEN MATCHED THEN
    close / insert in transactional formats — expressed here as a pure
    DataFrame transformation over plain parquet).

    ``history`` rows carry ``valid_from/valid_to`` (µs; NULL valid_to
    = current). ``updates`` carries the keys, the tracked columns'
    new values, and ``ts_col``. Per key and batch, the LATEST update
    wins (ties on the full key order). Semantics:

      * changed value  → current row closed at the update ts, new
        current row opened at it;
      * unchanged value → no-op (idempotent re-deliveries don't grow
        the history);
      * new key        → new current row;
      * already-closed rows pass through untouched.

    Null-safe comparison (``eqNullSafe``) so NULL→value and
    value→NULL count as changes. Shape: one key-equi join of the
    current slice against the (deduplicated) batch + three unions —
    no windows over the history, nothing driver-side.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), *[F.col(c) for c in tracked_cols])
    upd = (updates.withColumn("__rn__", F.row_number().over(w))
           .filter(F.col("__rn__") == 1)
           .select(*key_cols, *tracked_cols, ts_col))
    # both inputs may share lineage (updates derived from the same
    # table as the history) — rename EVERY column on EACH side to a
    # disjoint temp name so the joins resolve by name, never by
    # attribute id (Spark's ambiguous-self-join check)
    upd = upd.select(
        *[F.col(c).alias(f"__u_{c}__") for c in key_cols],
        *[F.col(c).alias(f"__n_{c}__") for c in tracked_cols],
        F.col(ts_col).alias("__uts__"))
    hcols = list(history.columns)
    other_cols = [c for c in hcols
                  if c not in (*key_cols, *tracked_cols,
                               valid_from, valid_to)]
    if other_cols:
        raise ValueError(
            f"scd2_apply: history columns {other_cols} are neither keys,"
            " tracked columns, nor validity bounds — list them in"
            " tracked_cols or drop them")
    closed = history.filter(F.col(valid_to).isNotNull())
    cur = (history.filter(F.col(valid_to).isNull())
           .select(*[F.col(c).alias(f"__h_{c}__") for c in hcols]))
    key_eq = [F.col(f"__h_{k}__") == F.col(f"__u_{k}__") for k in key_cols]
    same = _scd2_and([F.col(f"__h_{c}__").eqNullSafe(F.col(f"__n_{c}__"))
                      for c in tracked_cols])
    hit = F.col(f"__u_{key_cols[0]}__").isNotNull()
    j = cur.join(upd, _scd2_and(key_eq), "left")
    keep_open = j.filter(~hit | same).select(
        *[F.col(f"__h_{c}__").alias(c) for c in hcols])
    close = j.filter(hit & ~same).select(
        *[(F.col("__uts__") if c == valid_to
           else F.col(f"__h_{c}__")).alias(c) for c in hcols])
    # new versions: changed keys reopen; genuinely new keys insert
    anti = upd.join(cur, _scd2_and(key_eq), "left")
    fresh = anti.filter(
        F.col(f"__h_{key_cols[0]}__").isNull()
        | ~_scd2_and([F.col(f"__h_{c}__").eqNullSafe(F.col(f"__n_{c}__"))
                      for c in tracked_cols]))
    new_rows = fresh.select(*[
        (F.col(f"__u_{c}__") if c in key_cols
         else F.col(f"__n_{c}__") if c in tracked_cols
         else F.col("__uts__") if c == valid_from
         else F.lit(None).cast("long")).alias(c)
        for c in hcols])
    return closed.unionByName(keep_open).unionByName(close) \
        .unionByName(new_rows)


def _scd2_and(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
