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

from pyspark.sql import DataFrame, SparkSession


class _Fs:
    """Thin Hadoop FileSystem wrapper: exists/rename/delete that honor
    the path's OWN scheme (hdfs://, s3a://, file:, bare local). The
    python os/shutil calls this replaces see only the driver's local
    filesystem — on a cluster or a remote store they answer `exists` =
    False for a table that very much exists, which would turn the
    bootstrap-overwrite branch into silent truncation of the
    accumulated table (review r6)."""

    def __init__(self, spark: SparkSession, path: str):
        jvm = spark.sparkContext._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(path).getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration())

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._Path(p))

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise IOError(f"rename failed: {src} -> {dst}")

    def delete(self, p: str) -> None:
        self._fs.delete(self._Path(p), True)

    def length(self, p: str) -> int:
        """Total bytes under ``p`` (recursive)."""
        return self._fs.getContentSummary(self._Path(p)).getLength()

    def qualify(self, p: str) -> str:
        """Fully-qualified URI for ``p`` in this filesystem's canonical
        form — the same normalization ``DataFrame.inputFiles`` URIs
        carry, so string prefix comparisons against them are sound."""
        return self._fs.makeQualified(self._Path(p)).toString()

    def is_dir(self, p: str) -> bool:
        return self._fs.getFileStatus(self._Path(p)).isDirectory()

    def child_files(self, p: str) -> list[str]:
        """Names of the DIRECT (non-recursive) file children of ``p``
        — directories excluded."""
        return [st.getPath().getName()
                for st in self._fs.listStatus(self._Path(p))
                if st.isFile()]


def heal_swap(fs: _Fs, path: str) -> None:
    """Recover from a crash inside :func:`replace_dataset`: if only the
    moved-aside copy exists the swap died between its two renames —
    move it back; if BOTH exist the swap completed but its final
    delete didn't — drop the leftover copy (it would otherwise leak a
    full pre-swap dataset indefinitely)."""
    prev = path + "__prev__"
    if fs.exists(prev):
        if not fs.exists(path):
            fs.rename(prev, path)
        else:
            fs.delete(prev)


def replace_dataset(fs: _Fs, path: str, write_tmp) -> None:
    """Swap a freshly-written dataset into ``path`` via two renames:
    ``write_tmp(tmp_path)`` writes the new data, then the old table is
    moved ASIDE (not deleted) before the new one moves in, so a crash
    at any point leaves either the old or the new table recoverable —
    :func:`heal_swap` heals both crash windows on the next call. Plain
    parquet has no atomic overwrite-while-reading (and object-store
    renames are per-file copies, not atomic either); a transactional
    table format would replace this dance with MERGE/OPTIMIZE."""
    tmp = path + "__tmp__"
    prev = path + "__prev__"
    write_tmp(tmp)
    if fs.exists(prev):
        fs.delete(prev)
    fs.rename(path, prev)
    fs.rename(tmp, path)
    fs.delete(prev)


def foreach_batch_upsert(stream: DataFrame, path: str, checkpoint: str,
                         key_cols: list[str], trigger_available_now: bool = True):
    """Start a foreachBatch query upserting each micro-batch into
    ``path`` by ``key_cols`` (batch rows win). Returns StreamingQuery."""
    spark = stream.sparkSession

    def _merge(batch: DataFrame, batch_id: int) -> None:
        batch = batch.dropDuplicates(key_cols)
        # first batch only: the bootstrap overwrite must be gated on the
        # target genuinely NOT EXISTING, never on a failed read — a
        # transient read error answered with mode("overwrite") would
        # silently replace the whole accumulated table with one
        # micro-batch. Existence/renames go through the path's own
        # Hadoop FileSystem so the gate is correct for remote stores
        # and cluster drivers too; any OTHER read failure propagates
        # and fails the batch (the streaming commit log replays it).
        fs = _Fs(spark, path)
        heal_swap(fs, path)
        if not fs.exists(path):
            batch.write.mode("overwrite").parquet(path)
            return
        current = spark.read.parquet(path)
        merged = current.join(batch.select(*key_cols), key_cols, "left_anti") \
            .unionByName(batch)
        # crash-recoverable two-rename swap — see replace_dataset
        replace_dataset(
            fs, path,
            lambda tmp: merged.write.mode("overwrite").parquet(tmp))

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _require_partitioned_report_layout(spark: SparkSession,
                                       report_path: str) -> None:
    """Raise with migration guidance when ``report_path`` holds a
    pre-r8 APPEND-mode report (root-level parquet data files, batch_id
    as a data column): writing batch_id=N partition directories next
    to those files corrupts partition discovery for every future read
    ("Conflicting directory structures"). One metadata listing, run
    once per sink start."""
    fs = _Fs(spark, report_path)
    if not fs.exists(report_path):
        return
    if not fs.is_dir(report_path):
        raise ValueError(
            f"report_path {report_path!r} is a FILE — the sink writes "
            "a partitioned parquet DIRECTORY; point it at a directory "
            "path")
    for name in fs.child_files(report_path):
        if not name.startswith(("_", ".")):
            raise ValueError(
                f"report table at {report_path!r} uses the pre-r8 "
                "append layout (root-level data files); the sink now "
                "writes one batch_id=N partition per micro-batch. "
                "Migrate once with: df = spark.read.parquet(path); "
                "df.write.partitionBy('batch_id').mode('overwrite')"
                ".parquet(new_path) — or point the sink at a fresh "
                "directory")


def foreach_batch_expectations(stream: DataFrame, rules: dict,
                               report_path: str, checkpoint: str,
                               trigger_available_now: bool = True):
    """Per-micro-batch data-quality telemetry: evaluate
    ``check_expectations(batch, rules)`` on every micro-batch and
    write the violation report to its own ``batch_id=N`` partition of
    a parquet monitoring table — the streaming shape of the batch
    quality gate (operators/profile.py::check_expectations).

    Replay-idempotent: each batch DYNAMIC-overwrites only its own
    batch_id partition, so an at-least-once replay rewrites identical
    rows instead of appending duplicates (a plain append would
    double-count the replayed batch's violations — r7 advice applied
    to the report sinks too). One aggregate job per batch over that
    batch's rows only — no state, no re-reading the landing zone.

    Layout migration: a report table written by the pre-r8 APPEND code
    has root-level parquet files with batch_id as a data column; mixing
    the partitioned layout into it would corrupt partition discovery
    for every future read, so the first batch pre-flights the target
    and raises with migration guidance instead (r8 review finding).
    """
    from pyspark.sql import functions as F

    from ..operators.profile import check_expectations

    checked: list[bool] = []

    def _report(batch: DataFrame, batch_id: int) -> None:
        if not checked:
            _require_partitioned_report_layout(
                batch.sparkSession, report_path)
            checked.append(True)
        rep = check_expectations(batch, rules) \
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        # partition-per-batch + DYNAMIC overwrite: an at-least-once
        # replay rewrites only its own batch_id=N partition with
        # identical rows instead of appending duplicates — genuinely
        # idempotent, matching the docstring's restart contract
        (rep.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(report_path))

    writer = (
        stream.writeStream.foreachBatch(_report)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_drift(stream: DataFrame, reference: DataFrame,
                        report_path: str, checkpoint: str,
                        vec_col: str = "embedding",
                        trigger_available_now: bool = True):
    """Per-micro-batch EMBEDDING drift telemetry: compare every
    arriving batch of vectors against a fixed reference corpus with
    :func:`~csvplus_spark.operators.profile.embedding_drift` and
    write the per-dimension report to its own ``batch_id=N`` partition
    of a parquet monitoring table — the streaming answer to "did the
    encoder / upstream distribution move" while embeddings land.

    The reference side's moments are recomputed per batch from the
    (lazy) reference frame; pass a small aggregated reference or a
    cached frame when batches are frequent. Same idempotence contract
    as :func:`foreach_batch_expectations` (reports key on batch_id).
    """
    from pyspark.sql import functions as F

    from ..operators.profile import embedding_drift

    checked: list[bool] = []

    def _report(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return  # no vectors in this batch — nothing to report
        if not checked:
            _require_partitioned_report_layout(
                batch.sparkSession, report_path)
            checked.append(True)
        rep = embedding_drift(reference, batch, vec_col=vec_col) \
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        # dynamic per-batch partition overwrite — replay-idempotent
        # (see foreach_batch_expectations)
        (rep.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(report_path))

    writer = (
        stream.writeStream.foreachBatch(_report)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _same_checkpoint(spark, stored: str | None, raw_ck: str,
                     qualified_ck: str) -> bool:
    """Does a stored ``applied_ck`` marker denote the caller's
    checkpoint? Compares every available spelling pair — the raw
    stored string and (when loadable) its qualified form against both
    the caller's raw spelling and the pre-qualified ``qualified_ck``.

    The raw-vs-raw leg matters (r10 ADVICE): a marker written by a
    host that could qualify an ``s3a://`` checkpoint, read back on a
    host without those jars, fails qualification — comparing the raw
    stored string against only the qualified current form then
    spuriously mismatches, and a replayed batch re-merges: the exact
    double-count the marker exists to prevent."""
    if stored is None:
        return False
    try:
        stored_q = _Fs(spark, stored).qualify(stored)
    except Exception:
        stored_q = None
    return bool(({stored, stored_q} - {None}) & {raw_ck, qualified_ck})


def foreach_batch_cms(stream: DataFrame, sketch_path: str, checkpoint: str,
                      term_col: str = "term", d: int = 4, w: int = 1024,
                      trigger_available_now: bool = True):
    """Streaming count-min accumulator: per micro-batch, build the
    batch's CMS (operators/sketch.py) and fold it into the persisted
    cell table with :func:`cms_merge` — CMS is linear, so the running
    table is EXACTLY the sketch of everything that has arrived, at a
    fixed d·w footprint, with no history re-scan.

    The swap is the crash-safe two-rename used by upsert sinks
    (replace_dataset), and the fold is IDEMPOTENT under foreachBatch
    at-least-once delivery: every row of the persisted cell table
    carries ``applied_batch_id`` + ``applied_ck`` (the last batch
    folded in and the checkpoint it belongs to, swapped atomically
    with the cells), and a replayed batch whose id is ≤ the stored one
    FOR THE SAME CHECKPOINT is skipped instead of merged twice —
    without the marker, a batch replayed after a post-swap crash would
    permanently inflate every estimate it touched (r7 advice). Batch
    ids are monotonically increasing per checkpoint, so one high-water
    mark suffices; a DIFFERENT checkpoint restarts ids at 0 and is a
    deliberate re-feed, so its batches always merge.
    """
    from pyspark.sql import functions as F

    from ..operators.sketch import cms_build, cms_merge

    MARK, CK = "applied_batch_id", "applied_ck"

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        spark = batch.sparkSession
        inc = cms_build(batch, term_col, d, w)
        fs = _Fs(spark, sketch_path)
        heal_swap(fs, sketch_path)
        # qualify the checkpoint before storing/comparing (ADVICE r8):
        # restarting the same job with an equivalent-but-differently-
        # spelled checkpoint (relative vs absolute, trailing slash,
        # scheme-qualified) must still match the stored marker, or a
        # replayed batch re-merges and permanently inflates counts —
        # the exact failure the marker prevents
        ck = _Fs(spark, checkpoint).qualify(checkpoint)
        mark = lambda df: (df
                           .withColumn(MARK, F.lit(batch_id).cast("long"))
                           .withColumn(CK, F.lit(ck)))
        if not fs.exists(sketch_path):
            # bootstrap gated on genuine non-existence, never on a
            # failed read (foreach_batch_upsert's truncation guard)
            mark(inc).write.mode("overwrite").parquet(sketch_path)
            return
        cur = spark.read.parquet(sketch_path)
        if MARK in cur.columns:
            head = (cur.select(F.max(MARK).alias("b"),
                               F.max(CK).alias("c")).first()
                    if CK in cur.columns else
                    cur.select(F.max(MARK).alias("b"),
                               F.lit(None).alias("c")).first())
            # qualify the STORED spelling too: sketches written before
            # the qualification fix hold the raw caller string, and a
            # raw-vs-qualified mismatch would re-merge a replayed batch
            # across the upgrade — the exact failure being guarded.
            # Best-effort: the stored string's scheme may not be
            # loadable here (s3a marker, local restart, no aws jars) —
            # fall back to the raw string rather than crash the stream
            same_ck = _same_checkpoint(spark, head["c"], checkpoint, ck)
            if head["b"] is not None and same_ck and batch_id <= head["b"]:
                return  # replayed batch — already folded in
            cur = cur.drop(MARK, CK)
        merged = mark(cms_merge(cur, inc))
        replace_dataset(fs, sketch_path,
                        lambda tmp: merged.write.mode("overwrite").parquet(tmp))

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_uniform_sample(stream: DataFrame, sample_path: str,
                                 checkpoint: str, key_cols, k: int = 1000,
                                 salt: str = "stream_sample",
                                 trigger_available_now: bool = True):
    """Fixed-size uniform sample over an UNBOUNDED stream — the
    "held-out validation set from a firehose" primitive: keep the ``k``
    rows whose deterministic key hash (``hash60(salt|key)``, the exact
    tag :func:`~csvplus_spark.operators.sampling.hash_sample` filters
    on) is smallest across everything that has ever arrived.

    Equivalent to classic reservoir sampling but with a CONTENT-DERIVED
    tag instead of a random draw, which buys three properties at once:

    * **replay-idempotent for free** — a re-delivered batch re-offers
      the same (tag, row) pairs and the min-k merge is a set union, so
      at-least-once foreachBatch delivery cannot bias the sample (no
      batch-id bookkeeping needed, unlike the CMS accumulator);
    * **cross-engine checkable** — the end state over any finite corpus
      is exactly ``ORDER BY tag, key LIMIT k`` in any SQL engine;
    * **mergeable** — min-k of per-stream min-k states is the min-k of
      the union (same shard-merge law the sketches rely on).

    State is ONE k-row parquet table swapped with the crash-safe
    two-rename (``replace_dataset``); per batch: tag the batch, union
    with the current state, keep the k smallest — an O(k + |batch|)
    job with a k-row output, never a history re-scan. Duplicate keys
    (redelivery, genuine dup events) collapse before the cut so the
    sample holds k DISTINCT keys once the stream has offered that many.

    At 100 TB: the state table is k rows regardless of stream volume;
    the only per-batch shuffle is the global top-k (TakeOrdered-style)
    over k + |batch| rows.
    """
    from pyspark.sql import functions as F

    from ..operators.text import hash60

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def _tagged(df: DataFrame) -> DataFrame:
        key = F.concat_ws(
            "|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
        return df.withColumn("__tag__", hash60(key))

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        spark = batch.sparkSession
        inc = _tagged(batch)
        fs = _Fs(spark, sample_path)
        heal_swap(fs, sample_path)
        # dedup exact key repeats, then keep the k smallest tags; the
        # (tag, key...) ordering is total, so the cut is deterministic,
        # and orderBy+limit plans a TakeOrdered top-k, not a global sort
        cut = lambda df: (df.dropDuplicates(key_cols)
                          .orderBy("__tag__", *key_cols).limit(k))
        if not fs.exists(sample_path):
            # bootstrap gated on genuine non-existence (upsert pattern)
            cut(inc).write.mode("overwrite").parquet(sample_path)
            return
        merged = cut(spark.read.parquet(sample_path).unionByName(inc))
        replace_dataset(fs, sample_path,
                        lambda tmp: merged.write.mode("overwrite")
                        .parquet(tmp))

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
