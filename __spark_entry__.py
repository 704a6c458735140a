"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship chain on sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2 (plus
extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL.

Column-name discipline: every computed column is aliased identically in
the Spark query and the oracle SQL (driver sorts columns by name before
value-hashing).

Compat-layer queries run in string mode (the reference's only value
type is string — /root/reference/csvplus.go:59 — and its comparisons
are lexicographic, csvplus.go:794-807), so the oracle SQL casts the
same columns to VARCHAR. Doubles that pass through untouched stay
typed; doubles used as string sort keys go through DECIMAL(18,2) to
pin a single text form in both engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from csvplus_spark import like_, load_table  # noqa: E402
from csvplus_spark.functions.predicates import any_  # noqa: E402

SF1 = "/root/testdata/sf0.001"


def _dec(col_name: str):
    """Clean 2-decimal money column as exact decimal.

    The driver tables store money as doubles that are always clean
    2-decimal values (TPC-H generator), so the double→decimal cast is
    exact and identical in Spark and DuckDB. Summing in decimal is
    exact math; casting the final sum back to double yields the same
    nearest-double in both engines — unlike ``round(sum(double), 2)``,
    whose HALF_UP-vs-binary rounding diverges at boundary values
    (round-1 `null_funcs` hash failure).
    """
    return F.col(col_name).cast("decimal(18,2)")


def _cents(col_name: str):
    """Clean 2-decimal money column as exact integer cents (long).

    ``floor(x*100 + 0.5)`` is exact on clean-2dp data: ``x*100`` lands
    within ~1e-9 of the true integer (never near .5), so half-up
    rounding in pure double math recovers it exactly — identically in
    Spark and DuckDB — with no per-row BigDecimal work. Spark's
    ``floor()`` returns LongType directly, so the aggregate downstream
    is a codegen'd long sum instead of BigDecimal accumulation (the
    round-2 ``agg_pricing_summary`` 2.17× regression). NOTE a plain
    ``(x*100).cast("long")`` would be WRONG: Spark truncates while
    DuckDB rounds, and 0.29*100 = 28.999999999999996 diverges.
    """
    return F.floor(F.col(col_name) * 100 + F.lit(0.5))


def _dsum(col_name: str):
    """Exact money sum via integer cents, surfaced as double.

    ``double(N)/100.0`` and ``decimal_sum→double`` both produce the
    nearest double of the exact sum, so hashes match the previous
    decimal formulation. Long sums hold to ~9e16 cents per group
    (~2^53 for exact double conversion); beyond that (extreme 100 TB
    groups) switch the accumulator to ``sum(cast(cents as decimal(38,0)))``.
    """
    return F.sum(_cents(col_name)) / F.lit(100.0)


def _drevenue():
    """Exact ``sum(extendedprice * (1 - discount))`` as double.

    Both factors are clean 2-decimal doubles → integer units of 1e-4:
    ``cents(price) * (100 - cents(discount))`` is exact long math and
    sums at long-add speed in both engines. Per-row magnitude ≤ 1e9,
    so the long sum is exact to ~9e9 rows per group; the decimal(38,0)
    accumulator note in `_dsum` applies beyond that.
    """
    return F.sum(
        _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    ) / F.lit(10000.0)


# ----------------------------------------------------------------------
# flagship — the TestLongChain shape (SURVEY.md §3.1/§7.4):
# scan → filter → project → unique index → renamed-key join → prefix
# join → derive → anti-join → order → limit


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", string_mode=True)
    # lazy uniqueness: assertion fused into the join plan, no probe job
    idx = (
        cust.filter(any_(like_({"c_mktsegment": "BUILDING"}),
                         like_({"c_mktsegment": "AUTOMOBILE"})))
        .select_columns("c_custkey", "c_name", "c_mktsegment")
        .unique_index_on("c_custkey", lazy_check=True)
        .hint_broadcast()
    )
    orders = load_table(spark, sf_dir, "orders", string_mode=True)
    li_idx = load_table(spark, sf_dir, "lineitem", string_mode=True) \
        .select_columns("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice") \
        .index_on("l_orderkey", "l_linenumber")
    bad = cust.filter(F.col("c_acctbal").cast("double") < 0) \
        .unique_index_on("c_custkey", lazy_check=True).hint_broadcast()

    out = (
        orders.join(idx, "o_custkey")              # renamed key: both columns kept
        .except_(bad, "o_custkey")                 # anti-join
        .join(li_idx, "o_orderkey")                # prefix probe (1 of 2 index cols)
        .with_columns(
            amount=F.col("l_quantity").cast("double")
            * F.col("l_extendedprice").cast("double")
        )
        .select_columns("o_orderkey", "o_custkey", "c_name", "c_mktsegment",
                        "l_linenumber", "amount")
        .ordered_by("o_orderkey", "l_linenumber", "amount")  # amount breaks dup-line ties
        .top(100)
    )
    return out.ordered_df()


_FLAGSHIP_SQL = """
WITH idx AS (
  SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name, c_mktsegment
  FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
),
good AS (
  SELECT CAST(o.o_orderkey AS VARCHAR) AS o_orderkey,
         CAST(o.o_custkey AS VARCHAR) AS o_custkey,
         i.c_name, i.c_mktsegment
  FROM orders o JOIN idx i ON CAST(o.o_custkey AS VARCHAR) = i.c_custkey
  WHERE NOT EXISTS (SELECT 1 FROM customer b
                    WHERE b.c_acctbal < 0
                      AND CAST(b.c_custkey AS VARCHAR) = CAST(o.o_custkey AS VARCHAR))
)
SELECT g.o_orderkey, g.o_custkey, g.c_name, g.c_mktsegment,
       CAST(l.l_linenumber AS VARCHAR) AS l_linenumber,
       l.l_quantity * l.l_extendedprice AS amount
FROM good g JOIN lineitem l ON g.o_orderkey = CAST(l.l_orderkey AS VARCHAR)
ORDER BY g.o_orderkey, CAST(l.l_linenumber AS VARCHAR),
         CAST(l.l_quantity * l.l_extendedprice AS VARCHAR)
LIMIT 100
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, SF1)


# ----------------------------------------------------------------------
# compat-layer queries (reference operators, SURVEY.md §2)


def q_select_project(spark, sf_dir):
    """SelectColumns + Filter/Like (csvplus.go:511-525, 276-286, 1279-1293)."""
    return (
        load_table(spark, sf_dir, "customer", string_mode=True)
        .filter(like_({"c_mktsegment": "BUILDING"}))
        .select_columns("c_custkey", "c_name", "c_mktsegment")
        .df
    )


def q_drop_columns(spark, sf_dir):
    """DropColumns (csvplus.go:493-507) — tolerant of absent names."""
    return (
        load_table(spark, sf_dir, "nation", string_mode=True)
        .drop_columns("n_comment", "n_regionkey")
        .df
    )


def q_filter_any(spark, sf_dir):
    """Any/Like predicate combinators (csvplus.go:1243-1293)."""
    return (
        load_table(spark, sf_dir, "orders", string_mode=True)
        .filter(any_(like_({"o_orderstatus": "F"}), like_({"o_orderpriority": "1-URGENT"})))
        .select_columns("o_orderkey", "o_orderstatus", "o_orderpriority")
        .df
    )


def q_map_derive(spark, sf_dir):
    """Map: derived column (csvplus.go:290-296); revenue per lineitem."""
    return (
        load_table(spark, sf_dir, "lineitem", string_mode=True)
        .with_columns(
            # raw double product: both engines do the same IEEE ops on the
            # same operands → bit-identical results, no rounding needed
            revenue=F.col("l_extendedprice").cast("double")
            * (1 - F.col("l_discount").cast("double"))
        )
        .select_columns("l_orderkey", "l_linenumber", "revenue")
        .df
    )


def q_join_unique(spark, sf_dir):
    """Renamed-key join vs unique index: BOTH key columns in output
    (mergeRows, csvplus.go:571-583; pinned csvplus_test.go:381-432)."""
    cust = load_table(spark, sf_dir, "customer", string_mode=True) \
        .select_columns("c_custkey", "c_name", "c_mktsegment") \
        .unique_index_on("c_custkey").hint_broadcast()
    return (
        load_table(spark, sf_dir, "orders", string_mode=True)
        .join(cust, "o_custkey")
        .select_columns("o_orderkey", "o_custkey", "c_custkey", "c_name", "c_mktsegment")
        .df
    )


def q_join_prefix(spark, sf_dir):
    """Prefix join: probe with fewer columns than the index matches the
    whole equal-prefix range (csvplus.go:545-560)."""
    li = load_table(spark, sf_dir, "lineitem", string_mode=True) \
        .select_columns("l_orderkey", "l_linenumber", "l_returnflag") \
        .index_on("l_orderkey", "l_linenumber")
    return (
        load_table(spark, sf_dir, "orders", string_mode=True)
        .select_columns("o_orderkey", "o_orderstatus")
        .join(li, "o_orderkey")
        .select_columns("o_orderkey", "o_orderstatus", "l_linenumber", "l_returnflag")
        .df
    )


def q_except_anti(spark, sf_dir):
    """Except = left anti semi-join, rows unchanged (csvplus.go:588-608)."""
    neg = load_table(spark, sf_dir, "customer", string_mode=True) \
        .filter(F.col("c_acctbal").cast("double") < 0) \
        .unique_index_on("c_custkey").hint_broadcast()
    return (
        load_table(spark, sf_dir, "orders", string_mode=True)
        .except_(neg, "o_custkey")
        .select_columns("o_orderkey", "o_custkey", "o_orderstatus")
        .df
    )


def q_index_find(spark, sf_dir):
    """Index.Find point/prefix lookup (csvplus.go:625-627, 870-891)."""
    idx = load_table(spark, sf_dir, "lineitem", string_mode=True) \
        .select_columns("l_orderkey", "l_linenumber", "l_quantity") \
        .index_on("l_orderkey", "l_linenumber")
    return idx.find("7").df


def q_sub_index(spark, sf_dir):
    """SubIndex: fix a key prefix, re-key on the rest (csvplus.go:632-641)."""
    idx = load_table(spark, sf_dir, "lineitem", string_mode=True) \
        .select_columns("l_orderkey", "l_linenumber", "l_quantity") \
        .index_on("l_orderkey", "l_linenumber")
    return idx.sub_index("7").find("1").df


def q_top_k(spark, sf_dir):
    """IndexOn + Top ≡ orderBy + limit, lexicographic string order
    (csvplus.go:313-326; pattern csvplus_test.go:468, 502-504)."""
    f = (
        load_table(spark, sf_dir, "customer", string_mode=True)
        .with_columns(bal=F.col("c_acctbal").cast("decimal(18,2)").cast("string"))
        .select_columns("c_custkey", "c_name", "bal")
        .ordered_by("bal", "c_custkey", ascending=[False, True])
        .top(10)
    )
    return f.ordered_df()


def q_drop_offset(spark, sf_dir):
    """Drop: skip first n rows of the sorted stream (csvplus.go:329-342)."""
    f = (
        load_table(spark, sf_dir, "customer", string_mode=True)
        .select_columns("c_custkey", "c_name")
        .ordered_by("c_custkey")
        .drop(20)
    )
    return f.ordered_df()


def q_take_while(spark, sf_dir):
    """TakeWhile: prefix until first violation, latched (csvplus.go:346-358)."""
    return (
        load_table(spark, sf_dir, "customer", string_mode=True)
        .select_columns("c_custkey", "c_name", "c_mktsegment")
        .ordered_by("c_custkey")
        .take_while(F.col("c_mktsegment") != "BUILDING")
        .df
    )


def q_drop_while(spark, sf_dir):
    """DropWhile: suffix from first violation on (csvplus.go:362-374)."""
    return (
        load_table(spark, sf_dir, "customer", string_mode=True)
        .select_columns("c_custkey", "c_name", "c_mktsegment")
        .ordered_by("c_custkey")
        .drop_while(F.col("c_mktsegment") != "BUILDING")
        .df
    )


def q_resolve_dups_first(spark, sf_dir):
    """ResolveDuplicates declarative fast path: keep-first within key
    (dedup, csvplus.go:810-867 → window row_number()==1)."""
    idx = load_table(spark, sf_dir, "lineitem", string_mode=True) \
        .select_columns("l_orderkey", "l_linenumber", "l_quantity") \
        .index_on("l_orderkey")
    # order_by covers all non-key columns → ties are identical rows,
    # so the surviving row is deterministic
    return idx.resolve_duplicates(keep="first", order_by=["l_linenumber", "l_quantity"]).df


def q_flagship(spark, sf_dir):
    return _flagship(spark, sf_dir)


# ----------------------------------------------------------------------
# native-layer extensions (SURVEY.md §2.4/2.5/2.7/2.8 — no reference
# counterpart; typed columns, Spark built-ins)


def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped grouped aggregation (extension, SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem").df
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _drevenue().alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_window_rank(spark, sf_dir):
    """Window row_number: top order per customer (extension, SURVEY §2.5)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders").df
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q_scalar_date(spark, sf_dir):
    """Date scalar functions over o_orderdate (extension, SURVEY §2.8)."""
    return (
        load_table(spark, sf_dir, "orders").df
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             _dsum("o_totalprice").alias("total_price"))
    )


def q_json_props(spark, sf_dir):
    """JSON extraction from events.props (extension, SURVEY §2.8)."""
    ev = load_table(spark, sf_dir, "events").df
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .filter(F.col("k") > 50)
        .select("event_id", "event_type", "k")
    )


def q_union_distinct(spark, sf_dir):
    """Set ops: unionByName + distinct (extension, SURVEY §2.7)."""
    c = load_table(spark, sf_dir, "customer").df \
        .select(F.col("c_nationkey").cast("int").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").df \
        .select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return c.unionByName(s).distinct()


# ----------------------------------------------------------------------
# LLM-pipeline extensions (BASELINE.json north-star): text analysis,
# dedup family, similarity search. All md5-based hashing → the DuckDB
# oracle reproduces every value bit-for-bit.


def q_text_stats(spark, sf_dir):
    """Token counting, quality scoring, language-ID, fingerprinting
    over documents (extension; operators/text.py)."""
    from csvplus_spark.operators.text import text_stats

    return text_stats(load_table(spark, sf_dir, "documents").df)


def q_dedup_exact(spark, sf_dir):
    """Exact dedup via normalized-text md5 fingerprint (operators/dedup.py)."""
    from csvplus_spark.operators.dedup import exact_dedup

    return exact_dedup(load_table(spark, sf_dir, "documents").df)


def q_dedup_ngram(spark, sf_dir):
    """Exact near-dup pairs: word-trigram Jaccard >= 0.6 with
    shared-shingle blocking (operators/dedup.py)."""
    from csvplus_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents").df, 0.6)


def q_dedup_ngram_fast(spark, sf_dir):
    """ngram_jaccard_pairs with exact-duplicate collapse — output
    byte-identical to `dedup_ngram` (same oracle), Σdf² blocking cost
    measured over the deduplicated corpus (operators/dedup.py)."""
    from csvplus_spark.operators.dedup import ngram_jaccard_pairs_collapsed

    return ngram_jaccard_pairs_collapsed(
        load_table(spark, sf_dir, "documents").df, 0.6)


def q_ann_recall(spark, sf_dir):
    """Recall@5 of the seeded-IVF search against exact brute force
    (operators/similarity.py::ann_recall) — both sides deterministic,
    so the oracle replays the full evaluation."""
    from csvplus_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_seeded_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").df
    exact = brute_force_topk(emb.filter(F.col("vec_id") < 50), emb, 5)
    approx = ivf_seeded_topk(emb, 5, n_cells=16)
    return ann_recall(exact, approx)


def q_skew_report(spark, sf_dir):
    """Key-skew diagnostics over lineitem's suppkey (operators/
    profile.py::key_skew_report): top-20 heaviest keys with share and
    skew factor — the measurement step before salted_join."""
    from csvplus_spark.operators.profile import key_skew_report

    li = load_table(spark, sf_dir, "lineitem").df
    return key_skew_report(li, "l_suppkey", 20)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (operators/dedup.py::semantic_dedup): seed-Voronoi
    cells as blocking, within-cell cosine >= 0.4 pairs, connected
    components, min-id canonical per component — keep/drop decision
    for every vector."""
    from csvplus_spark.operators.dedup import semantic_dedup

    return semantic_dedup(load_table(spark, sf_dir, "embeddings").df, 0.4,
                          n_cells=16)


def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup pairs (32 single-hash bands), exact-verified
    at Jaccard >= 0.6 (operators/dedup.py)."""
    from csvplus_spark.operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(load_table(spark, sf_dir, "documents").df, 0.6)


def q_dedup_minhash_fast(spark, sf_dir):
    """minhash_dedup_pairs with exact-duplicate collapse — output
    byte-identical to `dedup_minhash` (same oracle), candidate volume
    duplication-immune (operators/dedup.py)."""
    from csvplus_spark.operators.dedup import minhash_dedup_pairs_collapsed

    return minhash_dedup_pairs_collapsed(
        load_table(spark, sf_dir, "documents").df, 0.6)


def q_simhash(spark, sf_dir):
    """32-bit SimHash per document (operators/text.py)."""
    from csvplus_spark.operators.text import simhash_table

    return simhash_table(load_table(spark, sf_dir, "documents").df)


def q_sim_topk(spark, sf_dir):
    """Brute-force cosine top-5 for query vectors vec_id<10 against the
    whole corpus (operators/similarity.py)."""
    from csvplus_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings").df
    out = brute_force_topk(emb.filter(F.col("vec_id") < 10), emb, 5)
    return out.withColumn("sim", F.round("sim", 6))


def q_events_tumbling(spark, sf_dir):
    """Tumbling 1h event-time windows (streaming/events.py batch form;
    same semantics as the Structured Streaming path)."""
    from csvplus_spark.streaming.events import tumbling_agg

    out = tumbling_agg(load_table(spark, sf_dir, "events").df, "1 hour")
    return out.withColumn("window_start", F.unix_micros("window_start"))


def _stream_scratch_events(sf_dir, prefix):
    """Scratch dir exposing events.parquet to a file-stream source
    (the source wants a DIRECTORY; symlink, no copy). Callers remove
    it after the stream terminates — repeated gate runs must not
    accumulate cp_stream_* dirs (r11 ADVICE)."""
    import os
    import tempfile

    src = tempfile.mkdtemp(prefix=prefix)
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(src, "events.parquet"))
    return src


def _await_stream(q, name, timeout=180):
    """awaitTermination with the boolean return CHECKED (r11 ADVICE):
    on a slow box a timeout must raise a clear error, not silently
    hand a partial memory-sink table to the hash gate."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"{name}: stream did not terminate within {timeout}s — "
            f"refusing to read a partial memory sink")


class _stream_state_partitions:
    """Temporarily drop spark.sql.shuffle.partitions for a GATE
    stream's state store (r11 verdict item 6): a bounded availableNow
    one-micro-batch stream at sf0.1 pays per-state-partition setup
    cost (32 partitions x 2 sides ~= 4s of pure store overhead,
    measured 6.0s -> 2.5s for stream_interval at 8). The partition
    count is fixed at stream START per checkpoint, so this scopes the
    setting to the start() call; production streams size it by
    throughput, not this gate constant."""

    def __init__(self, spark, n=8):
        self.spark, self.n = spark, str(n)

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def q_stream_tumbling(spark, sf_dir):
    """GENUINE Structured Streaming behind the oracle gate: run the
    readStream tumbling-count path (streaming/events.py
    ::stream_tumbling_counts, availableNow over the events parquet)
    to a memory sink and hash-match the materialized result against
    the same DuckDB SQL the batch form matches. Counts only — no
    float aggregation — so micro-batch execution order cannot affect
    the hash."""
    import shutil

    from csvplus_spark.streaming.events import stream_tumbling_counts

    src = _stream_scratch_events(sf_dir, "cp_stream_gate_")
    name = "cp_stream_tumbling_gate"
    try:
        stream = stream_tumbling_counts(spark, src, "1 hour", "1 hour")
        with _stream_state_partitions(spark):
            q = (stream.writeStream.format("memory").queryName(name)
                 .outputMode("complete").trigger(availableNow=True).start())
        _await_stream(q, name)
    finally:
        # the memory sink holds the full result driver-side once the
        # stream terminates; the source scratch dir is no longer needed
        shutil.rmtree(src, ignore_errors=True)
    return spark.table(name).select(
        F.unix_micros("window_start").alias("window_start"),
        "event_type", "n_events")


_STREAM_TUMBLING_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start, event_type,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def q_stream_interval(spark, sf_dir):
    """GENUINE stream-stream interval join behind the oracle gate
    (r11; streaming/joins.py::stream_interval_join): purchases and
    views by the same user within ±30 minutes, BOTH sides real
    readStream over the events parquet (availableNow → memory sink).
    Inner interval-join output is a SET of matched pairs — arrival-
    order-independent — so the order-insensitive hash gate applies
    directly; the single source file yields one micro-batch, so no
    cross-batch watermark eviction can drop a legal pair. Exact
    integer µs timestamps end-to-end."""
    import shutil

    from csvplus_spark.streaming.events import stream_events
    from csvplus_spark.streaming.joins import stream_interval_join

    src = _stream_scratch_events(sf_dir, "cp_stream_ij_gate_")
    name = "cp_stream_interval_gate"
    try:
        left = stream_events(spark, src) \
            .filter(F.col("event_type") == "purchase")
        right = stream_events(spark, src) \
            .filter(F.col("event_type") == "view")
        j = stream_interval_join(left, right, "user_id",
                                 within="30 minutes", watermark="2 hours")
        with _stream_state_partitions(spark):
            q = (j.writeStream.format("memory").queryName(name)
                 .outputMode("append").trigger(availableNow=True).start())
        _await_stream(q, name)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table(name).select(
        F.col("event_id").alias("l_event_id"),
        F.col("r_event_id").alias("r_event_id"),
        "user_id",
        F.unix_micros("ts").alias("l_us"),
        F.unix_micros("r_ts").alias("r_us"))


_STREAM_INTERVAL_SQL = """
SELECT l.event_id AS l_event_id, r.event_id AS r_event_id,
       l.user_id AS user_id,
       epoch_us(l.ts) AS l_us, epoch_us(r.ts) AS r_us
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 30 MINUTE
 AND r.ts <= l.ts + INTERVAL 30 MINUTE
WHERE l.event_type = 'purchase' AND r.event_type = 'view'
"""


def q_events_sliding(spark, sf_dir):
    """Sliding 1h/30min event-time windows."""
    from csvplus_spark.streaming.events import sliding_agg

    out = sliding_agg(load_table(spark, sf_dir, "events").df, 3600, 1800)
    return out.withColumn("window_start", F.unix_micros("window_start"))


def q_events_session(spark, sf_dir):
    """Session windows per user, 10-minute inactivity gap."""
    from csvplus_spark.streaming.events import session_agg

    out = session_agg(load_table(spark, sf_dir, "events").df, "10 minutes")
    return out.withColumn("session_start", F.unix_micros("session_start"))


def q_asof_join(spark, sf_dir):
    """As-of join (operators/asof.py): each event gets its user's most
    recent STRICTLY-prior 'purchase' event value. Union+window shape —
    one shuffle, no range-join explosion."""
    from csvplus_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").df
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", F.col("value").alias("last_purchase_value"))
    out = asof_join(ev, purchases, on="ts", by="user_id",
                    right_cols=["last_purchase_value"], direction="backward",
                    strict=True)
    return out.select("event_id", "user_id", "event_type", "last_purchase_value")


def q_join_outer(spark, sf_dir):
    """Left outer join (extension, SURVEY §2.3: reference has inner/anti
    only): every nation with its (possibly absent) supplier count."""
    n = load_table(spark, sf_dir, "nation").df
    s = load_table(spark, sf_dir, "supplier").df
    agg = s.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    return (
        n.join(agg, n["n_nationkey"] == agg["s_nationkey"], "left")
        .select("n_nationkey", "n_name",
                F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"))
    )


def q_rollup_agg(spark, sf_dir):
    """ROLLUP grouping sets (extension, SURVEY §2.4)."""
    o = load_table(spark, sf_dir, "orders").df
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             _dsum("o_totalprice").alias("total"))
    )


def q_window_running(spark, sf_dir):
    """Window catalog: lag + running sum per customer over order dates
    (extension, SURVEY §2.5)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").df
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        (F.sum(_cents("o_totalprice")).over(run) / F.lit(100.0)).alias("running_total"),
    )


def q_intersect(spark, sf_dir):
    """INTERSECT set op (extension, SURVEY §2.7): nations having both
    customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").df \
        .select(F.col("c_nationkey").cast("int").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").df \
        .select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return c.intersect(s)


def q_except_all(spark, sf_dir):
    """EXCEPT ALL multiset difference (extension, SURVEY §2.7): each
    supplier key cancels ONE occurrence among lineitem supplier keys —
    multiplicities survive. Aggregated to stay output-stable."""
    li = load_table(spark, sf_dir, "lineitem").df \
        .select(F.col("l_suppkey").cast("int").alias("suppkey"))
    s = load_table(spark, sf_dir, "supplier").df \
        .select(F.col("s_suppkey").cast("int").alias("suppkey"))
    return (li.exceptAll(s)
            .groupBy("suppkey").agg(F.count(F.lit(1)).alias("n")))


def q_intersect_all(spark, sf_dir):
    """INTERSECT ALL multiset intersection (extension, SURVEY §2.7):
    min(multiplicity) copies per duplicated orders key pair."""
    a = load_table(spark, sf_dir, "orders").df \
        .select(F.col("o_custkey").cast("int").alias("custkey"))
    b = load_table(spark, sf_dir, "lineitem").df \
        .select(F.col("l_orderkey").cast("int").alias("custkey"))
    return (a.intersectAll(b)
            .groupBy("custkey").agg(F.count(F.lit(1)).alias("n")))


_EXCEPT_ALL_SQL = """
SELECT suppkey, COUNT(*) AS n FROM (
  SELECT CAST(l_suppkey AS INTEGER) AS suppkey FROM lineitem
  EXCEPT ALL
  SELECT CAST(s_suppkey AS INTEGER) FROM supplier
) GROUP BY 1
"""

_INTERSECT_ALL_SQL = """
SELECT custkey, COUNT(*) AS n FROM (
  SELECT CAST(o_custkey AS INTEGER) AS custkey FROM orders
  INTERSECT ALL
  SELECT CAST(l_orderkey AS INTEGER) FROM lineitem
) GROUP BY 1
"""


def q_top_ties(spark, sf_dir):
    """FETCH FIRST n ROWS WITH TIES over orders by day: the first
    n rows PLUS every row tying the n-th day — a deterministic set
    where plain LIMIT is tie-arbitrary (frame.py::top_with_ties,
    scalar-cutoff plan)."""
    f = (
        load_table(spark, sf_dir, "orders")
        .with_columns(day=F.date_trunc("day", F.col("o_orderdate")))
        .select_columns("o_orderkey", "day")
        .ordered_by("day")
        .top_with_ties(99)
    )
    # timestamps compare as integers cross-engine (NOTES invariant);
    # n=99 lands mid-day at sf0.01 (cumulative day counts ... 95, 100),
    # so the tie surplus is real: 100 rows come back for n=99
    return f.df.select(
        "o_orderkey", F.unix_micros(F.col("day")).alias("day_us"))


_TOP_TIES_SQL = """
WITH t AS (SELECT o_orderkey, date_trunc('day', o_orderdate) AS day
           FROM orders)
SELECT o_orderkey, epoch_us(day) AS day_us
FROM t
WHERE day <= (SELECT day FROM t ORDER BY day LIMIT 1 OFFSET 98)
"""


def q_incremental_dedup(spark, sf_dir):
    """Cross-snapshot ingest dedup (operators/dedup.py::
    incremental_dedup): docs with doc_id < 250 are "yesterday's
    corpus"; the rest are the new batch — re-crawled texts are
    dropped, and the survivors dedup among themselves."""
    from csvplus_spark.operators.dedup import incremental_dedup
    from csvplus_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents").df
    seen = docs.filter(F.col("doc_id") < 250) \
        .select(fingerprint("text").alias("fingerprint"))
    new = docs.filter(F.col("doc_id") >= 250)
    return incremental_dedup(new, seen)


_INCREMENTAL_DEDUP_SQL = """
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
seen AS (SELECT fp FROM fp WHERE doc_id < 250),
fresh AS (
  SELECT doc_id, fp FROM fp
  WHERE doc_id >= 250 AND fp NOT IN (SELECT fp FROM seen)
),
canon AS (SELECT fp, MIN(doc_id) AS canonical_id FROM fresh GROUP BY 1)
SELECT f.doc_id, c.canonical_id, f.doc_id = c.canonical_id AS is_canonical
FROM fresh f JOIN canon c ON f.fp = c.fp
"""


def q_skew_salted_join(spark, sf_dir):
    """Explicit skew salting (operators/skew.py::salted_join): lineitem
    probe salted over 8 buckets, supplier build replicated 8× — must
    be result-identical to the plain join the oracle runs."""
    from csvplus_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").df \
        .select("l_suppkey", "l_extendedprice")
    s = load_table(spark, sf_dir, "supplier").df \
        .select("s_suppkey", "s_nationkey")
    j = salted_join(li, s.withColumnRenamed("s_suppkey", "l_suppkey"),
                    on="l_suppkey", n_salts=8)
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum("l_extendedprice").alias("total_price"),
    )


_SKEW_SALTED_JOIN_SQL = """
SELECT s_nationkey, COUNT(*) AS n_items,
       SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) / 100.0
         AS total_price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1
"""


def q_agg_distinct(spark, sf_dir):
    """Exact distinct-count aggregates (extension, SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem").df
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs at sim >= 0.4 (operators/dedup.py;
    cosine arithmetic is bit-identical across engines)."""
    from csvplus_spark.operators.dedup import embedding_near_pairs

    return embedding_near_pairs(load_table(spark, sf_dir, "embeddings").df, 0.4)


def q_multimodal_meta(spark, sf_dir):
    """Multimodal metadata path over binary blobs (documents.text cast
    to binary stands in for real media; operators/multimodal.py)."""
    from csvplus_spark.operators.multimodal import attach_media_meta

    docs = load_table(spark, sf_dir, "documents").df
    blobs = docs.select(F.col("doc_id").alias("media_id"),
                        F.encode("text", "UTF-8").alias("data"))
    out = attach_media_meta(blobs)
    return out.select("media_id",
                      F.col("media_meta.byte_len").alias("byte_len"),
                      F.col("media_meta.content_md5").alias("content_md5"),
                      F.col("media_meta.kind").alias("kind"))


def q_explode_tokens(spark, sf_dir):
    """UDTF-shaped one-to-many expansion (extension, SURVEY §2.10):
    explode document tokens, count occurrences of long tokens."""
    from csvplus_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").df
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .filter(F.length("token") >= 6)
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    )


def q_cube_agg(spark, sf_dir):
    """CUBE grouping sets (extension, SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem").df
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"),
             _dsum("l_quantity").alias("qty"))
    )


def q_scalar_string_math(spark, sf_dir):
    """String + math scalar catalog (extension, SURVEY §2.8)."""
    p = load_table(spark, sf_dir, "part").df
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.sqrt(F.abs(F.col("p_retailprice"))), 6).alias("sqrt_price"),
        F.pmod(F.col("p_size"), F.lit(7)).alias("size_mod"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).alias("consonants"),
    )


def q_tpch_q3_shipping(spark, sf_dir):
    """TPC-H Q3 shape: revenue of undelivered orders for one segment —
    3-way join (broadcast dim → fact ⋈ fact) + agg + top-N."""
    c = load_table(spark, sf_dir, "customer").df \
        .filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").df
    li = load_table(spark, sf_dir, "lineitem").df
    cutoff = "1998-06-15"
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(li.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_drevenue().alias("revenue"))
        .withColumn("o_orderdate", F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


def q_tpch_q5_volume(spark, sf_dir):
    """TPC-H Q5 shape: revenue by nation — 5-way star join with
    broadcast dimensions, one fact shuffle."""
    r = load_table(spark, sf_dir, "region").df
    n = load_table(spark, sf_dir, "nation").df
    c = load_table(spark, sf_dir, "customer").df
    s = load_table(spark, sf_dir, "supplier").df
    o = load_table(spark, sf_dir, "orders").df
    li = load_table(spark, sf_dir, "lineitem").df
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        o.join(F.broadcast(dims), o["o_custkey"] == dims["c_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .join(F.broadcast(s), (li["l_suppkey"] == s["s_suppkey"])
              & (F.col("c_nationkey") == s["s_nationkey"]))
        .groupBy("n_name")
        .agg(_drevenue().alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def q_quantiles(spark, sf_dir):
    """Exact percentiles (extension, SURVEY §2.4): same linear
    interpolation as DuckDB quantile_cont — exact match."""
    o = load_table(spark, sf_dir, "orders").df
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.5)").alias("median"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )


def q_approx_quantiles(spark, sf_dir):
    """Sketch-based approximate median with the rank-error bound
    ENFORCED in-plan (the percentile twin of approx_distinct, r7):
    percentile_approx at accuracy 1000 guarantees rank error
    <= 1/1000; the query raise_errors unless the sketch value lies
    between the exact 0.45 and 0.55 quantiles (50x the bound — engine
    differences cannot mask a broken sketch). Emitted columns (exact
    median + enforced flag) are deterministic for the oracle."""
    o = load_table(spark, sf_dir, "orders").df
    agg = o.groupBy("o_orderstatus").agg(
        F.expr("percentile_approx(o_totalprice, 0.5, 1000)").alias("__ap__"),
        F.expr("percentile(o_totalprice, array(0.45, 0.5, 0.55))")
        .alias("__ex__"))
    ok = ((F.col("__ap__") >= F.col("__ex__")[0])
          & (F.col("__ap__") <= F.col("__ex__")[2]))
    return agg.select(
        "o_orderstatus",
        F.col("__ex__")[1].alias("median_exact"),
        F.when(ok, F.lit(True)).otherwise(
            F.raise_error(F.concat(
                F.lit("percentile_approx outside rank bound: "),
                F.col("__ap__").cast("string")))
            .cast("boolean")).alias("within_bound"))


_APPROX_QUANTILES_SQL = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS median_exact,
       TRUE AS within_bound
FROM orders GROUP BY 1
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters: connected components over the exact n-gram
    Jaccard pair graph (operators/dedup.py::dup_clusters)."""
    from csvplus_spark.operators.dedup import dup_clusters, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").df
    return dup_clusters(ngram_jaccard_pairs(docs, 0.6))


def q_dedup_clusters_fast(spark, sf_dir):
    """Duplication-immune near-dup clusters: exact-duplicate collapse →
    rep-space ngram pair graph → CC → member expansion
    (operators/dedup.py::dup_clusters_collapsed). Byte-identical output
    to q_dedup_clusters (shares its oracle); pair-graph and CC cost
    shrink by the corpus duplication factor (squared for pairs)."""
    from csvplus_spark.operators.dedup import dup_clusters_collapsed

    return dup_clusters_collapsed(load_table(spark, sf_dir, "documents").df, 0.6)


def q_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document (operators/text.py)."""
    from csvplus_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents").df, 3)


def q_pivot(spark, sf_dir):
    """PIVOT (extension, SURVEY §2.4): order counts by status × priority."""
    o = load_table(spark, sf_dir, "orders").df
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = o.groupBy("o_orderstatus").pivot("o_orderpriority", prios).count()
    # pivot leaves NULL for empty cells; normalize to 0 like the oracle
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{i + 1}")
          for i, p in enumerate(prios)],
    )


def q_approx_distinct(spark, sf_dir):
    """HyperLogLog approximate distinct (extension). Sketch estimates
    are engine-specific, so the RAW estimate can't be oracle-matched —
    instead the query ENFORCES the sketch's documented error bound
    in-plan (VERDICT r6 item 6): rsd=0.01 → |approx−exact|/exact must
    stay within 5% (5σ); any violation raise_errors the whole query.
    The emitted columns (exact count + the enforced flag) are then
    deterministic and hash-matchable by the DuckDB oracle, making the
    driver row-match meaningful rather than rows-only."""
    li = load_table(spark, sf_dir, "lineitem").df
    # distinct FIRST, then plain aggregates: mixing count_distinct with
    # the rsd=0.01 HLL in one agg plans a distinct-expand that updates
    # the ~100 KB HLL buffer once per EXPANDED row (6.3s at sf0.1);
    # HLL registers are duplicate-insensitive, so aggregating over the
    # pre-distinct (flag, key) projection yields the IDENTICAL estimate
    # and exact count in one scan + two keyed shuffles (1.4s — 4.5x)
    d = li.select("l_returnflag", "l_orderkey").distinct()
    agg = d.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("__approx__"),
        F.count(F.lit(1)).alias("exact_orders"))
    rel_err = (F.abs(F.col("__approx__") - F.col("exact_orders"))
               / F.col("exact_orders"))
    return agg.select(
        "l_returnflag",
        "exact_orders",
        F.when(rel_err <= 0.05, F.lit(True)).otherwise(
            F.raise_error(F.concat(
                F.lit("approx_count_distinct outside 5% of exact: "),
                F.col("__approx__").cast("string"), F.lit(" vs "),
                F.col("exact_orders").cast("string")))
            .cast("boolean")).alias("within_bound"))


def q_date_arith(spark, sf_dir):
    """Date arithmetic catalog (extension, SURVEY §2.8): day diffs,
    month adds, extraction."""
    o = load_table(spark, sf_dir, "orders").df
    d = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias("days_to_y2k"),
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        F.unix_micros(F.add_months(d, 3).cast("timestamp")).alias("plus3m"),
    )


def q_null_funcs(spark, sf_dir):
    """NULL-handling catalog (extension, SURVEY §2.8): coalesce /
    nullif / null-aware counts over the outer-join shape."""
    n = load_table(spark, sf_dir, "nation").df
    s = load_table(spark, sf_dir, "supplier").df
    j = n.join(s, n["n_nationkey"] == s["s_nationkey"], "left")
    return j.groupBy("n_name").agg(
        F.count("s_suppkey").alias("n_nonnull"),
        F.sum(F.when(F.col("s_suppkey").isNull(), 1).otherwise(0)).alias("n_null"),
        # decimal-sum, NOT _dsum: the r2→r3 integer-cents rewrite flipped
        # the driver row red (negative s_acctbal half-up vs decimal
        # rounding diverges at the driver); decimal form was green on
        # r2's full 67-row sheet. See NOTES.md round-5 entry.
        F.coalesce(F.sum(_dec("s_acctbal")).cast("double"), F.lit(0.0))
        .alias("total_bal"),
        F.max(F.nullif(F.lit("x"), F.lit("x"))).alias("always_null"),
    )


def q_range_join(spark, sf_dir):
    """Banded range join (operators/rangejoin.py): for each event, how
    many OTHER users' events happened within ±60 seconds. Equi-join on
    time bins instead of a nested-loop range join."""
    from csvplus_spark.operators.rangejoin import within_range_join

    ev = load_table(spark, sf_dir, "events").df \
        .select("event_id", "user_id", F.unix_micros("ts").alias("us"))
    l = ev.select(F.col("event_id").alias("eid"), F.col("user_id").alias("uid"),
                  F.col("us").alias("lus"))
    r = ev.select(F.col("event_id").alias("rid"), F.col("user_id").alias("ruid"),
                  F.col("us").alias("rus"))
    joined = within_range_join(l, r, "lus", "rus", 60_000_000.0)
    near = joined.filter(F.col("uid") != F.col("ruid")) \
        .groupBy("eid").agg(F.count(F.lit(1)).alias("n_nearby"))
    return (
        l.join(near, "eid", "left")
        .select(F.col("eid").alias("event_id"),
                F.coalesce("n_nearby", F.lit(0)).alias("n_nearby"))
    )


def q_hash_sample(spark, sf_dir):
    """Deterministic stratified sampling + split labels over documents
    (operators/sampling.py): language-rebalanced sample with
    train/val/test assignment, reproducible across engines."""
    from csvplus_spark.operators.sampling import (
        stratified_hash_sample,
        train_val_test_split,
    )

    docs = load_table(spark, sf_dir, "documents").df
    sampled = stratified_hash_sample(
        docs, "lang", "doc_id",
        {"en": 0.5, "es": 1.0, "de": 1.0, "fr": 1.0, "zh": 1.0},
    )
    return train_val_test_split(sampled, "doc_id") \
        .select("doc_id", "lang", "split")


def q_repeated_spans(spark, sf_dir):
    """Cross-doc repeated 5-token spans with token positions
    (operators/text.py::repeated_spans) — the detection half of
    exact-substring dedup (ExactSubstr-lite)."""
    from csvplus_spark.operators.text import repeated_spans

    docs = load_table(spark, sf_dir, "documents").df
    return repeated_spans(docs, k=5, min_docs=2)


def q_remove_spans(spark, sf_dir):
    """ExactSubstr removal step (operators/text.py::
    remove_repeated_spans): rewrite every doc with cross-doc repeated
    5-token spans cut from the normalized token stream."""
    from csvplus_spark.operators.text import remove_repeated_spans

    docs = load_table(spark, sf_dir, "documents").df
    return remove_repeated_spans(docs, k=5, min_docs=2)


def q_bm25(spark, sf_dir):
    """Top-3 BM25 terms per doc (operators/text.py::bm25_top_terms) —
    Okapi scoring with corpus scalars (N, avgdl) as scalar
    subqueries."""
    from csvplus_spark.operators.text import bm25_top_terms

    return bm25_top_terms(load_table(spark, sf_dir, "documents").df, 3)


def q_bigram_lm(spark, sf_dir):
    """Interpolated bigram LM quality score (operators/text.py::
    bigram_logprob): mean ln(0.75 P(w|prev) + 0.25 P(w)) per doc,
    position-ordered fold, round(6) — the KenLM-perplexity-filter
    proxy one order up from unigram_lm."""
    from csvplus_spark.operators.text import bigram_logprob

    return bigram_logprob(load_table(spark, sf_dir, "documents").df)


def q_unigram_lm(spark, sf_dir):
    """Corpus-unigram LM quality score (operators/text.py::
    unigram_logprob): mean ln P(token) per doc, position-ordered fold,
    round(6) — the self-trained perplexity-filter proxy."""
    from csvplus_spark.operators.text import unigram_logprob

    return unigram_logprob(load_table(spark, sf_dir, "documents").df)


def q_kmeans(spark, sf_dir):
    """Fixed-iteration Lloyd k-means (operators/similarity.py::
    kmeans_assign): k=8, 2 assignment→update rounds from lowest-id
    seeds; centroid means over floor(x·2^20) bigint sums so the
    update is float-order-independent and the whole trajectory is
    SQL-replayable. Per iteration: one ≤k-row centroid broadcast +
    per-row fold, one map-combined (cell, dim) aggregate."""
    from csvplus_spark.operators.similarity import kmeans_assign

    return kmeans_assign(load_table(spark, sf_dir, "embeddings").df,
                         8, iters=2)


def q_cluster_balance(spark, sf_dir):
    """Cluster-balanced curation sample: k-means cells (q_kmeans's
    exact trajectory) then a deterministic ≤40-per-cell quota via
    cap_per_group — the diversity-sampling primitive (cap the dense
    topic clusters, keep the tails whole)."""
    from csvplus_spark.operators.sampling import cap_per_group
    from csvplus_spark.operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings").df
    cells = kmeans_assign(emb, 8, iters=2)
    joined = cells.join(emb.select("vec_id", "label"), "vec_id")
    return cap_per_group(joined, "cell", "vec_id", 40) \
        .select("vec_id", "cell", "label")


def q_multimodal_wav(spark, sf_dir):
    """REAL audio decode end-to-end: deterministic 16-bit PCM WAVs
    are encoded per doc_id and decoded back through the real_codec
    mapInPandas path (operators/wavcodec.py — pure struct, works in
    this container). The oracle replays the integer sample formula:
    peak/Σs² are exact integer math, duration integer µs, rms one
    sqrt + round(6)."""
    from csvplus_spark.operators.multimodal import decode_audio

    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def make(batches):
        import pandas as pd

        from csvplus_spark.operators.wavcodec import encode_wav

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                n = int(did) % 50 + 10
                samples = [((int(did) * 31 + i * 17) % 65536) - 32768
                           for i in range(n)]
                blobs.append(encode_wav(8000, 1, 16, samples))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": blobs})

    blobs = docs.mapInPandas(make, "media_id long, data binary")
    return decode_audio(blobs, real_codec=True)


def _audio_mixed_fixture(k: int) -> bytes:
    """Deterministic audio fixture #k (r10): even k → PCM WAV, odd k
    → FLAC (operators/flaccodec.py — FIXED+Rice, CONSTANT, VERBATIM,
    mid/side, 8/16/24-bit variants). Same deterministic sample
    formula either way, so the container format is the only thing
    that varies between adjacent fixtures."""
    from csvplus_spark.operators.flaccodec import encode_flac
    from csvplus_spark.operators.wavcodec import encode_wav

    bits = {5: 8, 7: 24}.get(k, 16)
    ch = 2 if k in (3, 9) else 1
    n = 40 + k * 7
    full = 1 << (bits - 1)
    # constant-signal fixtures: k=1 hits the FLAC CONSTANT subframe
    # path (odd k → FLAC; r10 ADVICE — even k=6 alone only exercised
    # the WAV constant signal), k=6 keeps the constant WAV leg
    if k in (1, 6):
        samples = [123 % full] * (n * ch)
    else:
        samples = [((k * 31 + i * 17) % (2 * full)) - full
                   for i in range(n * ch)]
    rate = 8000 if k % 3 else 16000
    if k % 2 == 0:
        return encode_wav(rate, ch, bits, samples)
    return encode_flac(rate, ch, bits, samples,
                       block_size=64 if k == 9 else 256,
                       mid_side=(k == 3), verbatim=(k == 11))


def _audio_mixed_stats(k: int) -> tuple:
    """(rate, ch, n_frames, duration_us, peak, rms) of fixture #k
    decoded through the real decode_audio math — pinned both sides."""
    import math

    from csvplus_spark.operators.flaccodec import decode_flac, is_flac
    from csvplus_spark.operators.wavcodec import decode_wav

    blob = _audio_mixed_fixture(k)
    (rate, ch, bits, n_frames), samples = \
        decode_flac(blob) if is_flac(blob) else decode_wav(blob)
    n = len(samples)
    peak = max((abs(s) for s in samples), default=0)
    ss = sum(s * s for s in samples)
    full = float(1 << (bits - 1))
    rms = round(math.sqrt(ss / n) / full, 6) if n else 0.0
    return rate, ch, n_frames, n_frames * 1_000_000 // rate, peak, rms


def q_multimodal_flac(spark, sf_dir):
    """MIXED-CONTAINER real audio decode (r10): alternating PCM-WAV /
    FLAC fixtures (FIXED+Rice residuals, CONSTANT and VERBATIM
    subframes, mid/side decorrelation, 8/16/24-bit, multi-frame
    streams) flow through ONE decode_audio(real_codec=True) plan —
    the format dispatch an audio corpus actually needs, decoded
    EXECUTOR-SIDE by the pure-Python codecs (operators/flaccodec.py +
    wavcodec.py). The oracle pins the identical decode computed at
    SQL-build time (the jpeg_px pattern); FLAC is lossless, so any
    Rice/LPC/decorrelation bug breaks the integer stats exactly."""
    from csvplus_spark.operators.multimodal import decode_audio

    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def make(batches):
        import pandas as pd

        cache: dict[int, bytes] = {}
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                kk = int(did) % 12
                if kk not in cache:
                    cache[kk] = _audio_mixed_fixture(kk)
                blobs.append(cache[kk])
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": blobs})

    blobs = docs.mapInPandas(make, "media_id long, data binary")
    return decode_audio(blobs, real_codec=True)


def _multimodal_flac_sql() -> str:
    pins = ",\n  ".join(
        f"({k}, {r}, {c}, {nf}, {du}, {pk}, {rms})"
        for k, (r, c, nf, du, pk, rms) in
        ((k, _audio_mixed_stats(k)) for k in range(12)))
    return f"""
SELECT d.doc_id AS media_id, p.sample_rate, p.channels, p.n_frames,
       p.duration_us, p.peak, CAST(p.rms AS DOUBLE) AS rms
FROM documents d
JOIN (VALUES
  {pins}) p(k, sample_rate, channels, n_frames, duration_us, peak, rms)
  ON d.doc_id % 12 = p.k
"""


def q_multimodal_mp4(spark, sf_dir):
    """REAL video-container metadata end-to-end: minimal ISO-BMFF
    streams (ftyp + moov/mvhd, both mvhd versions) are synthesized
    per doc_id and parsed back through the real_codec box walker
    (operators/multimodal.py::mp4_info — pure struct). The oracle
    replays the integer duration arithmetic."""
    from csvplus_spark.operators.multimodal import decode_video_meta

    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def make(batches):
        import pandas as pd

        from csvplus_spark.operators.multimodal import encode_minimal_mp4

        for pdf in batches:
            blobs = [encode_minimal_mp4(600, (int(d) % 1000 + 1) * 25,
                                        version=int(d) % 2)
                     for d in pdf["doc_id"]]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": blobs})

    blobs = docs.mapInPandas(make, "media_id long, data binary")
    return decode_video_meta(blobs, real_codec=True)


def q_funnel(spark, sf_dir):
    """Greedy first-match funnel view→click→purchase within 24h per
    step (operators/events_analytics.py::funnel_completion): one
    filtered min-aggregate per step + per-boundary equi-joins, all on
    the user key — one shuffle lineage, exact unix_micros math."""
    from csvplus_spark.operators.events_analytics import funnel_completion

    ev = load_table(spark, sf_dir, "events").df
    return funnel_completion(ev, ["view", "click", "purchase"])


def q_retention(spark, sf_dir):
    """Weekly cohort retention matrix (operators/events_analytics.py::
    cohort_retention): cohort = integer-division week of each user's
    first event; cells count distinct active users per offset."""
    from csvplus_spark.operators.events_analytics import cohort_retention

    return cohort_retention(load_table(spark, sf_dir, "events").df)


def q_embedding_drift(spark, sf_dir):
    """Per-dimension embedding drift monitor (operators/profile.py::
    embedding_drift) between the even- and odd-id halves — quantized-
    integer Σq/Σq² so mean/var are order-independent and engine-exact;
    one posexplode + one d-row aggregate per side."""
    import pyspark.sql.functions as F

    from csvplus_spark.operators.profile import embedding_drift

    emb = load_table(spark, sf_dir, "embeddings").df
    return embedding_drift(emb.filter(F.col("vec_id") % 2 == 0),
                           emb.filter(F.col("vec_id") % 2 == 1))


def q_bm25_search(spark, sf_dir):
    """BM25 keyword retrieval (operators/text.py::bm25_search): top-10
    docs for the query {join, shuffle, spark} — token stream filtered
    to the query terms BEFORE any aggregate (tf/df are |matches|-sized
    at any corpus scale), dl/avgdl integer-exact, term-ordered fold +
    round(6), id tie-break."""
    from csvplus_spark.operators.text import bm25_search

    return bm25_search(load_table(spark, sf_dir, "documents").df,
                       ["join", "shuffle", "spark"], k=10)


def q_fuzzy_join(spark, sf_dir):
    """Cross-table fuzzy join (operators/dedup.py::minhash_join):
    near-dup pairs between the even- and odd-id halves of documents —
    the snapshot-alignment shape (two corpora, no shared ids). Band
    tables join LEFT×RIGHT on (band, sig); exact cross-table Jaccard
    verify. Splitting one table by parity is oracle-equivalent to two
    independent corpora because signatures depend only on text."""
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").df
    from csvplus_spark.operators.dedup import minhash_join

    return minhash_join(docs.filter(F.col("doc_id") % 2 == 0),
                        docs.filter(F.col("doc_id") % 2 == 1), 0.6)


def q_pagerank(spark, sf_dir):
    """Integer PageRank over the MinHash near-dup graph (operators/
    graph.py::integer_pagerank): duplicate-cluster centrality, 3
    rounds, rational 17/20 damping — every mass quantity an exact
    int64, so the whole trajectory (and the upstream LSH pair set) is
    bit-replayed by the oracle. Guarded: the raw pair graph is f²-edged
    at duplication factor f (sf10 probe), so require_low_duplication
    routes high-f corpora to q_pagerank_reps instead of an OOM."""
    from csvplus_spark.operators.dedup import minhash_dedup_pairs
    from csvplus_spark.operators.graph import (integer_pagerank,
                                               require_low_duplication)

    docs = load_table(spark, sf_dir, "documents").df
    edges = minhash_dedup_pairs(
        require_low_duplication(docs, operator="pagerank"), 0.6)
    return integer_pagerank(edges)


def _dedup_reps_pairs(spark, sf_dir):
    """Shared graph-after-dedup preamble (SCALE.md sf10 findings): the
    near-dup pair graph of the exact-dedup CANONICAL docs only — one
    recipe for all three `_reps` graph queries, kept in lockstep with
    the shared _PAGERANK_REPS_DOCS_SRC oracle CTE."""
    from csvplus_spark.operators.dedup import exact_dedup, minhash_dedup_pairs

    docs = load_table(spark, sf_dir, "documents").df
    keep = exact_dedup(docs).filter("is_canonical").select("doc_id")
    return minhash_dedup_pairs(docs.join(keep, "doc_id"), 0.6)


def q_pagerank_reps(spark, sf_dir):
    """Duplicate-cluster centrality the 100 TB way: exact-dedup FIRST,
    then PageRank over the near-dup graph of the CANONICAL docs only —
    the graph-after-dedup pipeline order docs/SCALE.md recommends
    (the raw pair graph holds f²-sized cliques at duplication factor
    f; the sf10 probe measured the raw-graph pagerank exhausting the
    sandbox at f=100 while this shape stays collapse-sized)."""
    from csvplus_spark.operators.graph import integer_pagerank

    return integer_pagerank(_dedup_reps_pairs(spark, sf_dir))


_PAGERANK_REPS_DOCS_SRC = """(
  SELECT d.doc_id, d.text FROM documents d
  JOIN (SELECT MIN(doc_id) AS doc_id FROM (
          SELECT doc_id,
                 md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
          FROM documents) GROUP BY fp) k USING (doc_id))"""


def q_triangles(spark, sf_dir):
    """Per-node triangle counts of the MinHash near-dup graph
    (operators/graph.py::triangle_count): oriented wedge join +
    closure check — the cohesion diagnostic separating duplicate
    cliques from false-positive bridges. Guarded: raw triangle count
    is ~f³ at duplication factor f, so require_low_duplication routes
    high-f corpora to q_triangles_reps."""
    from csvplus_spark.operators.dedup import minhash_dedup_pairs
    from csvplus_spark.operators.graph import (require_low_duplication,
                                               triangle_count)

    docs = load_table(spark, sf_dir, "documents").df
    return triangle_count(minhash_dedup_pairs(
        require_low_duplication(docs, operator="triangles"), 0.6))


def q_kcore_reps(spark, sf_dir):
    """2-core of the graph-after-dedup near-dup graph: exact-dedup
    first, peel the canonical docs' graph (see q_pagerank_reps — the
    raw graph is f²-edged under duplication factor f)."""
    from csvplus_spark.operators.graph import kcore_peel

    return kcore_peel(_dedup_reps_pairs(spark, sf_dir), k=2, rounds=6)


def q_triangles_reps(spark, sf_dir):
    """Per-node triangle counts of the graph-after-dedup near-dup
    graph (see q_pagerank_reps: raw triangle count is ~f³ under
    duplication — the sf10 probe's honest failure; this is the
    shipped scale shape)."""
    from csvplus_spark.operators.graph import triangle_count

    return triangle_count(_dedup_reps_pairs(spark, sf_dir))


def q_tpch_q9_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by (supplier nation, order year) — a
    4-fact/dim join tree (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈
    nation) with broadcast dims and ONE fact shuffle; profit =
    exact integer-cents revenue minus a cost term (adapted: no
    partsupp supplycost column — cost = retailprice·qty)."""
    li = load_table(spark, sf_dir, "lineitem").df
    p = load_table(spark, sf_dir, "part").df \
        .filter(F.col("p_name").contains("red"))
    s = load_table(spark, sf_dir, "supplier").df
    n = load_table(spark, sf_dir, "nation").df
    o = load_table(spark, sf_dir, "orders").df
    amount = (_cents("l_extendedprice")
              * (F.lit(100) - _cents("l_discount"))
              - _cents("p_retailprice") * F.lit(100)
              * F.col("l_quantity").cast("long"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(amount) / F.lit(10000.0)).alias("profit"))
    )


def q_window_lead_ntile(spark, sf_dir):
    """Window-function breadth: lead/lag deltas and quartile ntile
    over each customer's order history — partitioned windows only
    (parallel per customer), exact integer cents and epoch µs."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").df
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    us = F.unix_micros(F.col("o_orderdate"))
    return o.select(
        "o_custkey", "o_orderkey",
        us.alias("order_us"),
        (F.lead(us).over(w) - us).alias("gap_to_next_us"),
        (_cents("o_totalprice")
         - F.lag(_cents("o_totalprice")).over(w)).alias("price_delta_c"),
        F.ntile(4).over(w).alias("quartile"),
    )


def q_mean_pool(spark, sf_dir):
    """Group mean-pooling of embeddings per label (operators/
    similarity.py::mean_pool_embeddings) — quantized-integer means
    (order-independent, engine-exact), one (group, dim) map-combined
    aggregate. The GATE query explodes the operator's array<double>
    output to (label, dim, val, n_members) scalar rows — the house
    convention for vector outputs (see q_normalize_embeddings): the
    driver canonicalizer sorts by every output column and cannot
    factorize list cells, so array-typed outputs would err even when
    the values hash-match (round-10 verdict item 1). The operator API
    itself keeps returning arrays."""
    from csvplus_spark.operators.similarity import mean_pool_embeddings

    emb = load_table(spark, sf_dir, "embeddings").df
    pooled = mean_pool_embeddings(emb, "label")
    return pooled.select(
        "label",
        F.posexplode("pooled").alias("dim", "val"),
        "n_members",
    ).withColumn("dim", F.col("dim").cast("long"))


def q_ivf2_seeded(spark, sf_dir):
    """Two-level seeded IVF (operators/similarity.py::
    ivf2_seeded_topk): 8 coarse cells × 4 lowest-member sub-cells,
    probe 3×2 — the coarse→fine codebook shape for corpora past the
    flat-cell assignment wall (~270M vectors at auto_n_cells'
    defaults). Every stage (both argmin levels, both probe ranks,
    exact rerank) is bit-replayed by the oracle."""
    from csvplus_spark.operators.similarity import ivf2_seeded_topk

    out = ivf2_seeded_topk(load_table(spark, sf_dir, "embeddings").df,
                           k=5)
    return out.withColumn("sim", F.round("sim", 6))


def q_fuzzy_join_fast(spark, sf_dir):
    """Duplication-immune cross-table fuzzy join (operators/dedup.py::
    minhash_join_collapsed): same oracle as fuzzy_join — outputs are
    byte-identical by the collapse-identity argument — with band +
    verify volume shrunk ×(f_L·f_R) on duplicated corpora."""
    import pyspark.sql.functions as F

    from csvplus_spark.operators.dedup import minhash_join_collapsed

    docs = load_table(spark, sf_dir, "documents").df
    return minhash_join_collapsed(docs.filter(F.col("doc_id") % 2 == 0),
                                  docs.filter(F.col("doc_id") % 2 == 1),
                                  0.6)


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py::pq_*): m=8
    subspace codebooks (k=8, one quantized-Lloyd round from lowest-id
    seeds), corpus encoded to 8 codes/vector, asymmetric-distance
    top-5 for the 20 lowest-id probes. The PQ contract at 100 TB:
    codebooks are an m·k broadcast, codes are ~32× smaller than the
    vectors, and search never touches the original embeddings."""
    import pyspark.sql.functions as F

    from csvplus_spark.operators.similarity import (pq_codebooks,
                                                    pq_encode, pq_topk)

    emb = load_table(spark, sf_dir, "embeddings").df
    cb = pq_codebooks(emb, m=8, k=8, iters=1)
    codes = pq_encode(emb, cb, m=8)
    probes = emb.filter(F.col("vec_id") < 20)
    return pq_topk(probes, codes, cb, k=5, m=8)


def q_linear_scorer(spark, sf_dir):
    """Trainable hashed-feature quality scorer (operators/text.py::
    hashed_linear_scorer): diagonal ridge of the 'en' label on hashed
    unigram counts — exact integer sufficient statistics, ≤1024-row
    broadcast model, bucket-ordered scoring fold."""
    import pyspark.sql.functions as F

    from csvplus_spark.operators.text import hashed_linear_scorer

    docs = load_table(spark, sf_dir, "documents").df
    return hashed_linear_scorer(docs, F.col("lang") == "en")


def q_weighted_sample(spark, sf_dir):
    """Systematic weighted sampling (operators/sampling.py::
    systematic_weighted_sample): keep ~100 docs with probability
    ∝ n_chars by one stride through the hash-permuted cumulative
    weight axis — integer/decimal-exact inclusion test (no float
    boundary), bucket-prefix-sum cumsum (no data-sized window)."""
    from csvplus_spark.operators.sampling import systematic_weighted_sample

    docs = load_table(spark, sf_dir, "documents").df
    return systematic_weighted_sample(
        docs, "n_chars", 100, "doc_id").select("doc_id", "lang", "n_chars")


def q_dsir(spark, sf_dir):
    """DSIR importance weights (operators/text.py::dsir_logweights):
    per-doc log importance ratio of a target domain (here the 'en'
    slice as exemplar) over the raw corpus via hashed unigram+bigram
    bag-of-words models with add-1 smoothing (Xie et al. 2023). The
    hashed models are ≤10k-bucket broadcast tables regardless of
    corpus size — the scale-free trick that makes DSIR a one-explode,
    two-bounded-aggregate pass at 100 TB."""
    import pyspark.sql.functions as F

    from csvplus_spark.operators.text import dsir_logweights

    docs = load_table(spark, sf_dir, "documents").df
    return dsir_logweights(docs, F.col("lang") == "en")


def q_global_shuffle(spark, sf_dir):
    """Deterministic global shuffle order for training dataloaders
    (operators/sampling.py::global_order_index): 0-based position in
    (hash60, key) order via the bucket-prefix-sum decomposition — no
    single-task global window."""
    from csvplus_spark.operators.sampling import global_order_index

    docs = load_table(spark, sf_dir, "documents").df.select("doc_id", "lang")
    return global_order_index(docs, "doc_id", salt="shuffle", out_col="pos")


def q_quality_topfrac(spark, sf_dir):
    """Quality-percentile curation (operators/sampling.py::
    top_fraction_by_score): keep the best 25% of each language by
    quality score, ties hash-broken — same scalar-cutoff scale shape
    as cap_per_group, ordered by (score DESC, hash)."""
    from csvplus_spark.operators.sampling import top_fraction_by_score
    from csvplus_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents").df
    scored = docs.select(
        "doc_id", "lang", quality_score("text").alias("quality"))
    return top_fraction_by_score(scored, "quality", "lang", 0.25, "doc_id")


def q_dedup_embedding_lsh(spark, sf_dir):
    """Sub-quadratic embedding near-dup: sign-LSH bucket candidates
    (8 tables × 4 deterministic md5-derived hyperplanes) + exact cosine
    rerank (operators/dedup.py, method='lsh'). The oracle reproduces
    the SAME buckets, so the driver verifies algorithm parity — recall
    vs all-pairs is deliberately < 1 at this boundary-heavy threshold
    (docs/SCALE.md §embedding)."""
    from csvplus_spark.operators.dedup import embedding_near_pairs

    return embedding_near_pairs(
        load_table(spark, sf_dir, "embeddings").df, 0.4, method="lsh")


#: frozen merges table for the PINNED rows of q_bpe_counts — trained
#: once by train_bpe_merges (ties lexicographic, deterministic) and
#: hard-coded so the oracle literals below pin the engine's actual
#: merge-loop behavior against constants, not against itself
_BPE_PIN_MERGES = ("#version: 0.2\nh e\nt he\nl o\nĠ the\na t\n"
                   "lo w\nĠ low\nĠlow e\nhe l\nhel lo\n")

#: (pin_id, text, expected_token_count) — expected counts computed by
#: the byte-level merge loop under _BPE_PIN_MERGES and FROZEN here;
#: the oracle emits them as literals, so any drift in pre-tokenizer,
#: byte alphabet, or merge order hash-mismatches the driver row
_BPE_PINS = [
    (0, "hello hello world", 9),
    (1, "the cat sat on the mat", 14),
    (2, "ababababab", 10),
    (3, "", 0),
    (4, "a,b.c!", 6),
    (5, "  spaced   out  ", 16),
    (6, "lowest common denominator", 22),
    (7, "Ünïcödé test ✓", 20),
]


def q_bpe_counts(spark, sf_dir):
    """REAL merges-table BPE token counts (Sennrich merge loop, GPT-2
    merges.txt format; operators/bpe.py) — one Arrow mapInPandas pass
    with the ranks broadcast. The iterative merge loop is not
    SQL-expressible, so the query is made hash-checkable the way
    approx_distinct was (VERDICT r7 item 2), two-part:

    * corpus rows ENFORCE the tokenizer's algebraic bounds in-plan —
      merges only ever join symbols WITHIN one pre-token, so
      ws_tokens ≤ n_tokens_bpe ≤ utf8_bytes for every document; any
      violation raise_errors the whole query, and the emitted columns
      (ws_tokens, utf8 byte length, enforced flag) are deterministic
      and DuckDB-matchable;
    * pinned rows run the SAME distributed counting path under the
      frozen literal merges table _BPE_PIN_MERGES and emit the raw
      counts, which the oracle pins as hard-coded literals."""
    from csvplus_spark.operators.bpe import bpe_token_counts, parse_merges

    docs = load_table(spark, sf_dir, "documents").df
    counts = bpe_token_counts(docs)  # corpus-trained merges, real path
    txt = docs.select("doc_id",
                      F.coalesce(F.col("text"), F.lit("")).alias("__t__"))
    # count NON-EMPTY split chunks: F.trim strips only ASCII spaces, so
    # a tab/newline-only text slips the trim==\"\" guard and splits to
    # ["", ""] — naive size() would claim 2 ws tokens > 1 bpe token and
    # trip the raise_error on valid input (r8 review finding). The
    # whitespace class is spelled out because Java's \\s includes
    # vertical tab while RE2's does not (second review finding) —
    # an explicit class is identical in both engines by construction.
    ws = F.size(F.filter(F.split("__t__", "[ \t\n\x0b\f\r]+"),
                         lambda x: x != "")).cast("long")
    nb = F.octet_length("__t__").cast("long")
    ok = F.when((F.col("__ws__") <= F.col("n_tokens_bpe"))
                & (F.col("n_tokens_bpe") <= F.col("__nb__")),
                F.lit(True)).otherwise(
        F.raise_error(F.concat(
            F.lit("bpe count outside [ws_tokens, utf8_bytes]: "),
            F.col("n_tokens_bpe").cast("string"), F.lit(" not in ["),
            F.col("__ws__").cast("string"), F.lit(", "),
            F.col("__nb__").cast("string"), F.lit("]")))
        .cast("boolean"))
    corpus = (counts.join(txt.select("doc_id", ws.alias("__ws__"),
                                     nb.alias("__nb__")), "doc_id")
              .select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.lit("bounds").alias("kind"),
                      F.col("__ws__").alias("val1"),
                      F.col("__nb__").alias("val2"),
                      ok.alias("ok")))
    pins = spark.createDataFrame([(i, s) for i, s, _ in _BPE_PINS],
                                 "pin_id long, text string")
    ranks = parse_merges(_BPE_PIN_MERGES.splitlines())
    pinned = (bpe_token_counts(pins, ranks=ranks, id_col="pin_id")
              .select((-F.col("pin_id") - 1).cast("long").alias("doc_id"),
                      F.lit("pinned").alias("kind"),
                      F.col("n_tokens_bpe").cast("long").alias("val1"),
                      F.lit(0).cast("long").alias("val2"),
                      F.lit(True).alias("ok")))
    return corpus.unionByName(pinned)


def q_ivf_seeded(spark, sf_dir):
    """IVF top-5 with deterministic seed centroids (16 lowest-id
    vectors, Voronoi assignment by exact squared-L2 argmin, 4 probed
    cells per query, exact rerank) — the oracle replays every stage
    from the same literal seeds, so the driver verifies the full IVF
    pipeline bit-for-bit (operators/similarity.py::ivf_seeded_topk;
    VERDICT r2 item 7; the KMeans/persisted variant keeps its
    PartitionFilters pruning guard in test_llm_ops)."""
    from csvplus_spark.operators.similarity import ivf_seeded_topk

    out = ivf_seeded_topk(load_table(spark, sf_dir, "embeddings").df, 5,
                          n_cells=16)
    return out.withColumn("sim", F.round("sim", 6))


_IVF_SEEDED_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
cent AS (SELECT vec_id AS cell, e AS c FROM v ORDER BY vec_id LIMIT 16),
ad AS (
  SELECT v.vec_id, cent.cell,
         list_sum(list_transform(range(1, len(v.e) + 1),
                  k -> (v.e[k] - cent.c[k]) * (v.e[k] - cent.c[k]))) AS d2
  FROM v CROSS JOIN cent
),
assign AS (
  SELECT vec_id AS corpus_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM ad) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM ad WHERE vec_id < 50) WHERE rn <= 4
),
norms AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS n FROM v),
scored AS (
  SELECT p.query_id, a.corpus_id,
         list_sum(list_transform(range(1, len(vq.e) + 1),
                  k -> vq.e[k] * vc.e[k])) / (nq.n * nc.n) AS sim_raw
  FROM probes p JOIN assign a ON p.cell = a.cell
  JOIN v vq ON p.query_id = vq.vec_id
  JOIN v vc ON a.corpus_id = vc.vec_id
  JOIN norms nq ON p.query_id = nq.vec_id
  JOIN norms nc ON a.corpus_id = nc.vec_id
  WHERE p.query_id <> a.corpus_id
)
SELECT query_id, corpus_id,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, corpus_id) AS rank,
       ROUND(sim_raw, 6) AS sim
FROM scored
QUALIFY rank <= 5
"""


def _minhash_pairs_cte(threshold: float = 0.6,
                       docs_src: str = "documents") -> str:
    """WITH-body computing MATERIALIZED `pairs` (d1 < d2, verified
    jaccard >= threshold) — the shared edge source of the graph
    oracles (pagerank, triangles). Mirrors _MINHASH_SQL exactly.
    ``docs_src`` swaps in the exact-dedup-collapsed doc source for
    the graph-after-dedup `_reps` variants."""
    return f"""sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS t FROM {docs_src})
),
{_minhash_cte_sql()},
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.x = b.x AND a.y = b.y
   AND a.doc_id < b.doc_id
),
pairs AS MATERIALIZED (
  SELECT d1, d2 FROM (
    SELECT d1, d2,
           len(list_filter(s1.sh, x -> list_contains(s2.sh, x))) AS i,
           len(s1.sh) AS n1, len(s2.sh) AS n2
    FROM cand JOIN sh s1 ON d1 = s1.doc_id JOIN sh s2 ON d2 = s2.doc_id)
  WHERE i * 1.0 / (n1 + n2 - i) >= {threshold}
)"""


def _triangles_sql(docs_src: str = "documents") -> str:
    return f"""
WITH {_minhash_pairs_cte(docs_src=docs_src)},
e AS MATERIALIZED (
  SELECT LEAST(d1, d2) AS a, GREATEST(d1, d2) AS b FROM pairs
  WHERE d1 <> d2 GROUP BY 1, 2
),
tri AS MATERIALIZED (
  SELECT x.a AS a, x.b AS b, y.b AS c
  FROM e x JOIN e y ON x.b = y.a
  JOIN e z ON x.a = z.a AND y.b = z.b
)
SELECT node, COUNT(*) AS n_triangles
FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
GROUP BY node
"""


def _pagerank_chain_ctes(sh_cte: str = "sh", prefix: str = "",
                         iters: int = 3, num: int = 17, den: int = 20,
                         q: int = 1 << 40) -> tuple[str, str]:
    """The integer-PageRank CTE chain over the MinHash near-dup graph
    of docs in ``sh_cte`` (columns: doc_id, sh = shingle list). Every
    internal CTE name carries ``prefix`` so the chain composes into a
    host query (the training_set oracle) without name collisions.
    Returns (cte_text, final_cte_name) — the final CTE has columns
    (s, deg, q)."""
    P = prefix
    rounds = []
    for i in range(1, iters + 1):
        p = f"{P}pr{i - 1}"
        rounds.append(
            f"""{P}c{i} AS (SELECT e.d AS node, {p}.q // {p}.deg AS c
        FROM {P}e e JOIN {p} ON e.s = {p}.s),
{P}i{i} AS (SELECT node, SUM(c) AS m FROM {P}c{i} GROUP BY node),
{P}pr{i} AS MATERIALIZED (SELECT {p}.s, {p}.deg,
          ({num} * COALESCE({P}i{i}.m, 0)) // {den}
          + ({den - num} * ({q} // (SELECT n FROM {P}nn))) // {den} AS q
          FROM {p} LEFT JOIN {P}i{i} ON {p}.s = {P}i{i}.node)""")
    chain = ",\n".join(rounds)
    ctes = f"""{_minhash_cte_sql(sh_cte, P)},
{P}cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM {P}bands a JOIN {P}bands b
    ON a.band = b.band AND a.x = b.x AND a.y = b.y
   AND a.doc_id < b.doc_id
),
{P}pairs AS MATERIALIZED (
  SELECT d1, d2 FROM (
    SELECT d1, d2,
           len(list_filter(s1.sh, x -> list_contains(s2.sh, x))) AS i,
           len(s1.sh) AS n1, len(s2.sh) AS n2
    FROM {P}cand JOIN {sh_cte} s1 ON d1 = s1.doc_id
    JOIN {sh_cte} s2 ON d2 = s2.doc_id)
  WHERE i * 1.0 / (n1 + n2 - i) >= 0.6
),
{P}e AS MATERIALIZED (
  SELECT d1 AS s, d2 AS d FROM {P}pairs WHERE d1 <> d2
  UNION SELECT d2, d1 FROM {P}pairs WHERE d1 <> d2),
{P}deg AS MATERIALIZED (SELECT s, COUNT(*) AS deg FROM {P}e GROUP BY s),
{P}nn AS (SELECT COUNT(*) AS n FROM {P}deg),
{P}pr0 AS MATERIALIZED (
  SELECT s, deg, {q} // (SELECT n FROM {P}nn) AS q FROM {P}deg),
{chain}"""
    return ctes, f"{P}pr{iters}"


def _pagerank_sql(iters: int = 3, num: int = 17, den: int = 20,
                  q: int = 1 << 40, ndigits: int = 6,
                  docs_src: str = "documents") -> str:
    ctes, final = _pagerank_chain_ctes("sh", "", iters, num, den, q)
    return f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS t FROM {docs_src})
),
{ctes}
SELECT s AS node, ROUND(q / {float(q)}, {ndigits}) AS pr FROM {final}
"""


_TPCH_Q9_SQL = """
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))
           - CAST(floor(p.p_retailprice*100 + 0.5) AS BIGINT) * 100
             * CAST(l.l_quantity AS BIGINT)) / 10000.0 AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""

_WINDOW_LEAD_NTILE_SQL = """
SELECT o_custkey, o_orderkey,
       epoch_us(o_orderdate) AS order_us,
       lead(epoch_us(o_orderdate)) OVER w - epoch_us(o_orderdate)
         AS gap_to_next_us,
       CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
       - lag(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) OVER w
         AS price_delta_c,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

_MEAN_POOL_SQL = """
WITH ex AS (
  SELECT label, i - 1 AS dim,
         CAST(floor(CAST(e[i] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
  FROM (SELECT label, embedding AS e FROM embeddings),
       UNNEST(range(1, len(e) + 1)) AS u(i)
),
s AS (SELECT label, dim, SUM(q) AS sm, COUNT(*) AS ct
      FROM ex GROUP BY label, dim),
nm AS (SELECT label, MAX(ct) AS n_members FROM s GROUP BY label)
SELECT s.label, CAST(s.dim AS BIGINT) AS dim,
       CAST(sm AS DOUBLE) / ct / 1048576.0 AS val,
       nm.n_members
FROM s JOIN nm ON s.label = nm.label
"""

_IVF2_SEEDED_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
cent1 AS (SELECT vec_id AS cell, e AS cv FROM v ORDER BY vec_id LIMIT 8),
ad1 AS (
  SELECT v.vec_id, cent1.cell,
         list_sum(list_transform(range(1, len(v.e) + 1),
                  j -> (v.e[j] - cent1.cv[j]) * (v.e[j] - cent1.cv[j])))
         AS d2
  FROM v CROSS JOIN cent1
),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell)
           AS rn FROM ad1) WHERE rn = 1
),
subseeds AS (
  SELECT s.cell AS c1, s.vec_id AS c2, v.e AS sv
  FROM (SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id)
               AS sn FROM a1) s
  JOIN v ON s.vec_id = v.vec_id WHERE s.sn <= 4
),
fine AS (
  SELECT vec_id AS corpus_id, c1, c2 FROM (
    SELECT a1.vec_id, ss.c1, ss.c2,
           ROW_NUMBER() OVER (PARTITION BY a1.vec_id ORDER BY
             list_sum(list_transform(range(1, len(v.e) + 1),
                      j -> (v.e[j] - ss.sv[j]) * (v.e[j] - ss.sv[j]))),
             ss.c2) AS rn
    FROM a1 JOIN v ON a1.vec_id = v.vec_id
    JOIN subseeds ss ON a1.cell = ss.c1) WHERE rn = 1
),
p1 AS (
  SELECT vec_id AS query_id, cell AS c1 FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell)
           AS rn FROM ad1 WHERE vec_id < 50) WHERE rn <= 3
),
p2 AS (
  SELECT query_id, c1, c2 FROM (
    SELECT p1.query_id, p1.c1, ss.c2,
           ROW_NUMBER() OVER (PARTITION BY p1.query_id, p1.c1 ORDER BY
             list_sum(list_transform(range(1, len(vq.e) + 1),
                      j -> (vq.e[j] - ss.sv[j]) * (vq.e[j] - ss.sv[j]))),
             ss.c2) AS rn
    FROM p1 JOIN subseeds ss ON p1.c1 = ss.c1
    JOIN v vq ON p1.query_id = vq.vec_id) WHERE rn <= 2
),
norms AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x)))
          AS n FROM v),
scored AS (
  SELECT p2.query_id, f.corpus_id,
         list_sum(list_transform(range(1, len(vq.e) + 1),
                  j -> vq.e[j] * vc.e[j])) / (nq.n * nc.n) AS sim_raw
  FROM p2 JOIN fine f ON p2.c1 = f.c1 AND p2.c2 = f.c2
  JOIN v vq ON p2.query_id = vq.vec_id
  JOIN v vc ON f.corpus_id = vc.vec_id
  JOIN norms nq ON p2.query_id = nq.vec_id
  JOIN norms nc ON f.corpus_id = nc.vec_id
  WHERE p2.query_id <> f.corpus_id
)
SELECT query_id, corpus_id,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY sim_raw DESC, corpus_id) AS rank,
       ROUND(sim_raw, 6) AS sim
FROM scored
QUALIFY rank <= 5
"""


def q_simhash_pairs(spark, sf_dir):
    """EXACT SimHash Hamming≤3 near-pairs via pigeonhole chunk blocking
    — equi-join on (chunk, value), never a nested loop
    (operators/dedup.py::simhash_near_pairs). Pins n_bits=32 for oracle
    continuity only — the library default is the discriminating 60-bit
    hash (VERDICT r4 item 6); see q_simhash_pairs60 / q_simhash_reps60."""
    from csvplus_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(load_table(spark, sf_dir, "documents").df, 3,
                              n_bits=32)


def q_simhash_pairs60(spark, sf_dir):
    """SimHash near-pairs at the full 60-bit hash width: Hamming≤3 on
    60 bits is discriminating even on template corpora, so the answer
    (and the chunk-join candidate volume) stays near-linear where the
    32-bit table yields ~n²/6 pairs (operators/dedup.py::
    simhash_near_pairs, VERDICT r2 item 4). max_pairs_per_group=1000
    bounds the one remaining quadratic term — Hamming-0 duplicate
    families at duplication factor f emit C(f,2) pairs uncapped (72×
    per 10× at sf10) — by swapping oversized groups to their
    connectivity-identical star/bridge rows. The cap never binds below
    group size 45, so the all-pairs oracle is exact at driver scales
    (sf0.01: zero same-hash groups anywhere near that; identity vs the
    uncapped form is pinned by test_simhash_pair_cap)."""
    from csvplus_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(
        load_table(spark, sf_dir, "documents").df, 3, n_bits=60,
        max_pairs_per_group=1000)


def q_simhash_reps60(spark, sf_dir):
    """Linear-size SimHash dedup: one (doc_id, rep_id) row per document
    via connected components over the 60-bit Hamming≤3 graph — the
    scale-honest output mode (operators/dedup.py::simhash_reps)."""
    from csvplus_spark.operators.dedup import simhash_reps

    return simhash_reps(load_table(spark, sf_dir, "documents").df, 3)


def _lsh_plane_sign(plane: int, j: int) -> int:
    """Python twin of similarity._plane_sign: ±1 from md5('{plane}|{j}')
    bit 0 — evaluated at SQL-build time so the oracle embeds the same
    hyperplanes as literals."""
    import hashlib

    h = int(hashlib.md5(f"{plane}|{j}".encode()).hexdigest()[:15], 16)
    return 1 if (h & 1) == 1 else -1


def _dedup_emb_lsh_sql(threshold: float = 0.4, n_bits: int = 4,
                       n_tables: int = 8, dim: int = 64) -> str:
    tables_sql = []
    for t in range(n_tables):
        bits = []
        for i in range(n_bits):
            plane = t * n_bits + i
            lst = "[" + ", ".join(
                str(float(_lsh_plane_sign(plane, j))) for j in range(dim)) + "]"
            signed = (f"list_sum(list_transform(range(1, {dim + 1}), "
                      f"k -> ({lst})[k] * e[k]))")
            bits.append(f"(CASE WHEN {signed} > 0 THEN CAST({1 << i} AS BIGINT)"
                        f" ELSE CAST(0 AS BIGINT) END)")
        tables_sql.append(
            f"SELECT vec_id, {' + '.join(bits)} AS bucket, {t} AS tbl FROM v")
    bt = "\nUNION ALL\n".join(tables_sql)
    dot = (f"list_sum(list_transform(range(1, {dim + 1}), "
           f"k -> va.e[k] * vb.e[k]))")
    return f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
bt AS ({bt}),
cand AS (
  SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
  FROM bt a JOIN bt b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
nrm AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS nn FROM v)
SELECT c.i AS id_1, c.j AS id_2, {dot} / (na.nn * nb.nn) AS sim
FROM cand c
JOIN v va ON c.i = va.vec_id JOIN v vb ON c.j = vb.vec_id
JOIN nrm na ON c.i = na.vec_id JOIN nrm nb ON c.j = nb.vec_id
WHERE {dot} / (na.nn * nb.nn) >= {threshold}
"""


def q_winnow(spark, sf_dir):
    """Winnowing fingerprints (rolling-hash k-grams + sliding min
    window, MOSS algorithm; operators/text.py::winnow_fingerprints)."""
    from csvplus_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(load_table(spark, sf_dir, "documents").df, 8, 4)


def _winnow_sql(k: int = 8, w: int = 4) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nrm
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(generate_series(1, length(nrm) - {k - 1})) AS pos,
         nrm
  FROM base
  WHERE length(nrm) >= {k}
),
e AS (
  SELECT doc_id, pos,
         lpad(CAST({_HASH60_SQL.format(x=f"substring(nrm, CAST(pos AS INT), {k})")} AS VARCHAR), 19, '0')
           || lpad(CAST(9999999 - pos AS VARCHAR), 7, '0') AS enc,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM g
),
s AS (
  SELECT doc_id, pos, n,
         MIN(enc) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS sel
  FROM e
)
SELECT DISTINCT doc_id,
       9999999 - CAST(substring(sel, 20, 7) AS INT) AS pos,
       CAST(substring(sel, 1, 19) AS BIGINT) AS fp
FROM s WHERE pos <= n - {w - 1}
"""


def q_token_counts(spark, sf_dir):
    """Token counting three ways (task north-star: whitespace + BPE-ish
    regex; operators/text.py): whitespace tokens, word-regex tokens,
    approximate subword (BPE-ish) tokens."""
    from csvplus_spark.operators.text import (bpe_token_count, token_count,
                                              ws_token_count)

    docs = load_table(spark, sf_dir, "documents").df
    return docs.select(
        "doc_id",
        ws_token_count("text").alias("n_ws"),
        token_count("text").cast("long").alias("n_words"),
        bpe_token_count("text").alias("n_bpe"),
    )


def q_multimodal_features(spark, sf_dir):
    """Feature extraction over binary blobs via Arrow mapInPandas
    (operators/multimodal.py::extract_features): the model call is a
    deterministic md5-derived stub, so the WHOLE Pandas-UDF pipeline —
    Arrow binary transfer, batch iteration, exploded output — is
    oracle-checked bit-for-bit."""
    from csvplus_spark.operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents").df
    blobs = docs.select(F.col("doc_id").alias("media_id"),
                        F.encode("text", "UTF-8").alias("data"))
    return extract_features(blobs, dim=8)


_MULTIMODAL_FEATURES_SQL = """
SELECT doc_id AS media_id, CAST(j AS INT) AS feat_idx,
       (CAST(('0x' || substring(md5(md5(text) || '|' || CAST(j AS VARCHAR)),1,15))
             AS BIGINT) % 10000) / 10000.0 - 0.5 AS feature
FROM documents
CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) t
"""


def q_multimodal_grid(spark, sf_dir):
    """The binary-column RETRIEVAL pipeline end-to-end (r11 verdict
    item 6): extract_features (Arrow mapInPandas over blobs, md5-stub
    model — operators/multimodal.py:308) → assemble the exploded
    (media_id, feat_idx, feature) rows into 8-dim vectors → grid_topk
    exact cosine top-3 (operators/similarity.py:644 — blocked
    per-cell BLAS prefilter + fold rescore, values bit-identical to
    brute force). This is the composition a multimodal corpus needs at
    100 TB: feature extraction never leaves the executors, the vector
    assembly is one (media_id) aggregate, and the ANN stage is the
    grid plan whose cells stay bounded at any corpus size. Queries are
    the 20 lowest media_ids (bounded probe set, scale-invariant)."""
    from csvplus_spark.operators.multimodal import extract_features
    from csvplus_spark.operators.similarity import grid_topk

    docs = load_table(spark, sf_dir, "documents").df
    blobs = docs.select(F.col("doc_id").alias("media_id"),
                        F.encode("text", "UTF-8").alias("data"))
    feats = extract_features(blobs, dim=8)
    vecs = (feats.groupBy("media_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("feat_idx", "feature")))
                .alias("__a__"))
            .select(F.col("media_id").alias("vec_id"),
                    F.transform("__a__", lambda t: t["feature"])
                    .alias("embedding")))
    # materialize the vector table ONCE (it is ~100 bytes/doc — tiny
    # next to the blobs): grid_topk's auto-sizing counts plus its grid
    # row/column shipping would otherwise re-run the mapInPandas
    # extraction 3-4x (Catalyst cannot prune through a Python stage).
    # Same documented fan-out pattern as training_set.
    vecs = vecs.localCheckpoint()
    out = grid_topk(vecs.filter(F.col("vec_id") < 20), vecs, k=3)
    return out.withColumn("sim", F.round("sim", 6))


_MULTIMODAL_GRID_SQL = """
WITH f AS (
  SELECT doc_id AS vec_id, j AS feat_idx,
         (CAST(('0x' || substring(md5(md5(text) || '|' || CAST(j AS VARCHAR)),1,15))
               AS BIGINT) % 10000) / 10000.0 - 0.5 AS feature
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) t
),
v AS (SELECT vec_id, list(feature ORDER BY feat_idx) AS e
      FROM f GROUP BY vec_id),
norms AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS n
          FROM v),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]))
           / (nq.n * nc.n) AS sim_raw
  FROM (SELECT * FROM v WHERE vec_id < 20) q
  JOIN v c ON q.vec_id <> c.vec_id
  JOIN norms nq ON q.vec_id = nq.vec_id
  JOIN norms nc ON c.vec_id = nc.vec_id
)
SELECT query_id, corpus_id,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY sim_raw DESC, corpus_id) AS rank,
       ROUND(sim_raw, 6) AS sim
FROM pairs
QUALIFY rank <= 3
"""


def q_quantize(spark, sf_dir):
    """Symmetric int8 embedding quantization, exploded form
    (operators/quantization.py): scale, quantized level, and exact
    reconstruction — all bit-identical to the oracle."""
    from csvplus_spark.operators.quantization import quantize_embeddings

    return quantize_embeddings(load_table(spark, sf_dir, "embeddings").df)


_QUANTIZE_SQL = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM v)
SELECT vec_id, CAST(j AS INT) AS dim_idx, scale,
       CAST(CASE WHEN scale = 0 THEN 0
                 ELSE floor(e[j] / scale * 127 + 0.5) END AS INT) AS q,
       (CASE WHEN scale = 0 THEN 0
             ELSE floor(e[j] / scale * 127 + 0.5) END) * scale / 127 AS deq
FROM s CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) t
"""


def q_rand_proj(spark, sf_dir):
    """Johnson-Lindenstrauss ±1 random projection 64→8 dims
    (operators/similarity.py::random_projection): deterministic
    md5-derived sign matrix, no shuffle — the dim-reduction pre-step
    before ANN/clustering at scale. Oracle embeds the same sign
    literals, so every projected coordinate is bit-checked."""
    from csvplus_spark.operators.similarity import random_projection

    return random_projection(load_table(spark, sf_dir, "embeddings").df)


def _rand_proj_sql(out_dim: int = 8, dim: int = 64,
                   plane_offset: int = 4096) -> str:
    import math

    scale = repr(math.sqrt(float(out_dim)))
    cols = []
    for k in range(out_dim):
        lst = "[" + ", ".join(
            str(float(_lsh_plane_sign(plane_offset + k, j)))
            for j in range(dim)) + "]"
        dot = (f"list_sum(list_transform(range(1, {dim + 1}), "
               f"k -> ({lst})[k] * e[k]))")
        cols.append(f"{dot} / {scale} AS p{k}")
    return f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings)
SELECT vec_id, {', '.join(cols)} FROM v
"""


def q_normalize_embeddings(spark, sf_dir):
    """Unit-L2 normalization exploded to (vec_id, pos, val)
    (operators/similarity.py::l2_normalize) — same left-fold norm as
    cosine, so every normalized coordinate hash-matches the oracle."""
    from csvplus_spark.operators.similarity import l2_normalize

    return l2_normalize(load_table(spark, sf_dir, "embeddings").df)


_NORMALIZE_SQL = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
n AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS nn FROM v)
SELECT v.vec_id, CAST(j AS INT) AS pos,
       CASE WHEN nn = 0 THEN 0.0 ELSE e[j] / nn END AS val
FROM v JOIN n USING (vec_id)
CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) t
"""


def q_chunk_docs(spark, sf_dir):
    """Fixed-size token chunking (32-token windows, non-overlapping)
    for context-window preparation (operators/packing.py::chunk_docs)
    — pure per-row codegen, zero shuffles."""
    from csvplus_spark.operators.packing import chunk_docs

    return chunk_docs(load_table(spark, sf_dir, "documents").df, 32)


_CHUNK_DOCS_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
s AS (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) >= 1),
c AS (SELECT doc_id, ts, n, unnest(generate_series(1, n, 32)) AS start FROM s)
SELECT doc_id, CAST((start - 1) // 32 AS INT) AS chunk_id,
       array_to_string(ts[start : least(start + 31, n)], ' ') AS chunk_text,
       CAST(least(32, n - start + 1) AS INT) AS n_tokens
FROM c
"""


def q_pack_sequences(spark, sf_dir):
    """Concat-and-split sequence packing per source shard: which
    512-token pack each doc starts in, and at what offset
    (operators/packing.py::pack_sequences) — the dataloader index for
    padding-free packed pretraining batches."""
    from csvplus_spark.operators.packing import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents").df, 512)


_PACK_SEQUENCES_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
           AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(bf // 512 AS BIGINT) AS pack_id,
       CAST(bf % 512 AS BIGINT) AS pack_offset
FROM b
"""


def q_contamination(spark, sf_dir):
    """Benchmark-decontamination: corpus docs sharing any word trigram
    with a probe set (here: the 10 lowest-id docs stand in for an eval
    benchmark; self-pairs excluded) — operators/dedup.py."""
    from csvplus_spark.operators.dedup import contamination_check

    docs = load_table(spark, sf_dir, "documents").df
    probes = docs.filter(F.col("doc_id") < 10) \
        .select(F.col("doc_id").alias("probe_id"), "text")
    return contamination_check(docs, probes) \
        .filter(F.col("doc_id") != F.col("probe_id"))


def q_semantic_contam(spark, sf_dir):
    """Embedding-space decontamination (operators/dedup.py::
    semantic_contamination): training vectors whose nearest-benchmark
    cosine reaches 0.4 are flagged; every 20th vector stands in for
    the benchmark. Exact values via the grid BLAS + fold rescore, so
    the oracle recomputes max-cosine verbatim."""
    from csvplus_spark.operators.dedup import semantic_contamination

    emb = load_table(spark, sf_dir, "embeddings").df
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    train = emb.filter(F.col("vec_id") % 20 != 0)
    return semantic_contamination(train, bench, 0.4, n_blocks=4)


_SEMANTIC_CONTAM_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS nn
      FROM v),
bench AS (
  SELECT v.vec_id, e, nn FROM v JOIN n USING (vec_id)
  WHERE v.vec_id % 20 = 0 AND nn > 0
),
train AS (
  SELECT v.vec_id, e, nn FROM v JOIN n USING (vec_id)
  WHERE v.vec_id % 20 <> 0
),
sims AS (
  SELECT t.vec_id,
         MAX(list_sum(list_transform(range(1, len(t.e) + 1),
                      k -> t.e[k] * b.e[k])) / (t.nn * b.nn))
           AS max_bench_sim
  FROM train t CROSS JOIN bench b
  GROUP BY t.vec_id
)
SELECT t.vec_id, s.max_bench_sim,
       COALESCE(s.max_bench_sim >= 0.4, FALSE) AS contaminated
FROM train t LEFT JOIN sims s ON t.vec_id = s.vec_id
"""


_CONTAMINATION_SQL = """
WITH t AS (
  SELECT doc_id, unnest(ts) AS tok, unnest(generate_series(1, len(ts))) AS i
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents)
),
sh AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
           JOIN t c ON a.doc_id = c.doc_id AND c.i = a.i + 2
)
SELECT c.doc_id, p.doc_id AS probe_id, COUNT(*) AS n_shared
FROM sh c JOIN sh p ON c.s = p.s
WHERE p.doc_id < 10 AND c.doc_id <> p.doc_id
GROUP BY 1, 2
"""


def q_canonicalize(spark, sf_dir):
    """Near-dup cluster survivor selection: best-quality doc per
    cluster, ties to smallest id (operators/dedup.py)."""
    from csvplus_spark.operators.dedup import canonicalize_clusters

    return canonicalize_clusters(load_table(spark, sf_dir, "documents").df)


def _canonicalize_sql() -> str:
    return f"""
WITH clusters AS ({_CLUSTERS_SQL}),
q AS (SELECT doc_id, quality FROM ({_text_stats_sql()})),
lab AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id, q.quality
  FROM documents d
  LEFT JOIN clusters c ON d.doc_id = c.doc_id
  JOIN q ON d.doc_id = q.doc_id
)
SELECT doc_id, cluster_id,
       FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
                                 ORDER BY quality DESC, doc_id) AS canonical_id,
       doc_id = FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
                                          ORDER BY quality DESC, doc_id) AS keep
FROM lab
"""


def q_training_set(spark, sf_dir):
    """THE composition: quality filter → exact dedup → near-dup
    canonicalization → decontamination (probes = docs with id < 10) →
    deterministic split → graph-after-dedup PageRank centrality as a
    quality feature (r9: the pipeline now exercises the _reps scale
    shape end-to-end), as one lazy plan
    (operators/pipeline.py::build_training_set). Oracle recomputes the
    entire pipeline in SQL — every stage is hash-deterministic,
    including the integer-PageRank trajectory."""
    from csvplus_spark.operators.pipeline import build_training_set

    docs = load_table(spark, sf_dir, "documents").df
    probes = docs.filter(F.col("doc_id") < 10) \
        .select(F.col("doc_id").alias("probe_id"), "text")
    return build_training_set(docs, probes, exclude_self_ids=True,
                              with_centrality=True)


def _pg_chain_for_training() -> tuple[str, str]:
    """The training_set oracle's centrality chain: the shared
    _pagerank_chain_ctes over the survivors' shingles, pg-prefixed."""
    return _pagerank_chain_ctes("tsh", "pg")


def _training_set_sql(quality_min: float = 0.5, t: float = 0.6) -> str:
    return f"""
WITH RECURSIVE
qual AS (SELECT doc_id, quality FROM ({_text_stats_sql()})),
keepq AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN qual ON d.doc_id = qual.doc_id WHERE qual.quality >= {quality_min}
),
fp AS (SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
       FROM keepq),
excanon AS (SELECT f, MIN(doc_id) AS canon FROM fp GROUP BY 1),
ded AS (
  SELECT keepq.doc_id, keepq.text FROM keepq
  JOIN fp ON keepq.doc_id = fp.doc_id
  JOIN excanon ON fp.f = excanon.f AND fp.doc_id = excanon.canon
),
sh AS (SELECT doc_id, {_SHINGLES} AS sh
       FROM (SELECT doc_id, {_TOKS} AS t FROM ded)),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS i1, b.doc_id AS i2, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
),
npairs AS (
  SELECT i1, i2 FROM inter
  JOIN sh s1 ON i1 = s1.doc_id JOIN sh s2 ON i2 = s2.doc_id
  WHERE i * 1.0 / (len(s1.sh) + len(s2.sh) - i) >= {t}
),
edges AS (
  SELECT i1 AS a, i2 AS b FROM npairs
  UNION SELECT i2, i1 FROM npairs
),
reach(a, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.a
),
clusters AS (SELECT a AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY a),
lab AS (
  SELECT ded.doc_id, COALESCE(c.cluster_id, ded.doc_id) AS cluster_id,
         qual.quality
  FROM ded LEFT JOIN clusters c ON ded.doc_id = c.doc_id
  JOIN qual ON ded.doc_id = qual.doc_id
),
surv AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
                                     ORDER BY quality DESC, doc_id) AS canon
    FROM lab
  ) WHERE doc_id = canon
),
pex AS (
  SELECT p.doc_id AS probe_id, unnest({_SHINGLES}) AS s
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 10) p
),
cont AS (
  SELECT DISTINCT c.doc_id FROM ex c
  JOIN pex ON c.s = pex.s AND c.doc_id <> pex.probe_id
  JOIN surv ON c.doc_id = surv.doc_id
),
final AS (
  SELECT surv.doc_id FROM surv
  LEFT JOIN cont ON surv.doc_id = cont.doc_id
  WHERE cont.doc_id IS NULL
),
labeled AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN pb < 1000 THEN 'val'
              WHEN pb < 2000 THEN 'test'
              ELSE 'train' END AS split
  FROM (
    SELECT doc_id,
           {_HASH60_SQL.format(x="'split' || '|' || CAST(doc_id AS VARCHAR)")}
             % 10000 AS pb
    FROM final
  )
),
-- graph-after-dedup centrality (r9, the pagerank_reps shape):
-- integer PageRank over the MinHash near-dup graph of the POST-
-- EXACT-DEDUP docs (tsh = the pipeline's ded shingles — NOT the
-- survivors: canonicalization removes exactly the >=t pairs, so a
-- survivors-only graph is empty by construction), projected onto
-- the labeled survivors. Same chain as the pagerank oracle,
-- prefixed to avoid CTE collisions; tsh MATERIALIZED so the band-
-- table fanout can't inline (and re-run) the upstream joins ~32x
tsh AS MATERIALIZED (SELECT doc_id, sh FROM sh),
{_pg_chain_for_training()[0]}
SELECT l.doc_id, l.split,
       COALESCE(ROUND(p.q / {float(1 << 40)}, 6), 0.0) AS centrality
FROM labeled l
LEFT JOIN {_pg_chain_for_training()[1]} p ON l.doc_id = p.s
"""


def q_lang_cap(spark, sf_dir):
    """Quota sampling: at most 40 docs per language, deterministic by
    key hash (operators/sampling.py::cap_per_group)."""
    from csvplus_spark.operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents").df.select("doc_id", "lang")
    return cap_per_group(docs, "lang", "doc_id", 40)


def _repeated_spans_sql(k: int = 5, min_docs: int = 2) -> str:
    # DuckDB arrays are 1-based: Spark's 0-based token offset p maps
    # to i = p + 1; a k-token span starting at i needs i + k - 1 <= len
    span = " || ' ' || ".join(f"t[i+{j}]" for j in range(k)).replace("t[i+0]", "t[i]")
    return f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sp AS (
  SELECT doc_id, i - 1 AS pos, {span} AS span
  FROM tk, UNNEST(range(1, len(t) - {k} + 2)) AS u(i)
),
c AS (
  SELECT span, COUNT(DISTINCT doc_id) AS n_docs
  FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) >= {min_docs}
)
SELECT sp.doc_id, sp.pos, sp.span, c.n_docs
FROM sp JOIN c USING (span)
"""


def _remove_spans_sql(k: int = 5, min_docs: int = 2) -> str:
    span = " || ' ' || ".join(f"t[i+{j}]" for j in range(k)).replace("t[i+0]", "t[i]")
    return f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sp AS (
  SELECT doc_id, i - 1 AS pos, {span} AS span
  FROM tk, UNNEST(range(1, len(t) - {k} + 2)) AS u(i)
),
c AS (
  SELECT span FROM sp GROUP BY span
  HAVING COUNT(DISTINCT doc_id) >= {min_docs}
),
cover AS (
  SELECT DISTINCT sp.doc_id, sp.pos + j AS cpos
  FROM sp JOIN c USING (span), UNNEST(range(0, {k})) AS g(j)
),
tok AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM tk, UNNEST(range(1, len(t) + 1)) AS u(i)
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tok
  FROM tok LEFT JOIN cover
    ON tok.doc_id = cover.doc_id AND tok.pos = cover.cpos
  WHERE cover.cpos IS NULL
)
SELECT d.doc_id,
       COALESCE(r.cleaned_text, '') AS cleaned_text
FROM documents d
LEFT JOIN (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
  FROM kept GROUP BY doc_id
) r ON d.doc_id = r.doc_id
"""


_BM25_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
ad AS (SELECT COUNT(*) / CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS a FROM tok),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         ln((nd.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / ad.a)) AS score
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), nd, ad
)
SELECT doc_id, term, tf, df,
       ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY ROUND(score, 6) DESC, term) AS rank,
       ROUND(score, 6) AS score
FROM s
QUALIFY rank <= 3
"""


def _bigram_lm_sql(ndigits: int = 6) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) AS u(i)
),
big AS (
  SELECT a.doc_id, b.pos AS pos, a.term AS prev, b.term AS term
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bf AS (SELECT prev, term, COUNT(*) AS cb FROM big GROUP BY prev, term),
cf AS (SELECT prev, COUNT(*) AS cc FROM big GROUP BY prev),
uf AS (SELECT term, COUNT(*) AS cu FROM tok GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM tok),
per AS (
  SELECT big.doc_id,
         list(ln(0.75 * (bf.cb / cf.cc)
                 + 0.25 * (uf.cu / (SELECT t FROM tot)))
              ORDER BY pos) AS lps
  FROM big JOIN bf USING (prev, term)
           JOIN cf USING (prev)
           JOIN uf USING (term)
  GROUP BY big.doc_id
)
SELECT d.doc_id,
       COALESCE(len(p.lps), 0) AS n_bigrams,
       COALESCE(ROUND(list_reduce(p.lps, (x, y) -> x + y) / len(p.lps),
                      {ndigits}), 0.0) AS lp_mean
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""


def _unigram_lm_sql(ndigits: int = 6) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) AS u(i)
),
freq AS (SELECT term, COUNT(*) AS ct FROM tok GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM tok),
per AS (
  SELECT doc_id,
         list(ln(freq.ct / (SELECT t FROM tot)) ORDER BY pos) AS lps
  FROM tok JOIN freq USING (term)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(len(p.lps), 0) AS n_tokens,
       COALESCE(ROUND(list_reduce(p.lps, (x, y) -> x + y) / len(p.lps),
                      {ndigits}), 0.0) AS lp_mean
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""


def _kmeans_cte(k: int = 8, iters: int = 2) -> str:
    """Unrolled Lloyd-iteration CTE chain ending in ``a{iters}``
    (vec_id, cell) — shared by the kmeans and cluster_balance
    oracles. Mirrors operators/similarity.py::kmeans_assign exactly:
    lowest-id seeds, left-fold d², argmin tie-break on cell,
    floor(x·2^20) quantized centroid means."""
    d2 = lambda c: ("list_sum(list_transform(range(1, len(v.e)+1), "
                    f"j -> (v.e[j]-{c}.cv[j])*(v.e[j]-{c}.cv[j])))")
    parts = [f"""v AS (SELECT vec_id,
       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       FROM embeddings),
cent0 AS (SELECT vec_id AS cell, e AS cv FROM v ORDER BY vec_id LIMIT {k})"""]
    for i in range(iters + 1):
        if i > 0:
            parts.append(f"""s{i} AS (SELECT a{i-1}.cell AS cell, j AS dim,
         SUM(CAST(floor(v.e[j]*1048576.0) AS BIGINT)) AS s,
         COUNT(*) AS ct
  FROM a{i-1} JOIN v USING (vec_id),
       UNNEST(range(1, len(v.e)+1)) AS u(j)
  GROUP BY a{i-1}.cell, j),
cent{i} AS (SELECT cell, list(CAST(s AS DOUBLE)/ct/1048576.0 ORDER BY dim)
            AS cv FROM s{i} GROUP BY cell)""")
        parts.append(f"""ad{i} AS (SELECT v.vec_id, cent{i}.cell, {d2(f'cent{i}')} AS d2
  FROM v CROSS JOIN cent{i}),
a{i} AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
         FROM ad{i}) WHERE rn = 1)""")
    return "WITH " + ",\n".join(parts)


def _kmeans_sql(k: int = 8, iters: int = 2) -> str:
    return f"{_kmeans_cte(k, iters)}\nSELECT vec_id, cell FROM a{iters}"


def _cluster_balance_sql(k: int = 8, iters: int = 2, cap: int = 40) -> str:
    h = _HASH60_SQL.format(x="'cap' || '|' || CAST(a.vec_id AS VARCHAR)")
    return f"""{_kmeans_cte(k, iters)}
SELECT vec_id, cell, label FROM (
  SELECT a.vec_id, a.cell, e.label,
         ROW_NUMBER() OVER (PARTITION BY a.cell ORDER BY {h}, a.vec_id)
         AS rn
  FROM a{iters} a JOIN embeddings e ON a.vec_id = e.vec_id
) WHERE rn <= {cap}
"""


def _pq_topk_sql(m: int = 8, kc: int = 8, topk: int = 5,
                 n_probes: int = 20, ndigits: int = 6) -> str:
    """Unrolled PQ replay: seed codebooks from the kc lowest-id
    vectors' subvectors, ONE quantized-Lloyd round, encode, ADC.
    Mirrors operators/similarity.py::pq_codebooks/pq_encode/pq_topk
    (same left-fold d², floor(x·2^20) means, rounded-rank ADC)."""
    sub = 64 // m
    d2 = lambda c: ("list_sum(list_transform(range(1, len(s.sv)+1), "
                    f"j -> (s.sv[j]-{c}.centroid[j])"
                    f"*(s.sv[j]-{c}.centroid[j])))")
    assign = lambda cb: f"""(
  SELECT vec_id, sub, cell FROM (
    SELECT s.vec_id, s.sub, {cb}.cell,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY {d2(cb)}, {cb}.cell) AS rn
    FROM subs s JOIN {cb} ON s.sub = {cb}.sub) WHERE rn = 1)"""
    return f"""
WITH v AS (SELECT vec_id,
       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       FROM embeddings),
subs AS (SELECT vec_id, s AS sub, e[(s*{sub}+1):((s+1)*{sub})] AS sv
         FROM v, UNNEST(range(0, {m})) AS u(s)),
ranks AS (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                              AS INT) AS cell
          FROM (SELECT vec_id FROM v ORDER BY vec_id LIMIT {kc})),
cb0 AS (SELECT s.sub, r.cell, s.sv AS centroid
        FROM subs s JOIN ranks r ON s.vec_id = r.vec_id),
a1 AS {assign('cb0')},
s1 AS (SELECT a1.sub AS sub, a1.cell AS cell, j AS dim,
       SUM(CAST(floor(s.sv[j]*1048576.0) AS BIGINT)) AS sm,
       COUNT(*) AS ct
       FROM a1 JOIN subs s ON a1.vec_id = s.vec_id AND a1.sub = s.sub,
            UNNEST(range(1, len(s.sv)+1)) AS u(j)
       GROUP BY a1.sub, a1.cell, j),
cb1 AS (SELECT sub, cell,
        list(CAST(sm AS DOUBLE)/ct/1048576.0 ORDER BY dim) AS centroid
        FROM s1 GROUP BY sub, cell),
codes AS (SELECT vec_id, sub, cell AS code FROM {assign('cb1')} t),
dtab AS (SELECT s.vec_id AS query_id, s.sub, cb1.cell, {d2('cb1')} AS dd
         FROM subs s JOIN cb1 ON s.sub = cb1.sub
         WHERE s.vec_id < {n_probes}),
scored AS (SELECT d.query_id, co.vec_id AS corpus_id,
           ROUND(list_reduce(list(d.dd ORDER BY d.sub),
                             (x, y) -> x + y), {ndigits}) AS ad2
           FROM codes co
           JOIN dtab d ON co.sub = d.sub AND co.code = d.cell
           GROUP BY d.query_id, co.vec_id)
SELECT query_id, corpus_id, rank, ad2 FROM (
  SELECT query_id, corpus_id, ad2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ad2, corpus_id) AS rank
  FROM scored) WHERE rank <= {topk}
"""


def _weighted_sample_sql(n: int = 100) -> str:
    h = _HASH60_SQL.format(
        x="'wsample' || '|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH s AS (
  SELECT doc_id, lang, n_chars,
         COALESCE(CAST(n_chars AS BIGINT), 0) AS w, {h} AS h
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_chars, w,
         COALESCE(SUM(w) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cum,
         SUM(w) OVER () AS t
  FROM s
)
SELECT doc_id, lang, n_chars FROM c
WHERE (CAST(cum + w AS HUGEINT) * {n}) // CAST(t AS HUGEINT)
    > (CAST(cum AS HUGEINT) * {n}) // CAST(t AS HUGEINT)
"""


_FUNNEL_SQL = """
WITH ev AS (SELECT user_id, event_type AS t, epoch_us(ts) AS us
            FROM events),
s1 AS (SELECT user_id, MIN(us) AS t1_us FROM ev WHERE t = 'view'
       GROUP BY user_id),
s2 AS (SELECT s1.user_id, s1.t1_us, MIN(e.us) AS t2_us
       FROM s1 LEFT JOIN ev e ON e.user_id = s1.user_id
         AND e.t = 'click' AND e.us >= s1.t1_us
         AND e.us <= s1.t1_us + 86400000000
       GROUP BY s1.user_id, s1.t1_us),
s3 AS (SELECT s2.user_id, s2.t1_us, s2.t2_us, MIN(e.us) AS t3_us
       FROM s2 LEFT JOIN ev e ON e.user_id = s2.user_id
         AND e.t = 'purchase' AND e.us >= s2.t2_us
         AND e.us <= s2.t2_us + 86400000000
       GROUP BY s2.user_id, s2.t1_us, s2.t2_us)
SELECT user_id, t1_us, t2_us, t3_us, t3_us IS NOT NULL AS completed
FROM s3
"""

_RETENTION_SQL = """
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
-- FLOOR period division via the posmod trick: DuckDB's integer //
-- TRUNCATES toward zero (r8 review: SELECT -1 // p = 0, not -1), so
-- pre-epoch timestamps need the same exact-integer floor the Spark
-- side computes
c AS (SELECT user_id,
             (MIN(us) - ((MIN(us) % 604800000000 + 604800000000)
                          % 604800000000)) // 604800000000
               AS cohort_period
      FROM ev GROUP BY user_id)
SELECT c.cohort_period,
       (e.us - ((e.us % 604800000000 + 604800000000) % 604800000000))
         // 604800000000 - c.cohort_period AS period_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM ev e JOIN c ON e.user_id = c.user_id
GROUP BY 1, 2
"""

_MULTIMODAL_MP4_SQL = """
SELECT doc_id AS media_id, 600 AS timescale,
       ((doc_id % 1000) + 1) * 25 AS duration_units,
       (((doc_id % 1000) + 1) * 25) * 1000000 // 600 AS duration_us
FROM documents
"""

_MULTIMODAL_WAV_SQL = """
WITH s AS (
  SELECT doc_id, i,
         ((doc_id * 31 + i * 17) % 65536) - 32768 AS smp
  FROM (SELECT doc_id, (doc_id % 50) + 10 AS n FROM documents),
       UNNEST(range(0, n)) AS u(i)
),
agg AS (
  SELECT doc_id, COUNT(*) AS n, MAX(abs(smp)) AS peak,
         SUM(smp * smp) AS ss
  FROM s GROUP BY doc_id
)
SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS channels,
       n AS n_frames, n * 1000000 // 8000 AS duration_us, peak,
       ROUND(sqrt(CAST(ss AS DOUBLE) / n) / 32768.0, 6) AS rms
FROM agg
"""


def _embedding_drift_sql(ndigits: int = 6) -> str:
    agg = """
  SELECT i - 1 AS dim,
         SUM(CAST(floor(CAST(e[i] AS DOUBLE) * 1048576.0) AS BIGINT)) AS s,
         SUM(CAST(floor(CAST(e[i] AS DOUBLE) * 1048576.0) AS BIGINT)
             * CAST(floor(CAST(e[i] AS DOUBLE) * 1048576.0) AS BIGINT)) AS ss,
         COUNT(*) AS n
  FROM (SELECT embedding AS e FROM embeddings WHERE vec_id % 2 = {par}),
       UNNEST(range(1, len(e) + 1)) AS u(i)
  GROUP BY i"""
    mean = "(CAST({t}.s AS DOUBLE) / {t}.n / 1048576.0)"
    var = ("((CAST({t}.ss AS DOUBLE) / {t}.n"
           " - (CAST({t}.s AS DOUBLE) / {t}.n)"
           " * (CAST({t}.s AS DOUBLE) / {t}.n))"
           " / 1048576.0 / 1048576.0)")
    ml, mr = mean.format(t="l"), mean.format(t="r")
    vl, vr = var.format(t="l"), var.format(t="r")
    pooled = f"sqrt(({vl} + {vr}) / 2.0)"
    return f"""
WITH l AS ({agg.format(par=0)}),
r AS ({agg.format(par=1)})
SELECT l.dim AS dim,
       ROUND({ml}, {ndigits}) AS mean_l,
       ROUND({mr}, {ndigits}) AS mean_r,
       ROUND({vl}, {ndigits}) AS var_l,
       ROUND({vr}, {ndigits}) AS var_r,
       ROUND(CASE WHEN {pooled} > 0
                  THEN abs({ml} - {mr}) / {pooled} ELSE 0.0 END,
             {ndigits}) AS shift
FROM l JOIN r ON l.dim = r.dim
ORDER BY l.dim
"""


def _bm25_search_sql(k: int = 10, k1: float = 1.2, b: float = 0.75,
                     ndigits: int = 6) -> str:
    terms = "'join', 'shuffle', 'spark'"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(t) AS term
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
avgdl AS (SELECT SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS a FROM dl),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       WHERE term IN ({terms}) GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
per AS (
  SELECT tf.doc_id, tf.term,
         ln(((SELECT n FROM nd) - df + 0.5) / (df + 0.5) + 1.0)
         * tf * ({k1} + 1.0)
         / (tf + {k1} * (1.0 - {b} + {b} * dl
                         / (SELECT a FROM avgdl))) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
),
sc AS (
  SELECT doc_id, COUNT(*) AS n_terms,
         ROUND(list_reduce(list(s ORDER BY term), (x, y) -> x + y),
               {ndigits}) AS score
  FROM per GROUP BY doc_id
)
SELECT doc_id, n_terms, score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}
"""


def _linear_scorer_sql(n_buckets: int = 1024, l2: float = 1.0,
                       ndigits: int = 6) -> str:
    h = _HASH60_SQL.format(x="term")
    return f"""
WITH tok AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         unnest(t) AS term
  FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
),
fb AS (SELECT doc_id, y, {h} % {n_buckets} AS b FROM tok),
xb AS (SELECT doc_id, y, b, COUNT(*) AS x FROM fb
       GROUP BY doc_id, y, b),
st AS (SELECT b, SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM xb
       GROUP BY b),
m AS (SELECT b, CAST(sxy AS DOUBLE) / (sxx + {l2}) AS w FROM st),
per AS (
  SELECT doc_id, list(x * w ORDER BY b) AS ts, SUM(x) AS n_tokens
  FROM xb JOIN m USING (b) GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       COALESCE(ROUND(list_reduce(p.ts, (a, c) -> a + c), {ndigits}),
                0.0) AS lin_score
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""


def _dsir_sql(n_buckets: int = 10_000, ndigits: int = 6) -> str:
    h = _HASH60_SQL.format(x="feat")
    return f"""
WITH tok AS (
  SELECT doc_id, (lang = 'en') AS tgt, i - 1 AS pos, t[i] AS term
  FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) AS u(i)
),
big AS (
  SELECT doc_id, tgt, pos, 1 AS kind, prev || ' ' || term AS feat
  FROM (SELECT doc_id, tgt, pos, term,
               lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM tok)
  WHERE prev IS NOT NULL
),
feats AS (
  SELECT doc_id, tgt, pos, 0 AS kind, term AS feat FROM tok
  UNION ALL SELECT doc_id, tgt, pos, kind, feat FROM big
),
fb AS (SELECT *, {h} % {n_buckets} AS b FROM feats),
ct_r AS (SELECT b, COUNT(*) AS cr FROM fb GROUP BY b),
ct_t AS (SELECT b, COUNT(*) AS ct FROM fb WHERE tgt GROUP BY b),
rt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS r FROM fb),
tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM fb WHERE tgt),
model AS (
  SELECT ct_r.b AS b,
         ln(COALESCE(ct, 0) + 1.0) - ln(cr + 1.0)
         + ln((SELECT r FROM rt) + {float(n_buckets)})
         - ln((SELECT t FROM tt) + {float(n_buckets)}) AS lnr
  FROM ct_r LEFT JOIN ct_t ON ct_r.b = ct_t.b
),
per AS (
  SELECT doc_id, list(lnr ORDER BY pos, kind) AS ls
  FROM fb JOIN model USING (b) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(len(p.ls), 0) AS n_feats,
       COALESCE(ROUND(list_reduce(p.ls, (x, y) -> x + y), {ndigits}),
                0.0) AS dsir_logw
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""


def _global_shuffle_sql() -> str:
    h = _HASH60_SQL.format(x="'shuffle' || '|' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, lang,
       ROW_NUMBER() OVER (ORDER BY {h}, doc_id) - 1 AS pos
FROM documents
"""


def _quality_topfrac_sql(fraction: float = 0.25) -> str:
    return f"""
WITH q AS (SELECT doc_id, quality FROM ({_text_stats_sql()})),
d AS (
  SELECT doc.doc_id AS doc_id, doc.lang AS lang, q.quality AS quality,
         {_HASH60_SQL.format(x="'topfrac' || '|' || CAST(doc.doc_id AS VARCHAR)")} AS h
  FROM documents doc JOIN q ON doc.doc_id = q.doc_id
),
r AS (
  SELECT doc_id, lang, quality,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY quality DESC NULLS LAST, h, doc_id) AS rn,
         CEIL({fraction} * COUNT(*) OVER (PARTITION BY lang)) AS keep
  FROM d
)
SELECT doc_id, lang, quality FROM r WHERE rn <= keep
"""


def _lang_cap_sql(cap: int = 40) -> str:
    # function (not module constant): _HASH60_SQL is defined further
    # down; oracle_sql() evaluates this at call time
    h = _HASH60_SQL.format(x="'cap' || '|' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rn
  FROM documents
) WHERE rn <= {cap}
"""


def q_repetition(spark, sf_dir):
    """Intra-doc repetition signals: 5-gram duplicate fraction + top
    gram share (operators/text.py::repetition_stats)."""
    from csvplus_spark.operators.text import repetition_stats

    return repetition_stats(load_table(spark, sf_dir, "documents").df, 5)


_REPETITION_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(ts) AS t,
         unnest(generate_series(1, len(ts))) AS i
  FROM (SELECT doc_id, {toks} AS ts FROM documents)
),
g AS (
  SELECT a.doc_id,
         a.t || ' ' || b.t || ' ' || c.t || ' ' || d.t || ' ' || e.t AS gram
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
  JOIN tok d ON a.doc_id = d.doc_id AND d.i = a.i + 3
  JOIN tok e ON a.doc_id = e.doc_id AND e.i = a.i + 4
),
pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
agg AS (
  SELECT doc_id, SUM(c) AS n_ngrams, COUNT(*) AS n_distinct, MAX(c) AS top
  FROM pg GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       COALESCE(a.n_distinct, 0) AS n_distinct,
       CASE WHEN COALESCE(a.n_ngrams, 0) > 0
            THEN 1.0 - a.n_distinct * 1.0 / a.n_ngrams ELSE 0.0 END AS dup_frac,
       CASE WHEN COALESCE(a.n_ngrams, 0) > 0
            THEN a.top * 1.0 / a.n_ngrams ELSE 0.0 END AS top_gram_frac
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
""".format(toks="regexp_extract_all(lower(text), '[a-z0-9]+')")


def q_content_flags(spark, sf_dir):
    """PII/boilerplate triage counts per doc
    (operators/text.py::content_flags)."""
    from csvplus_spark.operators.text import content_flags

    return content_flags(load_table(spark, sf_dir, "documents").df)


def q_token_budget_mix(spark, sf_dir):
    """Data-mixture curation: per-source token budgets filled by a
    deterministic hash-ordered doc prefix
    (operators/sampling.py::token_budget_mix). Weight = n_chars (the
    documents table's precomputed size column)."""
    from csvplus_spark.operators.sampling import token_budget_mix

    docs = load_table(spark, sf_dir, "documents").df
    return token_budget_mix(
        docs, {"web": 20_000, "books": 10_000}, group_col="source",
        weight_col="n_chars", default_budget=5_000,
    ).select("doc_id", "source", "n_chars")


def q_rarity(spark, sf_dir):
    """Corpus-trained mean inverse token frequency quality signal,
    integer-exact across engines (operators/text.py::rarity_score)."""
    from csvplus_spark.operators.text import rarity_score

    return rarity_score(load_table(spark, sf_dir, "documents").df)


_TOKEN_BUDGET_MIX_SQL = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substring(
                       md5('mix' || '|' || CAST(doc_id AS VARCHAR)),
                       1, 15)) AS BIGINT), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM documents
)
SELECT doc_id, source, n_chars
FROM ranked
WHERE run <= CASE source WHEN 'web' THEN 20000
                         WHEN 'books' THEN 10000
                         ELSE 5000 END
"""


_RARITY_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
freq AS (SELECT term, COUNT(*) AS ct FROM tok GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM tok),
per AS (
  SELECT doc_id,
         SUM(CAST(floor(t / ct) AS BIGINT)) AS s,
         COUNT(*) AS n_tokens
  FROM tok JOIN freq USING (term) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(CAST(p.s AS DOUBLE) / p.n_tokens, 0.0) AS rarity
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""


def q_profile(spark, sf_dir):
    """One-pass per-column profile of orders: rows / nulls / exact
    distincts (operators/profile.py::profile_columns)."""
    from csvplus_spark.operators.profile import profile_columns

    return profile_columns(load_table(spark, sf_dir, "orders").df)


def _profile_sql() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    parts = [
        f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
        f"COUNT(*) - COUNT({c}) AS n_nulls, "
        f"COUNT(DISTINCT {c}) AS n_distinct FROM orders"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def q_pii_scrub(spark, sf_dir):
    """Typed PII redaction (emails/URLs/IPs/phones → placeholder
    tokens), zero-shuffle chained regexp_replace
    (operators/text.py::pii_scrub)."""
    from csvplus_spark.operators.text import pii_scrub

    return pii_scrub(load_table(spark, sf_dir, "documents").df)


def q_boilerplate(spark, sf_dir):
    """Cross-doc boilerplate line removal: strip exact lines shared by
    ≥3 distinct docs, preserve remaining line order
    (operators/text.py::remove_boilerplate)."""
    from csvplus_spark.operators.text import remove_boilerplate

    return remove_boilerplate(load_table(spark, sf_dir, "documents").df,
                              min_docs=3)


_PII_SCRUB_SQL = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
           'https?://[^\s]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
           '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
           'https?://[^\s]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
           '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') <> text AS changed
FROM documents
"""


_BOILERPLATE_SQL = """
WITH lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM documents
),
hot AS (
  SELECT line FROM lines WHERE trim(line) <> ''
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 3
),
clean AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM lines WHERE line NOT IN (SELECT line FROM hot)
  GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(c.clean_text, '') AS clean_text
FROM documents d LEFT JOIN clean c ON d.doc_id = c.doc_id
"""


_CONTENT_FLAGS_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(lower(text),
           '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
       len(regexp_extract_all(lower(text), 'https?://[^\s]+')) AS n_urls,
       len(regexp_extract_all(lower(text),
           '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS n_phoneish,
       CASE WHEN length(lower(text)) > 0
            THEN len(regexp_extract_all(lower(text), '[{}\[\]<>;`]')) * 1.0
                 / length(lower(text))
            ELSE 0.0 END AS code_density
FROM documents
"""


_TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_ws,
       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
       len(regexp_extract_all(lower(text),
           '''(?:s|d|m|t|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+|\s+')) AS n_bpe
FROM documents
"""


def _simhash_pairs_sql(n_bits: int = 32, max_hamming: int = 3) -> str:
    # all-pairs in the oracle (DuckDB, sf0.01) vs chunk-blocked in Spark
    # — identical output proves the blocking loses no pair
    return f"""
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM ({_simhash_sql(n_bits)}) a JOIN ({_simhash_sql(n_bits)}) b
  ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def _simhash_reps_sql(n_bits: int = 60, max_hamming: int = 3) -> str:
    # same recursive-CTE CC oracle shape as _CLUSTERS_SQL, over the
    # all-pairs simhash graph; singletons fall out of the LEFT JOIN
    return f"""
WITH RECURSIVE sh AS ({_simhash_sql(n_bits)}),
npairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
),
edges AS (
  SELECT d1 AS a, d2 AS b FROM npairs
  UNION
  SELECT d2, d1 FROM npairs
),
reach(a, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.a
),
clusters AS (SELECT a AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY a)
SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS rep_id
FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
"""


def q_multimodal_png(spark, sf_dir):
    """REAL image decode end-to-end (VERDICT r6 item 4): deterministic
    greyscale PNGs are encoded per doc_id and decoded back through the
    real_codec mapInPandas path — in this container that exercises the
    pure-Python struct+zlib codec (operators/pngcodec.py); with Pillow
    installed, the same plan decodes through it instead. The oracle
    replays the geometry arithmetic (decode∘encode = identity);
    pixel-level exactness is pinned by the pngcodec roundtrip tests."""
    from csvplus_spark.operators.multimodal import decode_images

    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def make(batches):
        import pandas as pd

        from csvplus_spark.operators.pngcodec import encode_png

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                w = int(did) % 16 + 1
                h = (int(did) // 16) % 16 + 1
                px = bytes(((int(did) + x + y) % 256)
                           for y in range(h) for x in range(w))
                blobs.append(encode_png(w, h, 1, px))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": blobs})

    blobs = docs.mapInPandas(make, "media_id long, data binary")
    return decode_images(blobs, real_codec=True)


_MULTIMODAL_PNG_SQL = """
SELECT doc_id AS media_id,
       CAST(doc_id % 16 + 1 AS INT) AS width,
       CAST((doc_id // 16) % 16 + 1 AS INT) AS height,
       CAST((doc_id % 16 + 1) * ((doc_id // 16) % 16 + 1) AS INT) AS n_pixels,
       CAST(1 AS INT) AS orientation
FROM documents
"""


def q_multimodal_jpeg(spark, sf_dir):
    """MIXED-FORMAT real image decode (r7 verdict item 5): even doc_ids
    become deterministic PNGs (full struct+zlib decode path), odd ones
    structurally valid JPEGs (SOF-marker walk, operators/jpegcodec.py —
    baseline and progressive frames alternating, most carrying an APP1
    EXIF orientation tag the decode surfaces as an `orientation`
    column; doc_id%9==0 omits the EXIF block and must default to 1),
    all flowing through ONE decode_images(real_codec=True) plan — the
    format dispatch the 100 TB binary-column case actually needs. The
    oracle replays the geometry + orientation arithmetic per format."""
    from csvplus_spark.operators.multimodal import decode_images

    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def make(batches):
        import pandas as pd

        from csvplus_spark.operators.jpegcodec import encode_minimal_jpeg
        from csvplus_spark.operators.pngcodec import encode_png

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    w = did % 16 + 1
                    h = (did // 16) % 16 + 1
                    px = bytes(((did + x + y) % 256)
                               for y in range(h) for x in range(w))
                    blobs.append(encode_png(w, h, 1, px))
                else:
                    o = did % 9  # 0 → no EXIF block (orientation
                    blobs.append(encode_minimal_jpeg(  # defaults to 1)
                        did % 640 + 1, (did // 3) % 480 + 1,
                        n_components=did % 3 + 1,
                        progressive=(did % 5 == 0),
                        orientation=o if o else None))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": blobs})

    blobs = docs.mapInPandas(make, "media_id long, data binary")
    return decode_images(blobs, real_codec=True)


_MULTIMODAL_JPEG_SQL = """
SELECT doc_id AS media_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 16 + 1
            ELSE doc_id % 640 + 1 END AS INT) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id // 16) % 16 + 1
            ELSE (doc_id // 3) % 480 + 1 END AS INT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN (doc_id % 16 + 1) * ((doc_id // 16) % 16 + 1)
            ELSE (doc_id % 640 + 1) * ((doc_id // 3) % 480 + 1)
            END AS INT) AS n_pixels,
       CAST(CASE WHEN doc_id % 2 = 0 OR doc_id % 9 = 0 THEN 1
            ELSE doc_id % 9 END AS INT) AS orientation
FROM documents
"""


def q_dup_factor(spark, sf_dir):
    """The r9 raw-graph pre-flight probe as an oracle-gated query
    (operators/graph.py::duplication_factor): corpus rows over
    distinct normalized fingerprints — the one-aggregate answer to
    'is the raw near-dup pair graph safe to build'. Returned as the
    exact integer pair (n_docs, n_distinct) plus the rounded factor
    the guard thresholds on."""
    from csvplus_spark.operators.dedup import fingerprint

    docs = load_table(spark, sf_dir, "documents").df
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fingerprint("text")).alias("n_distinct"),
        F.round(F.count(F.lit(1))
                / F.countDistinct(fingerprint("text")), 6)
        .alias("factor"))


_DUP_FACTOR_SQL = r"""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ',
                                         'g'))) AS n_distinct,
       ROUND(COUNT(*) * 1.0 /
             COUNT(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+',
                                               ' ', 'g'))), 6) AS factor
FROM documents
"""


def _gate_fixture_dir(spark, name: str) -> str:
    """Deterministic fixture directory for file-writing gate queries:
    under the warehouse dir when it is file-scheme (shared on a real
    cluster whenever the warehouse is), else a local-mode-only temp
    dir (r10 review: this block was copy-pasted in both Avro gates)."""
    import os
    import tempfile

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        base = wh[len("file:"):]
        while base.startswith("//"):
            base = base[1:]
        d = os.path.join(base, name)
        os.makedirs(d, exist_ok=True)
        return d
    return tempfile.mkdtemp(prefix=name + "_")


def q_avro_ingest(spark, sf_dir):
    """Jar-less Avro ingestion through the oracle gate (r9 task 6):
    the 200 lowest-doc_id documents are encoded into TWO sharded Avro
    Object Container Files by the pure-Python encoder (one deflate,
    one null-codec — sources/avrocodec.py), read back through
    from_avro's binaryFile fallback (spark-avro is absent in this
    container), and aggregated per source. The oracle recomputes the
    same aggregate straight from the parquet view, so a decode error
    anywhere in the varint/union/block path breaks the hash.

    Fixture placement (r9 ADVICE): the shards go under the session's
    warehouse dir when it is file-scheme — a deterministic, reused
    subdirectory, so repeated invocations overwrite rather than leak
    one temp dir each. On a multi-node cluster the warehouse is shared
    storage executors can read; a driver-written local fixture is only
    reachable when the warehouse is (as here) a local path, which is
    the local-mode assumption this GATE query makes — the production
    path is `from_avro(spark, <existing distributed dir>)` and has no
    driver-side write at all."""
    import os
    import tempfile

    from csvplus_spark.sources.avrocodec import encode_container
    from csvplus_spark.sources.jsonl import from_avro

    docs = load_table(spark, sf_dir, "documents").df
    rows = [r.asDict() for r in docs.select("doc_id", "text", "source")
            .orderBy("doc_id").limit(200).collect()]  # bounded fixture
    schema = {"type": "record", "name": "doc", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "source", "type": ["null", "string"]}]}
    d = _gate_fixture_dir(spark, "_cp_avro_gate")
    with open(os.path.join(d, "part-0.avro"), "wb") as fh:
        fh.write(encode_container(schema, rows[:100], codec="deflate"))
    with open(os.path.join(d, "part-1.avro"), "wb") as fh:
        fh.write(encode_container(schema, rows[100:], codec="null"))
    f = from_avro(spark, d)
    return (f.df.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").alias("sum_id"),
                 F.sum(F.length("text")).alias("sum_chars")))


_AVRO_INGEST_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_id,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 200)
GROUP BY source
"""


def q_avro_snappy_ingest(spark, sf_dir):
    """Snappy-coded Avro OCF ingestion through the oracle gate (r10:
    the snappy block codec is now built in, sources/avrocodec.py::
    _snappy_compress/_snappy_uncompress + CRC32 verification): docs
    200-399 (by doc_id) are encoded into TWO snappy OCF shards by the
    pure-Python encoder, read back through from_avro's binaryFile
    fallback, and aggregated per source. Same placement contract as
    q_avro_ingest (warehouse dir, deterministic, reused)."""
    import os
    import tempfile

    from csvplus_spark.sources.avrocodec import encode_container
    from csvplus_spark.sources.jsonl import from_avro

    docs = load_table(spark, sf_dir, "documents").df
    rows = [r.asDict() for r in docs.select("doc_id", "text", "source")
            .orderBy("doc_id").limit(400).collect()][200:]
    schema = {"type": "record", "name": "doc", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "source", "type": ["null", "string"]}]}
    d = _gate_fixture_dir(spark, "_cp_avro_snappy_gate")
    with open(os.path.join(d, "part-0.avro"), "wb") as fh:
        fh.write(encode_container(schema, rows[:100], codec="snappy"))
    with open(os.path.join(d, "part-1.avro"), "wb") as fh:
        fh.write(encode_container(schema, rows[100:], codec="snappy"))
    f = from_avro(spark, d)
    return (f.df.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").alias("sum_id"),
                 F.sum(F.length("text")).alias("sum_chars")))


_AVRO_SNAPPY_INGEST_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_id,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 200 OFFSET 200)
GROUP BY source
"""


def _jpeg_px_fixture(k: int) -> bytes:
    """Deterministic JPEG fixture #k: k<16 baseline (gray/RGB,
    4:4:4/4:2:0, restart intervals, non-multiple-of-8 geometry);
    k=16..23 PROGRESSIVE (r10: SOF2 spectral selection + successive
    approximation, optimized per-scan huffman tables, one restart
    variant); k=24..31 ARITHMETIC (r10: SOF9 QM-coded, DAC
    conditioning incl. non-default L/U/Kx, restart variant);
    k=32..35 12-BIT extended sequential (r10: SOF1 precision 12,
    16-bit DQT, optimized huffman); k=36..39 PROGRESSIVE ARITHMETIC
    (r10: SOF10, Annex G.2 scans over the QM coder, restart variant);
    k=40..43 LOSSLESS (r10: SOF3 Annex H predictors, exact-roundtrip
    at P=8, one 16-bit + one restart variant) — REAL scan data,
    encoded by the pure-Python encoders."""
    from csvplus_spark.operators.jpegarith import encode_arith_jpeg
    from csvplus_spark.operators.jpegcodec import (
        _PROG_SCRIPT_SPECTRAL, _PROG_SCRIPT_SPECTRAL_GRAY,
        encode_baseline_jpeg, encode_extended12_jpeg,
        encode_lossless_jpeg, encode_progressive_jpeg)

    w = 8 * (k % 3 + 1) + (k % 5)      # 8..26, often not /8
    h = 8 * ((k // 3) % 3 + 1) + (k % 3)
    ch = 1 if k % 2 else 3
    px = bytes(((k * 13 + x * 7 + y * 5 + c * 11) % 256)
               for y in range(h) for x in range(w) for c in range(ch))
    if k < 16:
        return encode_baseline_jpeg(
            w, h, ch, px, quality=90,
            restart_interval=2 if k % 5 == 0 else 0,
            subsampling="420" if k % 4 == 0 else "444")
    if k >= 40:
        pred = (k - 39) * 2 - 1  # predictors 1,3,5,7
        if k == 42:  # 16-bit precision variant
            s16 = [(k * 131 + i * 37) % 65536 for i in range(w * h * ch)]
            return encode_lossless_jpeg(w, h, ch, s16, precision=16,
                                        predictor=pred)
        return encode_lossless_jpeg(
            w, h, ch, list(px), predictor=pred,
            restart_interval=2 * w if k == 41 else 0)
    if k >= 36:
        from csvplus_spark.operators.jpegarith import \
            encode_arith_progressive_jpeg
        return encode_arith_progressive_jpeg(
            w, h, ch, px, quality=90,
            subsampling="420" if k == 36 else "444",
            restart_interval=3 if k == 38 else 0,
            dc_L=1 if k == 39 else 0, dc_U=3 if k == 39 else 1,
            ac_Kx=10 if k == 39 else 5)
    if k >= 32:
        s12 = [(k * 13 + i * 7) % 4096 for i in range(w * h * ch)]
        return encode_extended12_jpeg(
            w, h, ch, s12, quality=90,
            subsampling="420" if k == 34 else "444",
            restart_interval=2 if k == 33 else 0)
    if k >= 24:
        sub = {0: "420", 2: "422"}.get(k % 4, "444")
        L, U, kx = {28: (1, 3, 10), 30: (0, 2, 63)}.get(k, (0, 1, 5))
        return encode_arith_jpeg(
            w, h, ch, px, quality=90, subsampling=sub,
            restart_interval=3 if k == 26 else 0,
            dc_L=L, dc_U=U, ac_Kx=kx)
    script = None  # successive-approximation recipe
    if k % 3 == 2:  # spectral-selection-only variants
        script = _PROG_SCRIPT_SPECTRAL if ch == 3 \
            else _PROG_SCRIPT_SPECTRAL_GRAY
    sub = {0: "420", 2: "422"}.get(k % 4, "444")  # r10: 4:2:2 too
    return encode_progressive_jpeg(
        w, h, ch, px, quality=90, script=script,
        restart_interval=3 if k == 20 else 0, subsampling=sub)


def _jpeg_px_stats(k: int) -> tuple[int, int, int, int, int]:
    """(width, height, channels, sum_px, max_px) of the DECODED
    fixture #k — the pinned expectation both sides share."""
    from csvplus_spark.operators.jpegcodec import decode_jpeg

    w, h, c, px = decode_jpeg(_jpeg_px_fixture(k))
    return w, h, c, sum(px), max(px)


def _jpeg_resize_stats(k: int) -> tuple[int, int, int, int, int]:
    """(width, height, channels, sum_px, max_px) of fixture #k pushed
    through the EXACT resize_stub JPEG path (decode → orient →
    nearest-resample to 10x7 → re-encode baseline → decode) — the
    pinned expectation both sides share. Deterministic end to end."""
    from csvplus_spark.operators.jpegcodec import (
        apply_orientation, decode_jpeg, encode_baseline_jpeg,
        jpeg_orientation)
    from csvplus_spark.operators.pngcodec import resize_nearest

    blob = _jpeg_px_fixture(k)
    w0, h0, ch, px = decode_jpeg(blob)
    w0, h0, px = apply_orientation(w0, h0, ch, px, jpeg_orientation(blob))
    out = encode_baseline_jpeg(
        10, 7, ch, resize_nearest(w0, h0, ch, px, 10, 7))
    w, h, c, rpx = decode_jpeg(out)
    return w, h, c, sum(rpx), max(rpx)


def q_multimodal_resize_px(spark, sf_dir):
    """The full real_codec RESIZE path through the oracle gate (r10):
    decode (baseline, progressive OR arithmetic) → EXIF orient →
    nearest-neighbor resample → baseline re-encode → decode, executed
    EXECUTOR-SIDE per fixture; the oracle pins the identical
    driver-side computation as literals (the jpeg_px pattern). Any
    divergence in resampling, orientation, or any codec direction
    breaks the hash."""
    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def rz(batches):
        import pandas as pd

        cache: dict[int, tuple] = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                k = int(did) % 44
                if k not in cache:
                    cache[k] = _jpeg_resize_stats(k)
                rows.append((int(did),) + cache[k])
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels",
                "sum_px", "max_px"])

    return docs.mapInPandas(
        rz, "media_id long, width int, height int, channels int, "
            "sum_px long, max_px int")


def _multimodal_resize_px_sql() -> str:
    pins = ",\n  ".join(
        f"({k}, {w}, {h}, {c}, CAST({s} AS BIGINT), {m})"
        for k, (w, h, c, s, m) in ((k, _jpeg_resize_stats(k))
                                   for k in range(44)))
    return f"""
SELECT d.doc_id AS media_id, p.width, p.height, p.channels,
       p.sum_px, p.max_px
FROM documents d
JOIN (VALUES
  {pins}) p(k, width, height, channels, sum_px, max_px)
  ON d.doc_id % 44 = p.k
"""


def _png_px_fixture(k: int) -> bytes:
    """Deterministic exotic-format PNG fixture #k (r10 gate closure):
    palette at every legal depth (1/2/4/8, PLTE + tRNS alpha), 16-bit
    grey/RGB, sub-byte grey, tRNS color keys on grey/RGB, and Adam7
    interlace (alone and combined with palette+tRNS) — REAL streams
    from the fixture-grade general encoder (pngcodec.encode_png_ex),
    which the spec-complete decoder must invert exactly."""
    import struct as _s

    from csvplus_spark.operators.pngcodec import encode_png, encode_png_ex

    w = 5 + (k * 3) % 13
    h = 4 + (k * 5) % 11

    def grey(mx=255):
        return [(k * 17 + x * 7 + y * 5) % (mx + 1)
                for y in range(h) for x in range(w)]

    def multi(ch, mx=255):
        return [(k * 17 + i * 7 + c * 29) % (mx + 1)
                for i in range(w * h) for c in range(ch)]

    pal = bytes(((k * 31 + i * 11) % 256) for i in range(3 * 16))
    idx4 = [(k + x * 3 + y) % 16 for y in range(h) for x in range(w)]
    if k == 0:
        return encode_png(w, h, 1, bytes(grey()))
    if k == 1:
        return encode_png(w, h, 3, bytes(multi(3)))
    if k == 2:
        return encode_png(w, h, 4, bytes(multi(4)))
    if k == 3:
        return encode_png(w, h, 2, bytes(multi(2)))
    if k == 4:
        return encode_png_ex(w, h, idx4, 8, 3, palette=pal)
    if k == 5:
        return encode_png_ex(w, h, idx4, 4, 3, palette=pal)
    if k == 6:
        return encode_png_ex(w, h, [i % 4 for i in idx4], 2, 3,
                             palette=pal[:12])
    if k == 7:
        return encode_png_ex(w, h, [i & 1 for i in idx4], 1, 3,
                             palette=pal[:6])
    if k == 8:  # palette + tRNS alpha (shorter than the palette)
        return encode_png_ex(w, h, idx4, 8, 3, palette=pal,
                             trns=bytes((0, 80, 160)))
    if k == 9:
        return encode_png_ex(w, h, [v * 257 for v in grey()], 16, 0)
    if k == 10:
        return encode_png_ex(w, h, [v * 251 % 65536 for v in multi(3)],
                             16, 2)
    if k == 11:
        return encode_png_ex(w, h, grey(15), 4, 0)
    if k == 12:
        return encode_png_ex(w, h, grey(1), 1, 0)
    if k == 13:  # grey + tRNS color key (the key value occurs)
        g = grey()
        return encode_png_ex(w, h, g, 8, 0, trns=_s.pack(">H", g[0]))
    if k == 14:
        return encode_png_ex(w, h, multi(3), 8, 2, interlace=1)
    # k == 15: palette + tRNS + Adam7 in one stream
    return encode_png_ex(w, h, idx4, 4, 3, palette=pal,
                         trns=bytes((255, 0)), interlace=1)


def _png_px_stats(k: int) -> tuple[int, int, int, int, int]:
    """(width, height, channels, sum_px, max_px) of the DECODED
    fixture #k — the pinned expectation both sides share."""
    from csvplus_spark.operators.pngcodec import decode_png

    w, h, c, px = decode_png(_png_px_fixture(k))
    return w, h, c, sum(px), max(px)


def q_multimodal_png_px(spark, sf_dir):
    """FULL exotic-PNG pixel decode through the oracle gate (r10):
    each doc maps to one of 16 deterministic PNGs — palette (PLTE all
    depths + tRNS alpha), 16-bit, sub-byte grey, tRNS color keys,
    Adam7 interlace — decoded EXECUTOR-SIDE by the pure-Python codec
    (operators/pngcodec.py::decode_png); the oracle pins the identical
    decode computed at SQL-build time as literals (the jpeg_px
    pattern). Codec fidelity (interlace == sequential, palette
    expansion, 16-bit high-byte) is pinned by the pngcodec unit
    tests."""
    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def decode(batches):
        import pandas as pd

        from csvplus_spark.operators.pngcodec import decode_png

        cache: dict[int, tuple] = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                k = int(did) % 16
                if k not in cache:
                    w, h, c, px = decode_png(_png_px_fixture(k))
                    cache[k] = (w, h, c, sum(px), max(px))
                rows.append((int(did),) + cache[k])
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels",
                "sum_px", "max_px"])

    return docs.mapInPandas(
        decode, "media_id long, width int, height int, channels int, "
                "sum_px long, max_px int")


def _multimodal_png_px_sql() -> str:
    pins = ",\n  ".join(
        f"({k}, {w}, {h}, {c}, CAST({s} AS BIGINT), {m})"
        for k, (w, h, c, s, m) in ((k, _png_px_stats(k))
                                   for k in range(16)))
    return f"""
SELECT d.doc_id AS media_id, p.width, p.height, p.channels,
       p.sum_px, p.max_px
FROM documents d
JOIN (VALUES
  {pins}) p(k, width, height, channels, sum_px, max_px)
  ON d.doc_id % 16 = p.k
"""


def _gif_fixture(k: int) -> bytes:
    """Deterministic animation fixture #k (r10): k<12 GIF89a (palettes
    of 4/16/256 colors, interlace, transparency, 1-4 frame
    animations); k=12..15 APNG (acTL/fcTL/fdAT, full-canvas and
    sub-rectangle frames) — REAL streams from the fixture-grade
    encoders (gifcodec.encode_gif / pngcodec.encode_apng)."""
    from csvplus_spark.operators.gifcodec import encode_gif
    from csvplus_spark.operators.pngcodec import encode_apng

    w = 7 + (k * 5) % 11
    h = 5 + (k * 3) % 9
    if k >= 12:
        ch = 4 if k == 14 else 3
        nf = 1 + k % 3
        frames = [bytes(((k * 7 + x + y * 3 + f * 11 + c * 29) % 256)
                        for y in range(h) for x in range(w)
                        for c in range(ch))
                  for f in range(nf)]
        rects = None
        if k == 15 and nf >= 2:  # sub-rectangle second frame
            fw, fh = max(1, w // 2), max(1, h // 2)
            frames[1] = frames[1][:fw * fh * ch]
            rects = [(0, 0, w, h), (2, 1, fw, fh)] +                 [(0, 0, w, h)] * (nf - 2)
        return encode_apng(w, h, ch, frames, rects=rects)
    ncol = 256 if k == 5 else (16 if k % 3 == 1 else 4)
    pal = bytes(((k * 37 + i * 11) % 256) for i in range(3 * ncol))
    frames = [[(k + x + y * 2 + f * 3) % ncol
               for y in range(h) for x in range(w)]
              for f in range(1 + k % 4)]
    return encode_gif(
        w, h, pal, frames[0],
        interlace=(k % 3 == 0),
        transparent=(1 if k % 4 == 1 else None),
        extra_frames=frames[1:])


def _gif_frame_rows(k: int) -> list[tuple]:
    """The exact (frame_no, frame_md5, width, height, n_frames) rows
    sample_frames(real_codec=True, n_frames=3) emits for fixture #k —
    the pinned expectation both sides share."""
    import hashlib

    from csvplus_spark.operators.gifcodec import decode_gif, gif_info, is_gif
    from csvplus_spark.operators.pngcodec import (apng_info,
                                                  decode_apng_frame)

    blob = _gif_fixture(k)
    if is_gif(blob):
        w, h, nf = gif_info(blob)
        dec = decode_gif
    else:
        w, h, nf = apng_info(blob)
        dec = decode_apng_frame
    take = min(3, nf)
    picks = [0] if take == 1 else [round(i * (nf - 1) / (take - 1))
                                   for i in range(take)]
    rows = []
    for fno in picks:
        _, _, _, px = dec(blob, fno)
        rows.append((fno, hashlib.md5(px).hexdigest(), w, h, nf))
    return rows


def q_multimodal_gif(spark, sf_dir):
    """REAL GIF + APNG decode + frame sampling through the oracle gate
    (r10): each doc maps to one of 16 deterministic streams (12 GIF:
    palette sizes 4/16/256, interlace, transparency, 1-4 frame
    animations; 4 APNG: acTL/fcTL/fdAT, RGBA + sub-rect variants);
    sample_frames(real_codec=True) decodes up to 3 evenly-spaced REAL
    frames per blob EXECUTOR-SIDE via the pure-Python LZW codec
    (operators/gifcodec.py), joined back to gif_info geometry. The
    oracle pins the identical decode computed at SQL-build time (the
    jpeg_px pattern). One-to-many row fan-out + pixel md5s: any LZW /
    interlace / palette / frame-walk divergence breaks the hash."""
    from csvplus_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def make(batches):
        import pandas as pd

        cache: dict[int, bytes] = {}
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                kk = int(did) % 16
                if kk not in cache:
                    cache[kk] = _gif_fixture(kk)
                blobs.append(cache[kk])
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": blobs})

    blobs = docs.mapInPandas(make, "media_id long, data binary")
    frames = sample_frames(blobs, n_frames=3, real_codec=True)

    def geo(batches):
        import pandas as pd

        from csvplus_spark.operators.gifcodec import gif_info, is_gif
        from csvplus_spark.operators.pngcodec import apng_info

        cache: dict[int, tuple] = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                kk = int(did) % 16
                if kk not in cache:
                    b = _gif_fixture(kk)
                    cache[kk] = gif_info(b) if is_gif(b) else \
                        apng_info(b)
                rows.append((int(did),) + cache[kk])
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "n_frames"])

    geom = docs.mapInPandas(
        geo, "media_id long, width int, height int, n_frames int")
    return frames.join(geom, "media_id").select(
        "media_id", "frame_no", "frame_md5", "width", "height",
        "n_frames")


def _multimodal_gif_sql() -> str:
    pins = ",\n  ".join(
        f"({k}, {fno}, '{md5}', {w}, {h}, {nf})"
        for k in range(16)
        for fno, md5, w, h, nf in _gif_frame_rows(k))
    return f"""
SELECT d.doc_id AS media_id, p.frame_no, p.frame_md5,
       p.width, p.height, p.n_frames
FROM documents d
JOIN (VALUES
  {pins}) p(k, frame_no, frame_md5, width, height, n_frames)
  ON d.doc_id % 16 = p.k
"""


def _tiff_fixture(k: int) -> bytes:
    """Deterministic TIFF fixture #k (r10): gray/RGB/RGBA pages,
    compressions none/LZW/PackBits, horizontal-differencing
    predictor, multi-strip and multi-page variants."""
    from csvplus_spark.operators.tiffcodec import encode_tiff

    w = 9 + (k * 5) % 14
    h = 6 + (k * 3) % 10
    ch = (1, 3, 4)[k % 3]
    px = bytes(((k * 19 + i * 7) % 256) for i in range(w * h * ch))
    pages = [(w, h, ch, px)]
    if k % 4 == 3:  # multi-page: second page differs
        px2 = bytes(((k * 23 + i * 11) % 256) for i in range(w * h * ch))
        pages.append((w, h, ch, px2))
    return encode_tiff(
        pages,
        compression=(1, 5, 32773)[k % 3],
        predictor=2 if k % 5 == 0 else 1,
        rows_per_strip=3 if k % 2 else 0)


def q_multimodal_tiff(spark, sf_dir):
    """REAL multi-page TIFF decode through the oracle gate (r10):
    each doc maps to one of 10 deterministic TIFFs (none/LZW/PackBits
    compression — TIFF-LZW is the MSB-first EarlyChange variant, NOT
    GIF's — predictor 2, multi-strip, multi-page); page 0 decodes
    EXECUTOR-SIDE via the pure-Python codec
    (operators/tiffcodec.py::decode_tiff) and the page count comes
    from the IFD chain walk. The oracle pins the identical decode
    computed at SQL-build time (the jpeg_px pattern)."""
    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def decode(batches):
        import pandas as pd

        from csvplus_spark.operators.tiffcodec import (decode_tiff,
                                                       tiff_info)

        cache: dict[int, tuple] = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                kk = int(did) % 10
                if kk not in cache:
                    blob = _tiff_fixture(kk)
                    w, h, npg = tiff_info(blob)
                    _, _, c, px = decode_tiff(blob)
                    cache[kk] = (w, h, npg, c, sum(px), max(px))
                rows.append((int(did),) + cache[kk])
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "n_pages", "channels",
                "sum_px", "max_px"])

    return docs.mapInPandas(
        decode, "media_id long, width int, height int, n_pages int, "
                "channels int, sum_px long, max_px int")


def _multimodal_tiff_sql() -> str:
    from csvplus_spark.operators.tiffcodec import decode_tiff, tiff_info

    pins = []
    for k in range(10):
        blob = _tiff_fixture(k)
        w, h, npg = tiff_info(blob)
        _, _, c, px = decode_tiff(blob)
        pins.append(f"({k}, {w}, {h}, {npg}, {c}, "
                    f"CAST({sum(px)} AS BIGINT), {max(px)})")
    vals = ",\n  ".join(pins)
    return f"""
SELECT d.doc_id AS media_id, p.width, p.height, p.n_pages, p.channels,
       p.sum_px, p.max_px
FROM documents d
JOIN (VALUES
  {vals}) p(k, width, height, n_pages, channels, sum_px, max_px)
  ON d.doc_id % 10 = p.k
"""


def q_multimodal_jpeg_px(spark, sf_dir):
    """FULL JPEG pixel decode through the oracle gate (r9 baseline,
    r10 progressive + arithmetic + 12-bit + progressive-arithmetic +
    lossless): each doc maps to one of 44 deterministic JPEGs — 16 baseline (gray + RGB, 4:4:4 + 4:2:0,
    restart intervals) + 8 PROGRESSIVE (SOF2, spectral selection +
    successive approximation, EOB runs, AC refinement, optimized
    per-scan huffman tables) + 8 ARITHMETIC (SOF9 QM-coded, DAC
    conditioning, restart variant, operators/jpegarith.py) + 4
    12-BIT extended sequential (SOF1, 16-bit DQT) + 4 PROGRESSIVE
    ARITHMETIC (SOF10, Annex G.2 over the QM coder) + 4 LOSSLESS
    (SOF3, Annex H predictors) — decoded
    EXECUTOR-SIDE by the pure-Python decoders
    (operators/jpegcodec.py::decode_jpeg); the oracle pins the
    identical decode computed at SQL-build time as literals — the
    bpe_counts pinned-sample pattern, proving the distributed decode
    is bit-identical to the driver-side one. Codec fidelity itself
    (progressive/arithmetic decode == baseline decode of the same
    coefficients) is pinned by the codec unit tests."""
    docs = load_table(spark, sf_dir, "documents").df.select("doc_id")

    def decode(batches):
        import pandas as pd

        from csvplus_spark.operators.jpegcodec import decode_jpeg

        cache: dict[int, tuple] = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                k = int(did) % 44
                if k not in cache:
                    w, h, c, px = decode_jpeg(_jpeg_px_fixture(k))
                    cache[k] = (w, h, c, sum(px), max(px))
                rows.append((int(did),) + cache[k])
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels",
                "sum_px", "max_px"])

    return docs.mapInPandas(
        decode, "media_id long, width int, height int, channels int, "
                "sum_px long, max_px int")


def _multimodal_jpeg_px_sql() -> str:
    pins = ",\n  ".join(
        f"({k}, {w}, {h}, {c}, CAST({s} AS BIGINT), {m})"
        for k, (w, h, c, s, m) in ((k, _jpeg_px_stats(k))
                                   for k in range(44)))
    return f"""
SELECT d.doc_id AS media_id, p.width, p.height, p.channels,
       p.sum_px, p.max_px
FROM documents d
JOIN (VALUES
  {pins}) p(k, width, height, channels, sum_px, max_px)
  ON d.doc_id % 44 = p.k
"""


def q_temperature_mix(spark, sf_dir):
    """Temperature-based source rebalancing, the mT5 data-mixture
    recipe (operators/sampling.py::temperature_mix): alpha=0.5
    flattens the source distribution, budget 50% of the corpus,
    hash-deterministic membership the oracle replays verbatim."""
    from csvplus_spark.operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents").df
    return temperature_mix(docs, alpha=0.5, budget_frac=0.5) \
        .select("doc_id", "source", "lang")


_HASH60_SQL = "CAST(('0x' || substring(md5({x}),1,15)) AS BIGINT)"

_TEMPERATURE_MIX_SQL = f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM c),
cw AS (SELECT source, n, w,
              SUM(w) OVER (ORDER BY source
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum
       FROM w),
t AS (SELECT MAX(cum) AS tot, SUM(n) AS nn FROM cw),
r AS (SELECT source,
             LEAST(1.0, (CAST(nn AS DOUBLE) * 0.5) * (w / tot)
                        / CAST(n AS DOUBLE)) AS r
      FROM w CROSS JOIN t)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN r ON d.source = r.source
WHERE CAST({_HASH60_SQL.format(x="'tempmix' || '|' || CAST(d.doc_id AS VARCHAR)")}
           % 1000000 AS DOUBLE) / 1000000.0 < r.r
"""

_HASH_SAMPLE_SQL = f"""
WITH b AS (
  SELECT doc_id, lang,
         {_HASH60_SQL.format(x="'sample' || '|' || CAST(doc_id AS VARCHAR)")} % 10000 AS sb,
         {_HASH60_SQL.format(x="'split' || '|' || CAST(doc_id AS VARCHAR)")} % 10000 AS pb
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN pb < 1000 THEN 'val'
            WHEN pb < 2000 THEN 'test'
            ELSE 'train' END AS split
FROM b
WHERE sb < CASE lang WHEN 'en' THEN 5000 ELSE 10000 END
"""


_RANGE_JOIN_SQL = """
WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
SELECT a.event_id,
       (SELECT COUNT(*) FROM ev b
        WHERE b.user_id <> a.user_id
          AND abs(b.us - a.us) <= 60000000) AS n_nearby
FROM ev a
"""


_DATE_ARITH_SQL = """
SELECT o_orderkey,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       EXTRACT(dow FROM o_orderdate) + 1 AS dow,
       epoch_us(o_orderdate + INTERVAL 3 MONTH) AS plus3m
FROM orders
"""

_NULL_FUNCS_SQL = """
SELECT n_name,
       COUNT(s_suppkey) AS n_nonnull,
       CAST(SUM(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null,
       COALESCE(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_bal,
       MAX(NULLIF('x', 'x')) AS always_null
FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
GROUP BY 1
"""


_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df) AS score_raw
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df,
       ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY ROUND(score_raw, 6) DESC, term) AS rank,
       ROUND(score_raw, 6) AS score
FROM scored
QUALIFY rank <= 3
"""

_PIVOT_SQL = """
SELECT o_orderstatus,
       COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
       COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
       COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
       COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
       COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY 1
"""


_QUANTILES_SQL = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.25) AS q1,
       quantile_cont(o_totalprice, 0.5) AS median,
       quantile_cont(o_totalprice, 0.95) AS p95
FROM orders GROUP BY 1
"""

_TPCH_Q3_SQL = """
SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS o_orderdate, o.o_orderpriority,
       SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))) / 10000.0 AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-06-15'
  AND l.l_shipdate > TIMESTAMP '1998-06-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""

_TPCH_Q5_SQL = """
SELECT n.n_name,
       SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
GROUP BY 1
"""


_ANN_RECALL_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS n FROM v),
cent AS (SELECT vec_id AS cell, e AS c FROM v ORDER BY vec_id LIMIT 16),
ad AS (
  SELECT v.vec_id, cent.cell,
         list_sum(list_transform(range(1, len(v.e) + 1),
                  k -> (v.e[k] - cent.c[k]) * (v.e[k] - cent.c[k]))) AS d2
  FROM v CROSS JOIN cent
),
assign AS (
  SELECT vec_id AS corpus_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM ad) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM ad WHERE vec_id < 50) WHERE rn <= 4
),
scored AS (
  SELECT p.query_id, a.corpus_id,
         list_sum(list_transform(range(1, len(vq.e) + 1),
                  k -> vq.e[k] * vc.e[k])) / (nq.n * nc.n) AS sim_raw
  FROM probes p JOIN assign a ON p.cell = a.cell
  JOIN v vq ON p.query_id = vq.vec_id
  JOIN v vc ON a.corpus_id = vc.vec_id
  JOIN norms nq ON p.query_id = nq.vec_id
  JOIN norms nc ON a.corpus_id = nc.vec_id
  WHERE p.query_id <> a.corpus_id
),
approx AS (
  SELECT query_id, corpus_id FROM (
    SELECT query_id, corpus_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_raw DESC, corpus_id) AS rnk
    FROM scored) WHERE rnk <= 5
),
exact AS (
  SELECT query_id, corpus_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q.e) + 1),
                      i -> q.e[i] * c.e[i])) / (nq.n * nc.n) DESC,
                      c.vec_id) AS rnk
    FROM v q JOIN v c ON q.vec_id <> c.vec_id
    JOIN norms nq ON q.vec_id = nq.vec_id
    JOIN norms nc ON c.vec_id = nc.vec_id
    WHERE q.vec_id < 50) WHERE rnk <= 5
)
SELECT e.query_id,
       COUNT(*) AS n_exact,
       COUNT(a.corpus_id) AS n_hits,
       COUNT(a.corpus_id) * 1.0 / COUNT(*) AS recall
FROM exact e
LEFT JOIN approx a ON e.query_id = a.query_id AND e.corpus_id = a.corpus_id
GROUP BY e.query_id
"""


def _semantic_dedup_sql(threshold: float = 0.4, n_cells: int = 16) -> str:
    # mirrors operators/dedup.py::semantic_dedup stage by stage: the
    # seed-Voronoi CTEs are _IVF_SEEDED_SQL's, the pair cosine is
    # _DEDUP_EMB_SQL's fold, the CC is _CLUSTERS_SQL's recursive CTE
    return f"""
WITH RECURSIVE v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
cent AS (SELECT vec_id AS cell, e AS c FROM v ORDER BY vec_id LIMIT {n_cells}),
ad AS (
  SELECT v.vec_id, cent.cell,
         list_sum(list_transform(range(1, len(v.e) + 1),
                  k -> (v.e[k] - cent.c[k]) * (v.e[k] - cent.c[k]))) AS d2
  FROM v CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM ad) WHERE rn = 1
),
n AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS nn FROM v),
pairs AS (
  SELECT aa.vec_id AS a, bb.vec_id AS b
  FROM assign aa JOIN assign bb ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
  JOIN v va ON aa.vec_id = va.vec_id
  JOIN v vb ON bb.vec_id = vb.vec_id
  JOIN n na ON aa.vec_id = na.vec_id
  JOIN n nb ON bb.vec_id = nb.vec_id
  WHERE list_sum(list_transform(range(1, len(va.e) + 1), k -> va.e[k] * vb.e[k]))
          / (na.nn * nb.nn) >= {threshold}
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(a, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.a
),
lbl AS (SELECT a AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY a)
SELECT v.vec_id,
       COALESCE(l.cluster_id, v.vec_id) AS canonical_id,
       v.vec_id = COALESCE(l.cluster_id, v.vec_id) AS is_canonical
FROM v LEFT JOIN lbl l ON v.vec_id = l.vec_id
"""


_DEDUP_EMB_SQL = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
n AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS nn FROM v)
SELECT a.vec_id AS id_1, b.vec_id AS id_2,
       list_sum(list_transform(range(1, len(a.e) + 1), k -> a.e[k] * b.e[k]))
         / (na.nn * nb.nn) AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
JOIN n na ON a.vec_id = na.vec_id
JOIN n nb ON b.vec_id = nb.vec_id
WHERE list_sum(list_transform(range(1, len(a.e) + 1), k -> a.e[k] * b.e[k]))
        / (na.nn * nb.nn) >= 0.4
"""

_MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       CAST(strlen(text) AS BIGINT) AS byte_len,
       md5(text) AS content_md5,
       CASE WHEN text LIKE 'GIF8%' THEN 'gif'
            WHEN text LIKE 'fLaC%' THEN 'flac'
            WHEN substring(text, 1, 4) = 'II*' || chr(0)
              OR substring(text, 1, 4) = 'MM' || chr(0) || '*'
              THEN 'tiff'
            WHEN text LIKE 'BM%' THEN 'bmp'
            ELSE 'unknown' END AS kind
FROM documents
"""

_EXPLODE_SQL = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents)
WHERE length(token) >= 6
GROUP BY token
"""

_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) / 100.0 AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

_SCALAR_STRING_MATH_SQL = """
SELECT p_partkey,
       upper(substring(p_name, 1, 8)) AS name_prefix,
       concat_ws('/', p_brand, p_type) AS brand_type,
       round(sqrt(abs(p_retailprice)), 6) AS sqrt_price,
       p_size % 7 AS size_mod,
       length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS consonants
FROM part
"""


_INTERSECT_SQL = """
SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
"""

_AGG_DISTINCT_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
FROM lineitem GROUP BY 1
"""


_ASOF_SQL = """
SELECT event_id, user_id, event_type,
       (SELECT p.value FROM events p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
          AND p.ts < e.ts
        ORDER BY p.ts DESC LIMIT 1) AS last_purchase_value
FROM events e
"""

_JOIN_OUTER_SQL = """
SELECT n_nationkey, n_name, COALESCE(a.n_suppliers, 0) AS n_suppliers
FROM nation LEFT JOIN (
  SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1
) a ON n_nationkey = a.s_nationkey
"""

_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER w AS prev_orderkey,
       SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) / 100.0 AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

_TUMBLING_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

_SLIDING_SQL = """
WITH grid AS (
  SELECT make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) - k.k) * 1800 * 1000000) AS ws,
         ts
  FROM events, range(2) k(k)
)
SELECT epoch_us(ws) AS window_start, COUNT(*) AS n_events
FROM grid WHERE ts >= ws AND ts < ws + INTERVAL 3600 SECOND
GROUP BY 1
"""

_SESSION_SQL = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT epoch_us(MIN(ts)) AS session_start, user_id, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


# --- oracle SQL builders for the hash-heavy extension queries ---------

_H60 = "CAST(('0x' || substring(md5({x}),1,15)) AS BIGINT)"
_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_SHINGLES = (
    "list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] "
    "for i in range(1, len(t)-1)])"
)

_LANG_STOP_SQL = {
    "de": "('der','die','das','und','ist','nicht','ein')",
    "en": "('the','a','of','and','to','in','is')",
    "es": "('el','la','de','que','y','los','un')",
    "fr": "('le','la','de','et','les','des','un')",
    "zh": "('de','shi','bu','le','ren','wo','zhe')",
}


def _lang_case() -> str:
    langs = sorted(_LANG_STOP_SQL)
    whens = []
    for lang in langs:
        conds = [f"c_{lang} > 0"]
        for other in langs:
            if other != lang:
                op = ">=" if lang < other else ">"
                conds.append(f"c_{lang} {op} c_{other}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def _text_stats_sql() -> str:
    counts = ", ".join(
        f"len(list_filter(toks, t -> t IN {ws})) AS c_{lang}"
        for lang, ws in _LANG_STOP_SQL.items()
    )
    return f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS} AS toks,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM documents
),
c AS (SELECT *, {counts} FROM base)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(text) AS n_chars_computed,
       CASE WHEN length(text) > 0 THEN n_punct * 1.0 / length(text) ELSE 0.0 END AS punct_ratio,
       CASE WHEN len(toks) > 0 THEN c_en * 1.0 / len(toks) ELSE 0.0 END AS stopword_ratio_en,
       CAST(CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.5 ELSE 0.0 END
        + CASE WHEN (CASE WHEN length(text) > 0 THEN n_punct * 1.0 / length(text) ELSE 0.0 END) < 0.2 THEN 0.25 ELSE 0.0 END
        + CASE WHEN len(toks) > 0
               AND length(list_aggregate(toks, 'string_agg', '')) * 1.0 / len(toks) BETWEEN 2 AND 12
               THEN 0.25 ELSE 0.0 END AS DOUBLE) AS quality,
       {_lang_case()} AS lang_pred,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM c
"""


_DEDUP_EXACT_SQL = """
WITH fp AS (
  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
canon AS (SELECT fp, MIN(doc_id) AS canonical_id FROM fp GROUP BY fp)
SELECT f.doc_id, c.canonical_id, f.doc_id = c.canonical_id AS is_canonical
FROM fp f JOIN canon c USING (fp)
"""

_NGRAM_CTES = f"""sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
),
npairs AS (
  SELECT d1 AS doc_id_1, d2 AS doc_id_2,
         i * 1.0 / (len(s1.sh) + len(s2.sh) - i) AS jaccard
  FROM inter JOIN sh s1 ON d1 = s1.doc_id JOIN sh s2 ON d2 = s2.doc_id
  WHERE i * 1.0 / (len(s1.sh) + len(s2.sh) - i) >= 0.6
)"""

_NGRAM_SQL = f"""
WITH {_NGRAM_CTES}
SELECT * FROM npairs
"""

_CLUSTERS_SQL = f"""
WITH RECURSIVE {_NGRAM_CTES},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM npairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM npairs
),
reach(a, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.a
)
SELECT a AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY a
"""

def _minhash_cte_sql(sh_cte: str = "sh", prefix: str = "") -> str:
    """sigs/bands CTEs mirroring operators/dedup.py exactly: base =
    hash60(shingle) % P, sig_s = min((a_s*base + b_s) % P), banded
    r=2 × b=16. ``prefix``/``sh_cte`` let the same chain compose into
    host queries with their own CTE namespaces (r9: the pagerank chain
    and the training_set oracle reuse THIS generator — the one copy of
    the minhash convention in SQL). sigs is MATERIALIZED: the 16-way
    band fanout would otherwise inline the signature aggregate (and
    everything upstream of ``sh_cte``) once per band."""
    from csvplus_spark.operators.dedup import MINHASH_COEF, MINHASH_P

    P = prefix
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS s{s}"
        for s, (a, b) in enumerate(MINHASH_COEF[:32])
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, s{2 * b} AS x, s{2 * b + 1} AS y "
        f"FROM {P}sigs"
        for b in range(16)
    )
    return f"""
{P}hx AS (
  SELECT doc_id, {_H60.format(x="s")} % {MINHASH_P} AS h
  FROM (SELECT doc_id, unnest(sh) AS s FROM {sh_cte})
),
{P}sigs AS MATERIALIZED (SELECT doc_id, {mins} FROM {P}hx GROUP BY doc_id),
{P}bands AS ({bands})
"""


_MINHASH_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
{_minhash_cte_sql()},
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.x = b.x AND a.y = b.y AND a.doc_id < b.doc_id
),
scored AS (
  SELECT d1, d2,
         len(list_filter(s1.sh, x -> list_contains(s2.sh, x))) AS i,
         len(s1.sh) AS n1, len(s2.sh) AS n2
  FROM cand JOIN sh s1 ON d1 = s1.doc_id JOIN sh s2 ON d2 = s2.doc_id
)
SELECT d1 AS doc_id_1, d2 AS doc_id_2, i * 1.0 / (n1 + n2 - i) AS jaccard
FROM scored WHERE i * 1.0 / (n1 + n2 - i) >= 0.6
"""

_FUZZY_JOIN_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
{_minhash_cte_sql()},
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.x = b.x AND a.y = b.y
   AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
),
scored AS (
  SELECT d1, d2,
         len(list_filter(s1.sh, x -> list_contains(s2.sh, x))) AS i,
         len(s1.sh) AS n1, len(s2.sh) AS n2
  FROM cand JOIN sh s1 ON d1 = s1.doc_id JOIN sh s2 ON d2 = s2.doc_id
)
SELECT d1 AS left_id, d2 AS right_id, i * 1.0 / (n1 + n2 - i) AS jaccard
FROM scored WHERE i * 1.0 / (n1 + n2 - i) >= 0.6
"""


def _simhash_sql(n_bits: int = 32) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(n_bits)
    )
    pack = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(n_bits)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS t FROM documents
),
h AS (SELECT doc_id, {_H60.format(x="t")} AS h FROM tok),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
SELECT doc_id, {pack} AS simhash FROM v
"""


_SIM_TOPK_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS n FROM v),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]))
           / (nq.n * nc.n) AS sim_raw
  FROM v q JOIN v c ON q.vec_id <> c.vec_id
  JOIN norms nq ON q.vec_id = nq.vec_id
  JOIN norms nc ON c.vec_id = nc.vec_id
  WHERE q.vec_id < 10
)
SELECT query_id, corpus_id,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, corpus_id) AS rank,
       ROUND(sim_raw, 6) AS sim
FROM pairs
QUALIFY rank <= 5
"""


def q_tpch_q10_returns(spark, sf_dir):
    """TPC-H Q10 shape: top customers by lost revenue on returned
    items — fact ⋈ fact on the shuffle key, broadcast dims, agg by
    customer attributes, exact-cents revenue, deterministic top-20."""
    c = load_table(spark, sf_dir, "customer").df
    n = load_table(spark, sf_dir, "nation").df
    o = load_table(spark, sf_dir, "orders").df
    li = load_table(spark, sf_dir, "lineitem").df
    lo, hi = "1997-01-01", "1997-07-01"
    return (
        o.filter((F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit(hi).cast("timestamp")))
        .join(li.filter(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == li["l_orderkey"])
        # customer scales with SF — no broadcast HINT (AQE broadcasts
        # it at test scale; at 100 TB it takes a shuffle join on the
        # already-shuffled o_custkey side); nation is a fixed 25 rows
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_drevenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q_tpch_q6_forecast(spark, sf_dir):
    """TPC-H Q6 shape: one-table filter + aggregate — everything lives
    in the scan pipeline (pushed filters, pruned columns, map-side
    partial agg); exact-cents revenue so the single output value
    hash-matches bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").df
    lo, hi = "1996-01-01", "1997-01-01"
    cents_p = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    cents_d = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
            & (cents_d >= 5) & (cents_d <= 7)
            & (F.col("l_quantity") < 24))
        .agg((F.sum(cents_p * cents_d) / F.lit(10000.0)).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


_TPCH_Q6_SQL = """
SELECT SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
           * CAST(floor(l_discount*100 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(floor(l_discount*100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_tpch_q14_promo(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — lineitem ⋈ part on the
    partkey, conditional aggregate. part scales with SF, so no
    broadcast hint (AQE broadcasts at test scale); exact-cents
    numerator/denominator, the ratio is one double division."""
    li = load_table(spark, sf_dir, "lineitem").df
    p = load_table(spark, sf_dir, "part").df
    lo, hi = "1996-03-01", "1996-04-01"
    rev = (F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
           * (100 - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    return (
        li.filter((F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(hi).cast("timestamp")))
        .join(p, F.col("l_partkey") == p["p_partkey"])
        .agg((F.lit(100.0) * F.sum(promo) / F.sum(rev)).alias("promo_pct"),
             (F.sum(rev) / F.lit(10000.0)).alias("revenue"))
    )


_TPCH_Q14_SQL = """
SELECT 100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
             THEN CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))
             ELSE 0 END)
       / SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))) AS promo_pct,
       SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""


def q_tpch_q18_bigorders(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders (quantity-sum HAVING
    semi-join) joined back to customer detail. Scale notes: the
    HAVING aggregate groups lineitem by l_orderkey — the SAME key the
    subsequent joins shuffle on, so the whole plan is one exchange of
    lineitem + one of orders (AQE broadcasts the tiny qualifying-order
    list at test scale); customer takes no broadcast hint (scales with
    SF). l_quantity is integral-valued double → sums are exact."""
    c = load_table(spark, sf_dir, "customer").df
    o = load_table(spark, sf_dir, "orders").df
    li = load_table(spark, sf_dir, "lineitem").df
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("total_qty"))
           .filter(F.col("total_qty") > 250))
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q_tpch_q4_priority(spark, sf_dir):
    """TPC-H Q4 shape: order counts per priority where EXISTS a
    late-shipped line (adapted: this testdata has no commit/receipt
    dates, so 'late' = shipped >60 days after order date). The EXISTS
    becomes a LEFT SEMI join on the orderkey — one shuffle of each
    fact, no fact duplication, dedup-free (semi joins emit the probe
    row at most once)."""
    o = load_table(spark, sf_dir, "orders").df
    li = load_table(spark, sf_dir, "lineitem").df
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate")
           + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


def q_tpch_q12_priority(spark, sf_dir):
    """TPC-H Q12 shape: conditional (CASE) aggregation of order
    priorities over late-shipped lines, grouped by returnflag
    (adapted: no l_shipmode column in this testdata). One fact⋈fact
    shuffle on the orderkey + one map-combined aggregate."""
    o = load_table(spark, sf_dir, "orders").df
    li = load_table(spark, sf_dir, "lineitem").df
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(li["l_shipdate"] > F.col("o_orderdate")
                + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"))
    )


def q_tpch_q19_disjuncts(spark, sf_dir):
    """TPC-H Q19 shape: revenue over an OR-of-ANDs of (brand, size,
    quantity) bands — the disjunctive-predicate planning test. The
    part side keeps ONLY the rows any disjunct can accept (Catalyst
    extracts brand/size conjuncts common per branch), broadcasts, and
    the final OR evaluates post-join; revenue is the exact
    integer-cents sum (_drevenue)."""
    li = load_table(spark, sf_dir, "lineitem").df
    p = load_table(spark, sf_dir, "part").df
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30)))
    return (
        li.join(F.broadcast(p.filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            & (F.col("p_size") <= 35))),
            li["l_partkey"] == p["p_partkey"])
        .filter(band)
        .groupBy()
        .agg(_drevenue().alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


def q_tpch_q22_idle(spark, sf_dir):
    """TPC-H Q22 shape: wealthy-but-idle customers — above-average
    account balance (uncorrelated scalar subquery, computed as an
    exact integer-cents mean so the threshold is engine-identical)
    with NO urgent order (LEFT ANTI join). Adapted: this testdata's
    customers all have orders, so 'idle' = no 1-URGENT order."""
    c = load_table(spark, sf_dir, "customer").df
    o = load_table(spark, sf_dir, "orders").df
    avg_bal = (c.filter(F.col("c_acctbal") > 0).groupBy()
               .agg((F.sum(_cents("c_acctbal")).cast("double")
                     / F.count(F.lit(1)) / F.lit(100.0)).alias("a"))
               .scalar())
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT") \
        .select("o_custkey")
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(urgent, c["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"),
             (F.sum(_cents("c_acctbal")) / F.lit(100.0)).alias("totacctbal"))
    )


def q_tpch_q21_waiting(spark, sf_dir):
    """TPC-H Q21 shape: the SOLE late supplier on multi-supplier
    orders — the same fact joined three ways (base + LEFT SEMI for
    'another supplier exists' + LEFT ANTI for 'no OTHER supplier was
    late'). The late-line set is computed once and reused for base
    and anti sides; all three joins shuffle on the SAME orderkey, so
    AQE coalesces them into one exchange lineage. Adapted: late =
    shipped >60 days after order date (no commit/receipt dates)."""
    o = load_table(spark, sf_dir, "orders").df
    li = load_table(spark, sf_dir, "lineitem").df
    s = load_table(spark, sf_dir, "supplier").df
    late = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .filter(li["l_shipdate"] > F.col("o_orderdate")
                    + F.expr("INTERVAL 60 DAYS"))
            .select("l_orderkey", "l_suppkey"))
    l1 = late.alias("l1")
    others = li.select(F.col("l_orderkey").alias("__ok__"),
                       F.col("l_suppkey").alias("__sk__"))
    late_others = late.select(F.col("l_orderkey").alias("__ok__"),
                              F.col("l_suppkey").alias("__sk__"))
    sole_late = (
        l1.join(others,
                (F.col("l1.l_orderkey") == F.col("__ok__"))
                & (F.col("l1.l_suppkey") != F.col("__sk__")), "left_semi")
        .join(late_others,
              (F.col("l1.l_orderkey") == F.col("__ok__"))
              & (F.col("l1.l_suppkey") != F.col("__sk__")), "left_anti"))
    return (sole_late
            .join(F.broadcast(s),
                  F.col("l1.l_suppkey") == s["s_suppkey"])
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(20))


def q_tpch_q16_suppcnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, size)
    with a NOT-IN exclusion subquery (→ LEFT ANTI against the tiny
    negative-balance supplier list) — lineitem stands in for partsupp
    (this testdata has no partsupp table)."""
    li = load_table(spark, sf_dir, "lineitem").df
    p = load_table(spark, sf_dir, "part").df
    s = load_table(spark, sf_dir, "supplier").df
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p.filter(F.col("p_brand") != "Brand#45")),
              li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_TPCH_Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""

_TPCH_Q16_SQL = """
SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#45'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
"""


_TPCH_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""

_TPCH_Q12_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_returnflag
"""

_TPCH_Q19_SQL = """
SELECT SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT)))
       / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""

_TPCH_Q22_SQL = """
SELECT c.c_mktsegment, COUNT(*) AS numcust,
       SUM(CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT)) / 100.0
       AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT))
                    AS DOUBLE) / COUNT(*) / 100.0
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
"""


_TPCH_Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       o.o_totalprice, b.total_qty
FROM orders o
JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250) b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


_TPCH_Q10_SQL = """
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))) / 10000.0 AS revenue
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey AND l.l_returnflag = 'R'
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


def q_expectations(spark, sf_dir):
    """Column-level data-quality gate over orders
    (operators/profile.py::check_expectations): one aggregate job,
    integer violation counts."""
    from csvplus_spark.operators.profile import check_expectations

    return check_expectations(
        load_table(spark, sf_dir, "orders").df,
        {
            "o_orderkey": {"not_null": True, "unique": True},
            "o_totalprice": {"min": 0.0},
            "o_orderstatus": {"allowed": ["F", "O", "P"]},
            "o_orderpriority": {"regex": "[1-5]-[A-Z ]+"},
        })


_EXPECTATIONS_SQL = """
SELECT 'o_orderkey' AS col_name, 'not_null' AS rule,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
FROM orders
UNION ALL
SELECT 'o_orderkey', 'unique',
       CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT),
       COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) = 0
FROM orders
UNION ALL
SELECT 'o_totalprice', 'min',
       CAST(SUM(CASE WHEN o_totalprice < 0.0 THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_totalprice < 0.0 THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'o_orderstatus', 'allowed',
       CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                      AND o_orderstatus NOT IN ('F', 'O', 'P')
                THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ('F', 'O', 'P')
           THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'o_orderpriority', 'regex',
       CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                      AND NOT regexp_full_match(o_orderpriority, '(?:[1-5]-[A-Z ]+)')
                THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_orderpriority IS NOT NULL
                 AND NOT regexp_full_match(o_orderpriority, '(?:[1-5]-[A-Z ]+)')
           THEN 1 ELSE 0 END) = 0
FROM orders
"""


def q_snapshot_diff(spark, sf_dir):
    """Cross-snapshot corpus diff (operators/dedup.py::snapshot_diff).
    Both snapshots derive deterministically from the documents table:
    'previous' = doc_id % 3 != 0; 'current' = doc_id % 7 != 0 with the
    text of every doc_id % 5 == 0 doc amended — exercising all four
    statuses."""
    from csvplus_spark.operators.dedup import snapshot_diff

    docs = load_table(spark, sf_dir, "documents").df
    prev = docs.filter(F.col("doc_id") % 3 != 0)
    cur = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" amended")))
        .otherwise(F.col("text")))
    return snapshot_diff(cur, prev)


_SNAPSHOT_DIFF_SQL = r"""
WITH prev AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_previous
  FROM documents WHERE doc_id % 3 <> 0
),
cur AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(
           CASE WHEN doc_id % 5 = 0 THEN text || ' amended' ELSE text END
         )), '\s+', ' ', 'g')) AS fp_current
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT COALESCE(cur.doc_id, prev.doc_id) AS doc_id,
       CASE WHEN prev.doc_id IS NULL THEN 'added'
            WHEN cur.doc_id IS NULL THEN 'removed'
            WHEN fp_current IS NOT DISTINCT FROM fp_previous THEN 'unchanged'
            ELSE 'changed' END AS status,
       fp_current, fp_previous
FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id
"""


def q_gopher_quality(spark, sf_dir):
    """Gopher-style quality rules: integer-count rule evaluation + the
    combined pass flag (operators/text.py::gopher_rules)."""
    from csvplus_spark.operators.text import gopher_rules

    return gopher_rules(load_table(spark, sf_dir, "documents").df)


def q_novel_bigrams(spark, sf_dir):
    """Per-doc novel-bigram ownership vs the whole corpus
    (operators/text.py::novel_bigram_stats)."""
    from csvplus_spark.operators.text import novel_bigram_stats

    return novel_bigram_stats(load_table(spark, sf_dir, "documents").df)


def q_source_mix(spark, sf_dir):
    """Corpus composition per (source, lang): docs, tokens, token
    share (operators/text.py::source_mix)."""
    from csvplus_spark.operators.text import source_mix

    return source_mix(load_table(spark, sf_dir, "documents").df)


def q_knn_label(spark, sf_dir):
    """kNN label propagation over the embeddings table: majority label
    of the 10 exact cosine neighbors, vote ties to the smallest label
    (operators/similarity.py::knn_label_vote)."""
    from csvplus_spark.operators.similarity import knn_label_vote

    emb = load_table(spark, sf_dir, "embeddings").df
    return knn_label_vote(emb, emb, k=10)


_GOPHER_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
a AS (
  SELECT doc_id,
         len(toks) AS n_words,
         COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS sum_word_chars,
         len(list_filter(toks, x -> NOT regexp_matches(x, '[0-9]'))) AS n_alpha_words,
         len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop_hits
  FROM t
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(sum_word_chars AS BIGINT) AS sum_word_chars,
       CAST(n_alpha_words AS BIGINT) AS n_alpha_words,
       CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
       CASE WHEN n_words > 0
            THEN CAST(sum_word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
            ELSE 0.0 END AS mean_word_len,
       (n_words BETWEEN 50 AND 100000
        AND sum_word_chars >= 3 * n_words AND sum_word_chars <= 10 * n_words
        AND 5 * n_alpha_words >= 4 * n_words
        AND n_stop_hits >= 2) AS passes_gopher
FROM a
"""


_NOVEL_BIGRAMS_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t WHERE len(toks) >= 2
),
tot AS (SELECT doc_id, COUNT(*) AS n_bigrams FROM bg GROUP BY doc_id),
db AS (SELECT DISTINCT doc_id, bigram FROM bg),
fr AS (SELECT bigram, COUNT(*) AS nd FROM db GROUP BY bigram),
per AS (
  SELECT db.doc_id,
         COUNT(*) AS n_distinct_bigrams,
         COALESCE(SUM(CASE WHEN fr.nd = 1 THEN 1 ELSE 0 END), 0) AS n_owned
  FROM db JOIN fr USING (bigram)
  GROUP BY db.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(tot.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(per.n_distinct_bigrams, 0) AS BIGINT) AS n_distinct_bigrams,
       CAST(COALESCE(per.n_owned, 0) AS BIGINT) AS n_owned,
       CASE WHEN COALESCE(per.n_distinct_bigrams, 0) > 0
            THEN CAST(per.n_owned AS DOUBLE) / CAST(per.n_distinct_bigrams AS DOUBLE)
            ELSE 0.0 END AS owned_ratio
FROM documents d
LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN per ON d.doc_id = per.doc_id
"""


_SOURCE_MIX_SQL = """
WITH c AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         COALESCE(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))), 0)
           AS n_tokens
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens AS DOUBLE)
         / (SELECT CAST(SUM(n_tokens) AS DOUBLE) FROM c) AS token_share
FROM c
"""


_KNN_LABEL_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS n FROM v),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]))
           / (nq.n * nc.n) AS sim_raw
  FROM v q JOIN v c ON q.vec_id <> c.vec_id
  JOIN norms nq ON q.vec_id = nq.vec_id
  JOIN norms nc ON c.vec_id = nc.vec_id
),
nn AS (
  SELECT query_id, corpus_id FROM pairs
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY sim_raw DESC, corpus_id) <= 10
),
cnt AS (
  SELECT nn.query_id, e.label, COUNT(*) AS votes
  FROM nn JOIN embeddings e ON nn.corpus_id = e.vec_id
  GROUP BY nn.query_id, e.label
)
SELECT query_id, label AS pred_label, CAST(votes AS BIGINT) AS votes
FROM cnt
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY votes DESC, label) = 1
"""


def q_tpch_q7_volume(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional trade volume between two nations
    by ship year — both nation dims are pre-filtered to the two names
    and broadcast (each fact row keeps at most the 2×2 name pairs, the
    disjunctive pair predicate then prunes to the two directions), so
    the only shuffles are the two fact-sized equi-joins (li⋈o on
    orderkey, o⋈c on custkey). Exact integer-cents volume."""
    li = load_table(spark, sf_dir, "lineitem").df
    o = load_table(spark, sf_dir, "orders").df
    c = load_table(spark, sf_dir, "customer").df
    s = load_table(spark, sf_dir, "supplier").df
    na, nb = "NATION_1", "NATION_2"
    n = load_table(spark, sf_dir, "nation").df.filter(
        F.col("n_name").isin(na, nb))
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    vol = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(((F.col("supp_nation") == na) & (F.col("cust_nation") == nb))
                | ((F.col("supp_nation") == nb)
                   & (F.col("cust_nation") == na)))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(vol) / F.lit(10000.0)).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


_TPCH_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT)))
         / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q_tpch_q8_share(spark, sf_dir):
    """TPC-H Q8 shape: market share of one supplier nation among a
    customer region's purchases of one part type, by order year.
    share = Σ(volume where supp_nation = N) / Σ(volume) — both sums
    exact integer cents² aggregated in one pass (conditional sum, no
    second scan), ONE double division per year at the very end.
    Dims (part filtered by type, supplier, nation×2, region, and the
    region-pruned customer lookup) broadcast."""
    li = load_table(spark, sf_dir, "lineitem").df
    o = load_table(spark, sf_dir, "orders").df
    s = load_table(spark, sf_dir, "supplier").df
    p = load_table(spark, sf_dir, "part").df.filter(
        F.col("p_type") == "ECONOMY")
    n = load_table(spark, sf_dir, "nation").df
    r = load_table(spark, sf_dir, "region").df.filter(
        F.col("r_name") == "ASIA")
    # customers in the target region: dim⋈dim⋈dim, stays broadcast-size
    c = (load_table(spark, sf_dir, "customer").df
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
         .select("c_custkey"))
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    vol = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    j = (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
         .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
         .join(o, li["l_orderkey"] == o["o_orderkey"])
         .join(c, o["o_custkey"] == c["c_custkey"]))
    target = F.when(F.col("supp_nation") == "NATION_10", vol).otherwise(
        F.lit(0).cast("long"))
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(target).alias("num_c2"), F.sum(vol).alias("den_c2"))
        .select("o_year",
                (F.col("num_c2").cast("double")
                 / F.col("den_c2").cast("double")).alias("mkt_share"),
                "den_c2")
    )


_TPCH_Q8_SQL = """
WITH j AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT)) AS vol,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_10' THEN vol ELSE 0 END)
            AS DOUBLE) / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
       CAST(SUM(vol) AS BIGINT) AS den_c2
FROM j GROUP BY o_year
"""


def q_tpch_q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts
    INCLUDING zero-order customers — LEFT join with an extra join-side
    predicate (priority <> '1-URGENT'), count(o_orderkey) so unmatched
    customers count 0, then a second tiny-domain aggregate."""
    c = load_table(spark, sf_dir, "customer").df
    o = load_table(spark, sf_dir, "orders").df
    per = (
        c.join(o, (c["c_custkey"] == o["o_custkey"])
               & (o["o_orderpriority"] != F.lit("1-URGENT")), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_TPCH_Q13_SQL = """
WITH per AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist FROM per GROUP BY c_count
"""


def q_tpch_q15_topsupp(spark, sf_dir):
    """TPC-H Q15 shape: top supplier(s) by one quarter's revenue —
    per-supplier exact-cents² aggregate, scalar max via a broadcast
    single-row crossJoin (no global sort), equality keeps ALL ties,
    then the tiny winner set broadcasts into the supplier dim."""
    li = load_table(spark, sf_dir, "lineitem").df
    s = load_table(spark, sf_dir, "supplier").df
    vol = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    rev = (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy("l_suppkey").agg(F.sum(vol).alias("rev_c2"))
    )
    mx = rev.agg(F.max("rev_c2").alias("mx_c2"))
    top = rev.join(F.broadcast(mx)).filter(F.col("rev_c2") == F.col("mx_c2"))
    return (
        s.join(F.broadcast(top), s["s_suppkey"] == top["l_suppkey"])
        .select("s_suppkey", "s_name",
                (F.col("rev_c2") / F.lit(10000.0)).alias("total_revenue"))
    )


_TPCH_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)))
           AS rev_c2
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.rev_c2 / 10000.0 AS total_revenue
FROM supplier s
JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE rev.rev_c2 = (SELECT MAX(rev_c2) FROM rev)
"""


def q_tpch_q17_smallqty(spark, sf_dir):
    """TPC-H Q17 shape: revenue from small-quantity lineitems of one
    brand's parts — the correlated per-part AVG becomes a per-part
    (Σqty, count) aggregate joined back to the same fact; the avg
    comparison qty < 0.2·avg is done in EXACT integers
    (5·qty·cnt < Σqty — l_quantity is integral in this data), so no
    float boundary. Both the filtered part dim and the per-part stats
    table broadcast."""
    li = load_table(spark, sf_dir, "lineitem").df
    p = load_table(spark, sf_dir, "part").df.filter(
        F.col("p_brand") == "Brand#13")
    qty = F.col("l_quantity").cast("long")
    branded = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    stats = branded.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("n_li"))
    small = (
        branded.join(F.broadcast(stats),
                     F.col("l_partkey") == F.col("sp_partkey"))
        .filter(F.lit(5) * qty * F.col("n_li") < F.col("sum_qty"))
    )
    return small.agg(
        (F.sum(_cents("l_extendedprice")) / F.lit(100.0) / F.lit(7.0))
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"))


_TPCH_Q17_SQL = """
WITH branded AS (
  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT) AS price_c
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#13'
),
stats AS (
  SELECT l_partkey AS sp_partkey, SUM(qty) AS sum_qty,
         COUNT(*) AS n_li
  FROM branded GROUP BY l_partkey
)
SELECT SUM(b.price_c) / 100.0 / 7.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM branded b
JOIN stats s ON b.l_partkey = s.sp_partkey
WHERE 5 * b.qty * s.n_li < s.sum_qty
"""


def q_tpch_q20_promosupp(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped >50 units of any 'red'
    part in 1996, restricted to one nation — the nested EXISTS chain
    becomes aggregate → threshold → LeftSemi into the supplier dim
    (adapted: no partsupp availqty, the threshold applies to shipped
    quantity). Part dim filtered+broadcast; the qualifying
    (supplier, part) table collapses to distinct suppkeys before the
    semi join, so the probe side is tiny."""
    li = load_table(spark, sf_dir, "lineitem").df
    p = load_table(spark, sf_dir, "part").df.filter(
        F.col("p_name").contains("red"))
    s = load_table(spark, sf_dir, "supplier").df
    n = load_table(spark, sf_dir, "nation").df.filter(
        F.col("n_name") == "NATION_3")
    qual = (
        li.filter(F.year("l_shipdate") == 1996)
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("shipped"))
        .filter(F.col("shipped") > 50)
        .select("l_suppkey").distinct()
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(qual), s["s_suppkey"] == qual["l_suppkey"],
              "left_semi")
        .select("s_suppkey", "s_name")
    )


_TPCH_Q20_SQL = """
WITH qual AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l.l_suppkey, l.l_partkey,
           SUM(CAST(l.l_quantity AS BIGINT)) AS shipped
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
    WHERE year(l.l_shipdate) = 1996
    GROUP BY l.l_suppkey, l.l_partkey
  ) WHERE shipped > 50
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM qual)
"""


def q_ccnet_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail corpus split by corpus-unigram LM
    score (operators/text.py::ccnet_buckets): exact 1/3–2/3 quantiles
    of the quantized score, one broadcast threshold row, no global
    sort."""
    from csvplus_spark.operators.text import ccnet_buckets

    return ccnet_buckets(load_table(spark, sf_dir, "documents").df)


def _ccnet_sql() -> str:
    return f"""
WITH scores AS ({_unigram_lm_sql()}),
q AS (
  SELECT doc_id, n_tokens, lp_mean,
         CAST(floor(lp_mean * 1048576.0) AS BIGINT) AS lq
  FROM scores
),
th AS (SELECT quantile_cont(lq, 1.0/3) AS t1,
              quantile_cont(lq, 2.0/3) AS t2 FROM q)
SELECT doc_id, n_tokens, lp_mean,
       CASE WHEN CAST(lq AS DOUBLE) >= (SELECT t2 FROM th) THEN 'head'
            WHEN CAST(lq AS DOUBLE) >= (SELECT t1 FROM th) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM q
"""


def q_dedup_keep_best(spark, sf_dir):
    """Keep-BEST near-dup collapse (operators/dedup.py::
    cluster_representatives): one representative per ngram-Jaccard
    cluster chosen by n_chars (longest copy wins, ties to smallest
    id), singletons pass through — the curation-grade alternative to
    the min-id convention of dedup_clusters."""
    from csvplus_spark.operators.dedup import (cluster_representatives,
                                               dup_clusters,
                                               ngram_jaccard_pairs)

    docs = load_table(spark, sf_dir, "documents").df
    clusters = dup_clusters(ngram_jaccard_pairs(docs, 0.6))
    return cluster_representatives(docs, clusters,
                                   F.col("n_chars").cast("long"))


_KEEP_BEST_SQL = f"""
WITH RECURSIVE {_NGRAM_CTES},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM npairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM npairs
),
reach(a, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.a
),
cl AS (SELECT a AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY a),
full_t AS (
  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
         CAST(d.n_chars AS BIGINT) AS sc
  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
)
SELECT cluster_id, doc_id AS rep_id, sc AS rep_score, n_members
FROM (
  SELECT cluster_id, doc_id, sc,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY sc DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM full_t
)
WHERE rn = 1
"""


def q_dedup_keep_best_fast(spark, sf_dir):
    """Keep-best representatives over the duplication-immune collapsed
    cluster graph (dup_clusters_collapsed) — byte-identical clusters,
    so byte-identical representatives (shares dedup_keep_best's
    oracle). The raw pair graph multiplies by the corpus duplication
    factor SQUARED (the 30× probe of the plain variant exhausts local
    shuffle disk); the collapse bounds it by the DISTINCT corpus."""
    from csvplus_spark.operators.dedup import (cluster_representatives,
                                               dup_clusters_collapsed)

    docs = load_table(spark, sf_dir, "documents").df
    clusters = dup_clusters_collapsed(docs, 0.6)
    return cluster_representatives(docs, clusters,
                                   F.col("n_chars").cast("long"))


def q_kcenter(spark, sf_dir):
    """Greedy k-center coreset selection (operators/similarity.py::
    kcenter_select): 8 farthest-point rounds, each one shuffle-free
    corpus pass + a scalar max — picks AND coverage radii are
    engine-exact (sequential d² folds), so the full greedy trajectory
    is SQL-replayable."""
    from csvplus_spark.operators.similarity import kcenter_select

    return kcenter_select(load_table(spark, sf_dir, "embeddings").df, 8)


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled greedy k-center CTE chain mirroring kcenter_select
    exactly: lowest-id start, per-round max-filter-min argmax over the
    NOT-yet-picked points (picked vids leave the pool, mirroring the
    r8 duplicate-center fix), least() running min-distance,
    sequential-fold d²."""
    def d2(src: str, cte: str) -> str:
        return (f"list_sum(list_transform(range(1, len({src}.e)+1), "
                f"j -> ({src}.e[j]-{cte}.ce[j])*({src}.e[j]-{cte}.ce[j])))")

    # AS MATERIALIZED is load-bearing: each s{i} is referenced three
    # times (m{i}, w{i}, s{i+1}) and DuckDB inlines CTEs per reference
    # — un-materialized, the chain re-evaluates 3^k times (the
    # PageRank-oracle lesson; 320s → ~1s here)
    parts = ["""v AS MATERIALIZED (SELECT vec_id AS vid,
       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       FROM embeddings),
c0 AS MATERIALIZED (SELECT vid AS cid, e AS ce
                    FROM v ORDER BY vid LIMIT 1),
s1 AS MATERIALIZED (SELECT vid, e, """ + d2("v", "c0") + """ AS mind2
       FROM v CROSS JOIN c0 WHERE v.vid <> c0.cid)"""]
    rows = ["SELECT CAST(0 AS INTEGER) AS sel_order, "
            "(SELECT cid FROM c0) AS vec_id, 0.0 AS radius_d2"]
    for i in range(1, k):
        parts.append(f"""m{i} AS MATERIALIZED (SELECT MAX(mind2) AS mx FROM s{i}),
w{i} AS MATERIALIZED (SELECT MIN(vid) AS cid FROM s{i}
         WHERE mind2 = (SELECT mx FROM m{i})),
c{i} AS MATERIALIZED (SELECT v.vid AS cid, v.e AS ce
         FROM v JOIN w{i} ON v.vid = w{i}.cid)""")
        if i < k - 1:
            parts.append(
                f"""s{i + 1} AS MATERIALIZED (SELECT s{i}.vid, s{i}.e,
         least(s{i}.mind2, {d2(f's{i}', f'c{i}')}) AS mind2
         FROM s{i} CROSS JOIN c{i} WHERE s{i}.vid <> c{i}.cid)""")
        rows.append(f"SELECT CAST({i} AS INTEGER), cid,"
                    f" (SELECT mx FROM m{i}) FROM w{i} WHERE cid IS NOT NULL")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


def q_leakage_split(spark, sf_dir):
    """Near-dup-aware train/val/test split (operators/sampling.py::
    leakage_safe_split): the split hash keys on the near-dup CLUSTER
    (collapsed CC graph), so no near-dup pair straddles train/test."""
    from csvplus_spark.operators.dedup import dup_clusters_collapsed
    from csvplus_spark.operators.sampling import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents").df
    return leakage_safe_split(docs, dup_clusters_collapsed(docs, 0.6))


_LEAKAGE_SPLIT_SQL = f"""
WITH RECURSIVE {_NGRAM_CTES},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM npairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM npairs
),
reach(a, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.a
),
cl AS (SELECT a AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY a),
full_t AS (
  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
)
SELECT doc_id, cluster_id,
       CASE WHEN {_H60.format(x="'split' || '|' || CAST(cluster_id AS VARCHAR)")}
                 % 10000 < 1000 THEN 'val'
            WHEN {_H60.format(x="'split' || '|' || CAST(cluster_id AS VARCHAR)")}
                 % 10000 < 2000 THEN 'test'
            ELSE 'train' END AS split
FROM full_t
"""


def q_events_rolling(spark, sf_dir):
    """Rolling 7-day per-user window via a RANGE frame over epoch-µs
    (window breadth: RANGE BETWEEN interval PRECEDING AND CURRENT ROW)
    — partitioned windows only, exact integer cents and µs, peers with
    equal timestamps included by RANGE semantics in both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").df
    us = F.unix_micros(F.col("ts"))
    week_us = 7 * 24 * 3600 * 1000000
    w = (Window.partitionBy("user_id").orderBy(us.alias("us"))
         .rangeBetween(-week_us, 0))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return ev.select(
        "event_id", "user_id", us.alias("ts_us"),
        F.sum(cents).over(w).alias("wk_sum_c"),
        F.count(F.lit(1)).over(w).alias("wk_events"),
    )


_EVENTS_ROLLING_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS wk_sum_c,
       COUNT(*) OVER w AS wk_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
"""


def q_dedup_containment(spark, sf_dir):
    """Exact n-gram CONTAINMENT pairs (operators/dedup.py::
    ngram_containment_pairs): |A∩B|/min(|A|,|B|) ≥ 0.8 — catches
    subset/superset duplication that symmetric Jaccard misses; same
    cold-shingle blocking, smaller-member-hot-heavy fallback."""
    from csvplus_spark.operators.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents").df
    return ngram_containment_pairs(docs, 0.8)


_CONTAINMENT_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT d1 AS doc_id_1, d2 AS doc_id_2,
       i * 1.0 / least(len(s1.sh), len(s2.sh)) AS containment
FROM inter JOIN sh s1 ON d1 = s1.doc_id JOIN sh s2 ON d2 = s2.doc_id
WHERE i * 1.0 / least(len(s1.sh), len(s2.sh)) >= 0.8
"""


def q_rfm(spark, sf_dir):
    """RFM customer segmentation: recency (µs since last order,
    relative to the corpus max — a scalar), frequency (order count),
    monetary (exact total cents), each cut at its own exact 1/3–2/3
    quantiles → 27 segments. All thresholds are ONE 6-value aggregate
    broadcast back (the ccnet_buckets shape) — no corpus-wide ntile
    window, which is the standard RFM recipe's scale trap."""
    o = load_table(spark, sf_dir, "orders").df
    mx = o.agg(F.max(F.unix_micros("o_orderdate")).alias("__mx__"))
    per = (o.crossJoin(F.broadcast(mx))
           .groupBy("o_custkey")
           .agg(F.min(F.col("__mx__")
                      - F.unix_micros("o_orderdate")).alias("rec_us"),
                F.count(F.lit(1)).alias("freq"),
                F.sum(_cents("o_totalprice")).alias("mon_c")))
    th = per.agg(
        F.expr("percentile(rec_us, array(1.0D/3.0D, 2.0D/3.0D))").alias("r"),
        F.expr("percentile(freq, array(1.0D/3.0D, 2.0D/3.0D))").alias("f"),
        F.expr("percentile(mon_c, array(1.0D/3.0D, 2.0D/3.0D))").alias("m"))

    def bucket(col, t, asc):
        # tercile 1..3; recency: smaller = better (3), others larger = 3
        lo, hi = F.col(t)[0], F.col(t)[1]
        v = F.col(col).cast("double")
        if asc:  # larger value → higher bucket
            return (F.when(v >= hi, 3).when(v >= lo, 2).otherwise(1))
        return (F.when(v >= hi, 1).when(v >= lo, 2).otherwise(3))

    return (per.crossJoin(F.broadcast(th))
            .select("o_custkey", "rec_us", "freq", "mon_c",
                    bucket("rec_us", "r", False).alias("r_bucket"),
                    bucket("freq", "f", True).alias("f_bucket"),
                    bucket("mon_c", "m", True).alias("m_bucket")))


_RFM_SQL = """
WITH per AS (
  SELECT o_custkey,
         (SELECT MAX(epoch_us(o_orderdate)) FROM orders)
           - MAX(epoch_us(o_orderdate)) AS rec_us,
         COUNT(*) AS freq,
         SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS mon_c
  FROM orders GROUP BY o_custkey
),
th AS (
  SELECT quantile_cont(rec_us, 1.0/3) AS r_lo,
         quantile_cont(rec_us, 2.0/3) AS r_hi,
         quantile_cont(freq, 1.0/3) AS f_lo,
         quantile_cont(freq, 2.0/3) AS f_hi,
         quantile_cont(mon_c, 1.0/3) AS m_lo,
         quantile_cont(mon_c, 2.0/3) AS m_hi
  FROM per
)
SELECT o_custkey, rec_us, freq, CAST(mon_c AS BIGINT) AS mon_c,
       CASE WHEN CAST(rec_us AS DOUBLE) >= r_hi THEN 1
            WHEN CAST(rec_us AS DOUBLE) >= r_lo THEN 2 ELSE 3 END
         AS r_bucket,
       CASE WHEN CAST(freq AS DOUBLE) >= f_hi THEN 3
            WHEN CAST(freq AS DOUBLE) >= f_lo THEN 2 ELSE 1 END
         AS f_bucket,
       CASE WHEN CAST(mon_c AS DOUBLE) >= m_hi THEN 3
            WHEN CAST(mon_c AS DOUBLE) >= m_lo THEN 2 ELSE 1 END
         AS m_bucket
FROM per, th
"""


def q_copurchase(spark, sf_dir):
    """Market-basket pair mining: parts co-occurring in the same order
    with support ≥ 3 — the association-rule candidate stage. The
    self-join is keyed by order, so cost is Σ|basket|² (baskets are
    small and bounded by order size), never |parts|²; support filter
    is a map-combined aggregate."""
    li = load_table(spark, sf_dir, "lineitem").df
    b = li.select("l_orderkey", "l_partkey").distinct()
    return (
        b.alias("a")
        .join(b.alias("bb"),
              (F.col("a.l_orderkey") == F.col("bb.l_orderkey"))
              & (F.col("a.l_partkey") < F.col("bb.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("part_1"),
                 F.col("bb.l_partkey").alias("part_2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )


_COPURCHASE_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_1, c.l_partkey AS part_2,
       COUNT(*) AS support
FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                 AND a.l_partkey < c.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""


def q_bloom_contam(spark, sf_dir):
    """Bloom-filter decontamination (operators/sketch.py::bloom_build/
    bloom_contains): the benchmark's shingle set folds into an ~8 KB
    broadcast bitmap; corpus shingles test membership scan-side —
    the 100 TB alternative to shuffling corpus shingles into a join.
    Emits per-doc shingle counts, exact benchmark hits, and Bloom
    hits with the ONE-SIDED guarantee bloom ≥ exact ENFORCED in-plan
    via raise_error (the approx_distinct pattern)."""
    from csvplus_spark.operators.dedup import shingle_pairs
    from csvplus_spark.operators.sketch import bloom_build, bloom_contains

    docs = load_table(spark, sf_dir, "documents").df
    bsh = (shingle_pairs(docs.filter(F.col("doc_id") % 10 == 0))
           .select(F.col("__s__").alias("term")).distinct())
    csh = (shingle_pairs(docs.filter(F.col("doc_id") % 10 != 0))
           .select(F.col("__id__").alias("doc_id"),
                   F.col("__s__").alias("term")))
    probed = bloom_contains(bloom_build(bsh), csh)
    bl = probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("in_bloom").cast("long")).alias("bloom_hits"))
    ex = (csh.join(bsh, "term", "left_semi")
          .groupBy("doc_id").agg(F.count(F.lit(1)).alias("exact_hits")))
    j = bl.join(ex, "doc_id", "left") \
        .withColumn("exact_hits",
                    F.coalesce(F.col("exact_hits"), F.lit(0).cast("long")))
    return j.select(
        "doc_id", "n_shingles", "exact_hits",
        F.when(F.col("bloom_hits") >= F.col("exact_hits"),
               F.col("bloom_hits"))
        .otherwise(F.raise_error(F.lit("bloom missed an inserted term"))
                   .cast("long")).alias("bloom_hits"))


_BLOOM_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
bterms AS MATERIALIZED (
  SELECT DISTINCT s AS term
  FROM (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 10 = 0)
),
cterms AS MATERIALIZED (
  SELECT doc_id, s AS term
  FROM (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 10 <> 0)
),
pos AS (
  SELECT i.i AS i, term,
         {_H60.format(x="CAST(i.i AS VARCHAR) || '|' || term")} % 65536
           AS p
  FROM bterms, (VALUES (0), (1), (2), (3)) i(i)
),
bloom AS MATERIALIZED (
  SELECT p // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS bits
  FROM pos GROUP BY 1
),
probe AS (
  SELECT c.doc_id, c.term,
         COUNT(*) FILTER (
           WHERE (COALESCE(b.bits, 0)
                  & (CAST(1 AS BIGINT)
                     << CAST({_H60.format(x="CAST(i.i AS VARCHAR) || '|' || c.term")} % 65536 % 63 AS INTEGER)))
                 <> 0) AS hits
  FROM cterms c CROSS JOIN (VALUES (0), (1), (2), (3)) i(i)
  LEFT JOIN bloom b
    ON b.word = ({_H60.format(x="CAST(i.i AS VARCHAR) || '|' || c.term")} % 65536) // 63
  GROUP BY c.doc_id, c.term
),
bl AS (
  SELECT doc_id, COUNT(*) AS n_shingles,
         SUM(CASE WHEN hits = 4 THEN 1 ELSE 0 END) AS bloom_hits
  FROM probe GROUP BY doc_id
),
ex AS (
  SELECT doc_id, COUNT(*) AS exact_hits
  FROM cterms WHERE term IN (SELECT term FROM bterms)
  GROUP BY doc_id
)
SELECT bl.doc_id, bl.n_shingles, COALESCE(ex.exact_hits, 0) AS exact_hits,
       CAST(bl.bloom_hits AS BIGINT) AS bloom_hits
FROM bl LEFT JOIN ex USING (doc_id)
"""


def q_events_ema(spark, sf_dir):
    """Per-user exponential moving average of event value (α = 1/2,
    exact binary) — the classic smoothing/forecast primitive. EMA is
    an ORDER-SENSITIVE float recursion, so it runs as a per-user
    position-ordered LEFT FOLD (the unigram_lm discipline) seeded by
    the first element — which is also the one fold shape DuckDB's
    no-initial-value list_reduce can replay exactly. Values go through
    exact cents (floor(v·100+0.5)/100) so both engines fold identical
    doubles; round(6) absorbs nothing here but keeps the output
    convention. One per-user aggregate; state bounded by per-user
    history length."""
    ev = load_table(spark, sf_dir, "events").df
    v = (F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
         .cast("double") / F.lit(100.0))
    per = (ev.select(F.col("user_id"),
                     F.struct(F.unix_micros("ts").alias("us"),
                              F.col("event_id"), v.alias("x"))
                     .alias("__e__"))
           .groupBy("user_id")
           .agg(F.array_sort(F.collect_list("__e__")).alias("__a__")))
    seed = F.element_at(F.col("__a__"), 1)["x"]
    rest = F.slice(F.col("__a__"), 2,
                   F.greatest(F.size("__a__") - 1, F.lit(0)))
    ema = F.aggregate(rest, seed,
                      lambda acc, e: acc * F.lit(0.5) + e["x"] * F.lit(0.5))
    return per.select("user_id", F.size("__a__").alias("n_events"),
                      F.round(ema, 6).alias("ema"))


_EVENTS_EMA_SQL = """
WITH per AS (
  SELECT user_id,
         list(CAST(floor(value*100 + 0.5) AS BIGINT) / 100.0
              ORDER BY epoch_us(ts), event_id) AS xs
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(len(xs) AS INTEGER) AS n_events,
       ROUND(list_reduce(xs, (acc, x) -> acc * 0.5 + x * 0.5), 6) AS ema
FROM per
"""


def q_scd2(spark, sf_dir):
    """Type-2 SCD batch apply (operators/maintenance.py::scd2_apply):
    customer balances as an open history, one update batch (every 7th
    key +100.00, every 11th an idempotent no-op re-delivery) →
    close/version/no-op rows, exact integer cents and µs."""
    from csvplus_spark.operators.maintenance import scd2_apply

    c = load_table(spark, sf_dir, "customer").df
    hist = c.select(
        F.col("c_custkey"),
        _cents("c_acctbal").alias("acct_c"),
        F.lit(0).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"))
    changed = (c.filter(F.col("c_custkey") % 7 == 0)
               .select("c_custkey",
                       (_cents("c_acctbal") + F.lit(10000)).alias("acct_c"),
                       F.lit(10**9).cast("long").alias("ts_us")))
    noop = (c.filter((F.col("c_custkey") % 11 == 0)
                     & (F.col("c_custkey") % 7 != 0))
            .select("c_custkey", _cents("c_acctbal").alias("acct_c"),
                    F.lit(10**9).cast("long").alias("ts_us")))
    return scd2_apply(hist, changed.unionByName(noop),
                      ["c_custkey"], ["acct_c"])


_SCD2_SQL = """
WITH hist AS (
  SELECT c_custkey,
         CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS acct_c,
         CAST(0 AS BIGINT) AS valid_from_us,
         CAST(NULL AS BIGINT) AS valid_to_us
  FROM customer
),
upd AS (
  SELECT c_custkey,
         CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) + 10000 AS nv,
         CAST(1000000000 AS BIGINT) AS uts
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT),
         CAST(1000000000 AS BIGINT)
  FROM customer WHERE c_custkey % 11 = 0 AND c_custkey % 7 <> 0
),
changed AS (
  SELECT h.c_custkey, h.acct_c, u.nv, u.uts
  FROM hist h JOIN upd u USING (c_custkey)
  WHERE h.acct_c IS DISTINCT FROM u.nv
)
SELECT h.c_custkey, h.acct_c, h.valid_from_us, h.valid_to_us
FROM hist h LEFT JOIN changed ch USING (c_custkey)
WHERE ch.c_custkey IS NULL                       -- untouched / no-op
UNION ALL
SELECT c_custkey, acct_c, 0, uts FROM changed    -- closed old version
UNION ALL
SELECT c_custkey, nv, uts, NULL FROM changed     -- new current version
"""


def q_attribution(spark, sf_dir):
    """Last-touch conversion attribution (operators/events_analytics.py
    ::last_touch_attribution): last non-purchase event strictly before
    each user's first purchase, total order (µs, event_id)."""
    from csvplus_spark.operators.events_analytics import last_touch_attribution

    return last_touch_attribution(load_table(spark, sf_dir, "events").df)


_ATTRIBUTION_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
),
fc2 AS (
  SELECT user_id, us AS first_conv_us, event_id AS fc_id
  FROM ev WHERE event_type = 'purchase'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY us, event_id) = 1
),
prior AS (
  SELECT e.user_id, f.first_conv_us, e.event_type, e.us, e.event_id
  FROM ev e JOIN fc2 f USING (user_id)
  WHERE e.event_type <> 'purchase'
    AND (e.us < f.first_conv_us
         OR (e.us = f.first_conv_us AND e.event_id < f.fc_id))
)
SELECT user_id, first_conv_us, event_type AS attributed_type,
       us AS attributed_us, event_id AS attributed_event_id
FROM prior
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY us DESC, event_id DESC) = 1
"""


def q_edit1_names(spark, sf_dir):
    """Edit-distance-≤1 part-name pairs via deletion-neighborhood
    hashing (operators/dedup.py::edit1_value_pairs) — the short-field
    record-matching primitive ('cold bolt' ↔ 'old bolt'); candidates
    from an equi-join on deletion keys, exact levenshtein verify. The
    oracle is an INDEPENDENT method: brute-force all distinct-value
    pairs."""
    from csvplus_spark.operators.dedup import edit1_value_pairs

    return edit1_value_pairs(load_table(spark, sf_dir, "part").df, "p_name")


_EDIT1_SQL = """
WITH v AS (SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL)
SELECT a.s AS value_1, b.s AS value_2,
       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
FROM v a JOIN v b ON a.s < b.s
WHERE levenshtein(a.s, b.s) <= 1
"""


def q_kcore(spark, sf_dir):
    """2-core of the MinHash near-dup graph (operators/graph.py::
    kcore_peel): 6 bounded peeling rounds — where duplication is
    structurally dense; degree-1 one-off pairs peel immediately.
    Purely integer/set-valued, trajectory SQL-replayed. Guarded:
    require_low_duplication routes high-f corpora to q_kcore_reps."""
    from csvplus_spark.operators.dedup import minhash_dedup_pairs
    from csvplus_spark.operators.graph import (kcore_peel,
                                               require_low_duplication)

    docs = load_table(spark, sf_dir, "documents").df
    return kcore_peel(minhash_dedup_pairs(
        require_low_duplication(docs, operator="kcore"), 0.6),
        k=2, rounds=6)


def _kcore_sql(k: int = 2, rounds: int = 6,
               docs_src: str = "documents") -> str:
    # same MinHash pair-graph preamble as _pagerank_sql; each peel CTE
    # is referenced twice (degree + next round) → AS MATERIALIZED
    chain = []
    for i in range(1, rounds + 1):
        chain.append(f"""d{i} AS MATERIALIZED (
  SELECT a, COUNT(*) AS c FROM e{i - 1} GROUP BY a),
k{i} AS MATERIALIZED (SELECT a FROM d{i} WHERE c >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN k{i} x ON e.a = x.a JOIN k{i} y ON e.b = y.a)""")
    return f"""
WITH {_minhash_pairs_cte(docs_src=docs_src)},
e0 AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM pairs WHERE d1 <> d2
      UNION SELECT d2, d1 FROM pairs WHERE d1 <> d2),
{",".join(chain)}
SELECT a AS doc_id, COUNT(*) AS core_degree
FROM e{rounds} GROUP BY a HAVING COUNT(*) >= {k}
"""


def q_winsorize(spark, sf_dir):
    """Robust per-group winsorization: clip event values to the exact
    [p05, p95] of the QUANTIZED value (integer percentiles interpolate
    identically across engines), thresholds broadcast back — the
    outlier-taming normalization step before any mean-based stat."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").df
    q = F.floor(F.col("value") * F.lit(1048576.0)).cast("long")
    th = (ev.select(F.col("event_type"), q.alias("__q__"))
          .groupBy("event_type")
          .agg(F.expr("percentile(__q__, 0.05D)").alias("__lo__"),
               F.expr("percentile(__q__, 0.95D)").alias("__hi__")))
    return (ev.join(F.broadcast(th), "event_type")
            .select("event_type", "event_id", "value",
                    (F.least(F.greatest(q.cast("double"), F.col("__lo__")),
                             F.col("__hi__")) / F.lit(1048576.0))
                    .alias("clipped")))


_WINSORIZE_SQL = """
WITH base AS (
  SELECT event_type, event_id, value,
         CAST(floor(value * 1048576.0) AS BIGINT) AS q
  FROM events
),
th AS (SELECT event_type, quantile_cont(q, 0.05) AS lo,
              quantile_cont(q, 0.95) AS hi
       FROM base GROUP BY event_type)
SELECT b.event_type, b.event_id, b.value,
       least(greatest(CAST(b.q AS DOUBLE), t.lo), t.hi) / 1048576.0
         AS clipped
FROM base b JOIN th t USING (event_type)
"""


def q_tpch_q11_share(spark, sf_dir):
    """TPC-H Q11 shape: (supplier, part) positions whose value exceeds
    a multiple of the MEAN group value — the group-vs-global-scalar
    HAVING. Q11's spec fraction scales 0.0001/SF precisely because a
    fixed fraction goes empty as group count grows; value > 3·mean is
    the scale-free equivalent. The comparison value·n > 3·total runs
    in DECIMAL(38,0)/HUGEINT (both exact — the weighted_sample
    precedent), never a float threshold; the single-row (total, n)
    broadcasts via a scalar join."""
    li = load_table(spark, sf_dir, "lineitem").df
    val = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    per = (li.groupBy("l_suppkey", "l_partkey")
           .agg(F.sum(val).alias("value_c2")))
    tot = per.agg(F.sum("value_c2").alias("__tot__"),
                  F.count(F.lit(1)).alias("__n__"))
    big = F.col("value_c2").cast("decimal(38,0)") * F.col("__n__") \
        > F.lit(3) * F.col("__tot__").cast("decimal(38,0)")
    return (per.join(F.broadcast(tot))
            .filter(big)
            .select("l_suppkey", "l_partkey", "value_c2"))


_TPCH_Q11_SQL = """
WITH per AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)))
           AS value_c2
  FROM lineitem GROUP BY l_suppkey, l_partkey
),
tot AS (SELECT SUM(value_c2) AS t, COUNT(*) AS n FROM per)
SELECT l_suppkey, l_partkey, CAST(value_c2 AS BIGINT) AS value_c2
FROM per, tot
WHERE CAST(value_c2 AS HUGEINT) * n > 3 * CAST(t AS HUGEINT)
"""


def q_minhash_calibration(spark, sf_dir):
    """LSH threshold calibration: histogram of MinHash signature
    agreement (0..32 matching hashes — an INTEGER Jaccard estimate in
    32nds) over the band-candidate pairs. Reading this histogram is
    how one picks band/row settings for a target threshold; every
    count is integer and the signatures are the deterministic
    MINHASH_COEF family, so the whole diagnostic is engine-exact."""
    from csvplus_spark.operators.dedup import (minhash_bands,
                                               minhash_signatures,
                                               shingle_pairs)

    docs = load_table(spark, sf_dir, "documents").df
    ex = shingle_pairs(docs).cache()  # one shingle pass for both stages
    sigs = minhash_signatures(docs, 32, pairs=ex).cache()
    bands = minhash_bands(docs, 32, 2, pairs=ex)
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.sig") == F.col("b.sig"))
                  & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("d1"), F.col("b.id").alias("d2"))
            .distinct())
    agree = sum(
        (F.col(f"s1.__sig{i}__") == F.col(f"s2.__sig{i}__")).cast("int")
        for i in range(32))
    return (cand
            .join(sigs.alias("s1"), F.col("d1") == F.col("s1.__id__"))
            .join(sigs.alias("s2"), F.col("d2") == F.col("s2.__id__"))
            .select(agree.alias("n_matching"))
            .groupBy("n_matching")
            .agg(F.count(F.lit(1)).alias("n_pairs")))


def _minhash_calibration_sql() -> str:
    agree = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(32))
    return f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
),
{_minhash_cte_sql()},
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.x = b.x AND a.y = b.y AND a.doc_id < b.doc_id
)
SELECT ({agree}) AS n_matching, COUNT(*) AS n_pairs
FROM cand
JOIN sigs sa ON cand.d1 = sa.doc_id
JOIN sigs sb ON cand.d2 = sb.doc_id
GROUP BY 1
"""


def q_dedup_containment_fast(spark, sf_dir):
    """Duplication-immune containment pairs (ngram_containment_pairs_
    collapsed): exact-copy collapse → rep-space containment → expand;
    byte-identical to q_dedup_containment (shared oracle), cost bounded
    by the DISTINCT corpus."""
    from csvplus_spark.operators.dedup import ngram_containment_pairs_collapsed

    docs = load_table(spark, sf_dir, "documents").df
    return ngram_containment_pairs_collapsed(docs, 0.8)


def q_cms_topk(spark, sf_dir):
    """Count-min sketch heavy hitters (operators/sketch.py): 4×1024
    md5-hashed integer cell grid, exact top-20 terms each emitted with
    exact count and CMS estimate; the CMS one-sided bound est ≥ exact
    is ENFORCED in-plan via raise_error (the approx_distinct
    pattern)."""
    from csvplus_spark.operators.sketch import cms_heavy_hitters

    return cms_heavy_hitters(load_table(spark, sf_dir, "documents").df, 20)


_CMS_SQL = f"""
WITH term_stream AS (
  SELECT unnest({_TOKS}) AS term FROM documents
),
cells AS MATERIALIZED (
  SELECT r.row AS row,
         {_H60.format(x="CAST(r.row AS VARCHAR) || '|' || term")} % 1024
           AS bucket,
         COUNT(*) AS ct
  FROM term_stream, (VALUES (0), (1), (2), (3)) r(row)
  GROUP BY 1, 2
),
exact AS (SELECT term, COUNT(*) AS exact_ct FROM term_stream GROUP BY term),
top AS MATERIALIZED (
  SELECT term, exact_ct FROM exact ORDER BY exact_ct DESC, term LIMIT 20
)
SELECT top.term, top.exact_ct, MIN(c.ct) AS cms_est, TRUE AS within_bound
FROM top JOIN cells c
  ON c.bucket = {_H60.format(x="CAST(c.row AS VARCHAR) || '|' || top.term")}
               % 1024
GROUP BY top.term, top.exact_ct
"""


def q_events_outliers(spark, sf_dir):
    """Robust per-type outlier flags via median absolute deviation
    (operators/profile.py::mad_outliers): quantized-integer exact
    percentiles, per-group broadcast thresholds, no per-row window."""
    from csvplus_spark.operators.profile import mad_outliers

    ev = load_table(spark, sf_dir, "events").df
    return mad_outliers(ev, "value", "event_type", 3.0,
                        id_cols=["event_id"])


_MAD_SQL = """
WITH base AS (
  SELECT event_id, event_type, value,
         CAST(floor(value * 1048576.0) AS BIGINT) AS q
  FROM events
),
med AS (SELECT event_type, quantile_cont(q, 0.5) AS med
        FROM base GROUP BY event_type),
resid AS (
  SELECT b.event_id, b.event_type, b.value,
         CAST(floor(abs(b.q - m.med)) AS BIGINT) AS ad
  FROM base b JOIN med m USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        FROM resid GROUP BY event_type)
SELECT r.event_type, r.event_id, r.value,
       CAST(r.ad AS DOUBLE) > 3.0 * m.mad AS is_outlier
FROM resid r JOIN mad m USING (event_type)
"""


def q_tpch_q2_mincost(spark, sf_dir):
    """TPC-H Q2 shape: cheapest regional supplier per part — the
    correlated MIN subquery becomes a per-part min aggregate joined
    back on (part, price) equality, keeping ALL tying suppliers.
    Dims (size-filtered part, region-pruned supplier set) broadcast;
    the fact is scanned once for offers and once (narrow) for the
    min table."""
    li = load_table(spark, sf_dir, "lineitem").df
    p = load_table(spark, sf_dir, "part").df.filter(F.col("p_size") == 10)
    s = load_table(spark, sf_dir, "supplier").df
    n = load_table(spark, sf_dir, "nation").df
    r = load_table(spark, sf_dir, "region").df.filter(
        F.col("r_name") == "EUROPE")
    eu = (s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    offers = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(eu), li["l_suppkey"] == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
                "n_name", _cents("l_extendedprice").alias("cost_c"))
    )
    mn = offers.groupBy(F.col("p_partkey").alias("__mp__")).agg(
        F.min("cost_c").alias("__mn__"))
    return (
        offers.join(F.broadcast(mn),
                    (F.col("p_partkey") == F.col("__mp__"))
                    & (F.col("cost_c") == F.col("__mn__")))
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
                (F.col("cost_c") / F.lit(100.0)).alias("min_cost"))
        .distinct()
    )


_TPCH_Q2_SQL = """
WITH eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
),
offers AS (
  SELECT p.p_partkey, p.p_name, eu.s_name, eu.n_name, eu.s_acctbal,
         CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT) AS cost_c
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size = 10
  JOIN eu ON l.l_suppkey = eu.s_suppkey
),
mn AS (SELECT p_partkey AS mp, MIN(cost_c) AS mn_c
       FROM offers GROUP BY p_partkey)
SELECT DISTINCT o.p_partkey, o.p_name, o.s_name, o.n_name, o.s_acctbal,
       o.cost_c / 100.0 AS min_cost
FROM offers o JOIN mn ON o.p_partkey = mn.mp AND o.cost_c = mn.mn_c
"""


def _bpe_counts_sql() -> str:
    """Oracle for q_bpe_counts: the corpus part recomputes the two
    SQL-expressible bound columns; the pinned part is the frozen
    expected counts as literals."""
    pins = ",\n  ".join(
        f"(CAST({-(i + 1)} AS BIGINT), 'pinned', CAST({exp} AS BIGINT),"
        f" CAST(0 AS BIGINT), TRUE)"
        for i, _s, exp in _BPE_PINS)
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, 'bounds' AS kind,
       CAST(len(list_filter(regexp_split_to_array(coalesce(text, ''),
                                                   '[ \t\n\x0b\f\r]+'),
                            x -> x <> '')) AS BIGINT) AS val1,
       CAST(strlen(coalesce(text, '')) AS BIGINT) AS val2, TRUE AS ok
FROM documents
UNION ALL
SELECT * FROM (VALUES
  {pins}) t(doc_id, kind, val1, val2, ok)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = _all_queries()
    # Driver-window rotation (round 10): the driver's correctness sheet
    # hash-checks only the FIRST 50 entries of this dict, so the window
    # is rotated each round. Anchor-cadence policy (r9 verdict item 5,
    # documented in NOTES.md): 20 §2-core anchors stay pinned EVERY
    # round; 10 cheap, never-regressed §2 anchors (the projection /
    # index-point / set-op family below) run on an every-other-round
    # cadence — they have 9 consecutive driver-green rows, are pinned
    # by the pytest suite and the full local sweep each round, and the
    # rotation_status regression gate fails the build if any of them
    # ever goes red locally. The freed slots drain the never-verified
    # backlog (55 after r9) ~50% faster.
    anchors = [
        "flagship", "filter_any", "map_derive", "join_unique",
        "join_prefix", "except_anti", "top_k", "drop_offset",
        "resolve_dups_first", "agg_pricing_summary", "window_rank",
        "scalar_date", "json_props", "top_ties", "events_tumbling",
        "stream_tumbling", "events_sliding", "events_session",
        "window_running", "rollup_agg",
    ]
    # every-other-round anchors — in the window on ODD rounds
    # (r11, r13, ...), out on even rounds; all driver-green every time
    # and plan-trivial (projection, point lookup, set ops). Round 14
    # is EVEN, so they are OUT and the rotation gets 30 slots (the
    # pytest suite + full local sweep still pin them every round, and
    # tools/rotation_status.py fails the build if any goes red).
    # odd_round_anchors = ["select_project", "drop_columns",
    #     "index_find", "sub_index", "take_while", "drop_while",
    #     "union_distinct", "intersect", "except_all", "intersect_all"]
    #
    # Round 14's 30 rotation slots (r13 verdict item 10): the
    # never-verified backlog is still zero, so every slot refreshes
    # the STALEST ever-green rows — the 30 queries whose newest
    # driver-green round is oldest per
    # tools/rotation_status.py::staleness(): the r07 cohort
    # (explode_tokens … text_stats) and the full r08 cohort.
    rotation_r14 = [
        "explode_tokens", "incremental_dedup", "join_outer",
        "multimodal_meta", "semantic_dedup", "sim_topk", "simhash",
        "skew_report", "skew_salted_join", "text_stats",
        "approx_distinct", "attribution", "bpe_counts",
        "dedup_clusters_fast", "dedup_keep_best", "edit1_names",
        "funnel", "fuzzy_join", "gopher_quality", "kcenter",
        "kcore", "kmeans", "knn_label", "leakage_split",
        "multimodal_jpeg", "pagerank", "pq_topk", "retention",
        "scd2", "triangles",
    ]
    out = {k: q[k] for k in anchors + rotation_r14}
    out.update((k, v) for k, v in q.items() if k not in out)
    return out


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship": q_flagship,
        "select_project": q_select_project,
        "drop_columns": q_drop_columns,
        "filter_any": q_filter_any,
        "map_derive": q_map_derive,
        "join_unique": q_join_unique,
        "join_prefix": q_join_prefix,
        "except_anti": q_except_anti,
        "index_find": q_index_find,
        "sub_index": q_sub_index,
        "top_k": q_top_k,
        "drop_offset": q_drop_offset,
        "take_while": q_take_while,
        "drop_while": q_drop_while,
        "resolve_dups_first": q_resolve_dups_first,
        "agg_pricing_summary": q_agg_pricing_summary,
        "window_rank": q_window_rank,
        "scalar_date": q_scalar_date,
        "json_props": q_json_props,
        "union_distinct": q_union_distinct,
        "text_stats": q_text_stats,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram": q_dedup_ngram,
        "dedup_ngram_fast": q_dedup_ngram_fast,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_fast": q_dedup_minhash_fast,
        "semantic_dedup": q_semantic_dedup,
        "skew_report": q_skew_report,
        "ann_recall": q_ann_recall,
        "simhash": q_simhash,
        "sim_topk": q_sim_topk,
        "events_tumbling": q_events_tumbling,
        "stream_tumbling": q_stream_tumbling,
        "stream_interval": q_stream_interval,
        "events_sliding": q_events_sliding,
        "events_session": q_events_session,
        "asof_join": q_asof_join,
        "join_outer": q_join_outer,
        "rollup_agg": q_rollup_agg,
        "window_running": q_window_running,
        "intersect": q_intersect,
        "except_all": q_except_all,
        "intersect_all": q_intersect_all,
        "skew_salted_join": q_skew_salted_join,
        "top_ties": q_top_ties,
        "incremental_dedup": q_incremental_dedup,
        "agg_distinct": q_agg_distinct,
        "dedup_embedding": q_dedup_embedding,
        "multimodal_meta": q_multimodal_meta,
        "explode_tokens": q_explode_tokens,
        "cube_agg": q_cube_agg,
        "scalar_string_math": q_scalar_string_math,
        "tpch_q3_shipping": q_tpch_q3_shipping,
        "tpch_q5_volume": q_tpch_q5_volume,
        "quantiles": q_quantiles,
        "dedup_clusters": q_dedup_clusters,
        "dedup_clusters_fast": q_dedup_clusters_fast,
        "tfidf": q_tfidf,
        "pivot": q_pivot,
        "approx_distinct": q_approx_distinct,
        "date_arith": q_date_arith,
        "null_funcs": q_null_funcs,
        "range_join": q_range_join,
        "hash_sample": q_hash_sample,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "simhash_pairs": q_simhash_pairs,
        "simhash_pairs60": q_simhash_pairs60,
        "simhash_reps60": q_simhash_reps60,
        "ivf_seeded": q_ivf_seeded,
        "bpe_counts": q_bpe_counts,
        "winnow": q_winnow,
        "token_counts": q_token_counts,
        "multimodal_features": q_multimodal_features,
        "quantize_embeddings": q_quantize,
        "rand_proj": q_rand_proj,
        "normalize_embeddings": q_normalize_embeddings,
        "chunk_docs": q_chunk_docs,
        "pack_sequences": q_pack_sequences,
        "repetition_stats": q_repetition,
        "content_flags": q_content_flags,
        "pii_scrub": q_pii_scrub,
        "boilerplate": q_boilerplate,
        "token_budget_mix": q_token_budget_mix,
        "rarity": q_rarity,
        "profile": q_profile,
        "contamination": q_contamination,
        "semantic_contam": q_semantic_contam,
        "temperature_mix": q_temperature_mix,
        "multimodal_png": q_multimodal_png,
        "multimodal_jpeg": q_multimodal_jpeg,
        "approx_quantiles": q_approx_quantiles,
        "canonicalize": q_canonicalize,
        "training_set": q_training_set,
        "lang_cap": q_lang_cap,
        "global_shuffle": q_global_shuffle,
        "unigram_lm": q_unigram_lm,
        "bigram_lm": q_bigram_lm,
        "dsir": q_dsir,
        "weighted_sample": q_weighted_sample,
        "kmeans": q_kmeans,
        "pq_topk": q_pq_topk,
        "fuzzy_join": q_fuzzy_join,
        "fuzzy_join_fast": q_fuzzy_join_fast,
        "ivf2_seeded": q_ivf2_seeded,
        "mean_pool": q_mean_pool,
        "linear_scorer": q_linear_scorer,
        "pagerank": q_pagerank,
        "pagerank_reps": q_pagerank_reps,
        "kcore_reps": q_kcore_reps,
        "triangles_reps": q_triangles_reps,
        "triangles": q_triangles,
        "tpch_q9_profit": q_tpch_q9_profit,
        "window_lead_ntile": q_window_lead_ntile,
        "bm25_search": q_bm25_search,
        "embedding_drift": q_embedding_drift,
        "multimodal_wav": q_multimodal_wav,
        "multimodal_mp4": q_multimodal_mp4,
        "funnel": q_funnel,
        "retention": q_retention,
        "cluster_balance": q_cluster_balance,
        "bm25": q_bm25,
        "repeated_spans": q_repeated_spans,
        "remove_spans": q_remove_spans,
        "quality_topfrac": q_quality_topfrac,
        "tpch_q10_returns": q_tpch_q10_returns,
        "tpch_q18_bigorders": q_tpch_q18_bigorders,
        "tpch_q4_priority": q_tpch_q4_priority,
        "tpch_q12_priority": q_tpch_q12_priority,
        "tpch_q19_disjuncts": q_tpch_q19_disjuncts,
        "tpch_q22_idle": q_tpch_q22_idle,
        "tpch_q21_waiting": q_tpch_q21_waiting,
        "tpch_q16_suppcnt": q_tpch_q16_suppcnt,
        "tpch_q6_forecast": q_tpch_q6_forecast,
        "tpch_q14_promo": q_tpch_q14_promo,
        "tpch_q7_volume": q_tpch_q7_volume,
        "tpch_q8_share": q_tpch_q8_share,
        "tpch_q13_custdist": q_tpch_q13_custdist,
        "tpch_q15_topsupp": q_tpch_q15_topsupp,
        "tpch_q17_smallqty": q_tpch_q17_smallqty,
        "tpch_q20_promosupp": q_tpch_q20_promosupp,
        "ccnet_buckets": q_ccnet_buckets,
        "dedup_keep_best": q_dedup_keep_best,
        "dedup_keep_best_fast": q_dedup_keep_best_fast,
        "kcenter": q_kcenter,
        "cms_topk": q_cms_topk,
        "events_outliers": q_events_outliers,
        "tpch_q2_mincost": q_tpch_q2_mincost,
        "leakage_split": q_leakage_split,
        "events_rolling": q_events_rolling,
        "dedup_containment": q_dedup_containment,
        "dedup_containment_fast": q_dedup_containment_fast,
        "winsorize": q_winsorize,
        "tpch_q11_share": q_tpch_q11_share,
        "minhash_calibration": q_minhash_calibration,
        "kcore": q_kcore,
        "edit1_names": q_edit1_names,
        "attribution": q_attribution,
        "scd2": q_scd2,
        "events_ema": q_events_ema,
        "bloom_contam": q_bloom_contam,
        "copurchase": q_copurchase,
        "rfm": q_rfm,
        "snapshot_diff": q_snapshot_diff,
        "expectations": q_expectations,
        "gopher_quality": q_gopher_quality,
        "novel_bigrams": q_novel_bigrams,
        "source_mix": q_source_mix,
        "knn_label": q_knn_label,
        "avro_ingest": q_avro_ingest,
        "dup_factor": q_dup_factor,
        "multimodal_jpeg_px": q_multimodal_jpeg_px,
        "avro_snappy_ingest": q_avro_snappy_ingest,
        "multimodal_resize_px": q_multimodal_resize_px,
        "multimodal_png_px": q_multimodal_png_px,
        "multimodal_gif": q_multimodal_gif,
        "multimodal_flac": q_multimodal_flac,
        "multimodal_tiff": q_multimodal_tiff,
        "multimodal_grid": q_multimodal_grid,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flagship": _FLAGSHIP_SQL,
        "select_project": """
            SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name, c_mktsegment
            FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "drop_columns": """
            SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name FROM nation
        """,
        "filter_any": """
            SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, o_orderstatus, o_orderpriority
            FROM orders WHERE o_orderstatus = 'F' OR o_orderpriority = '1-URGENT'
        """,
        "map_derive": """
            SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
                   CAST(l_linenumber AS VARCHAR) AS l_linenumber,
                   l_extendedprice * (1 - l_discount) AS revenue
            FROM lineitem
        """,
        "join_unique": """
            SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
                   CAST(o_custkey AS VARCHAR) AS o_custkey,
                   CAST(c_custkey AS VARCHAR) AS c_custkey, c_name, c_mktsegment
            FROM orders JOIN customer ON CAST(o_custkey AS VARCHAR) = CAST(c_custkey AS VARCHAR)
        """,
        "join_prefix": """
            SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, o_orderstatus,
                   CAST(l_linenumber AS VARCHAR) AS l_linenumber, l_returnflag
            FROM orders JOIN lineitem ON CAST(o_orderkey AS VARCHAR) = CAST(l_orderkey AS VARCHAR)
        """,
        "except_anti": """
            SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
                   CAST(o_custkey AS VARCHAR) AS o_custkey, o_orderstatus
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_acctbal < 0
                              AND CAST(c.c_custkey AS VARCHAR) = CAST(o.o_custkey AS VARCHAR))
        """,
        "index_find": """
            SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
                   CAST(l_linenumber AS VARCHAR) AS l_linenumber,
                   CAST(l_quantity AS VARCHAR) AS l_quantity
            FROM lineitem WHERE CAST(l_orderkey AS VARCHAR) = '7'
        """,
        "sub_index": """
            SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
                   CAST(l_linenumber AS VARCHAR) AS l_linenumber,
                   CAST(l_quantity AS VARCHAR) AS l_quantity
            FROM lineitem WHERE CAST(l_orderkey AS VARCHAR) = '7'
              AND CAST(l_linenumber AS VARCHAR) = '1'
        """,
        "top_k": """
            SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name,
                   CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS bal
            FROM customer
            ORDER BY bal DESC, CAST(c_custkey AS VARCHAR) ASC
            LIMIT 10
        """,
        "drop_offset": """
            SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name
            FROM customer
            ORDER BY CAST(c_custkey AS VARCHAR)
            OFFSET 20
        """,
        "take_while": """
            SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name, c_mktsegment
            FROM customer
            WHERE CAST(c_custkey AS VARCHAR) <
                  (SELECT MIN(CAST(c_custkey AS VARCHAR)) FROM customer
                   WHERE c_mktsegment = 'BUILDING')
        """,
        "drop_while": """
            SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name, c_mktsegment
            FROM customer
            WHERE CAST(c_custkey AS VARCHAR) >=
                  (SELECT MIN(CAST(c_custkey AS VARCHAR)) FROM customer
                   WHERE c_mktsegment = 'BUILDING')
        """,
        "resolve_dups_first": """
            SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
                   CAST(l_linenumber AS VARCHAR) AS l_linenumber,
                   CAST(l_quantity AS VARCHAR) AS l_quantity
            FROM lineitem
            QUALIFY ROW_NUMBER() OVER (PARTITION BY CAST(l_orderkey AS VARCHAR)
                                       ORDER BY CAST(l_linenumber AS VARCHAR),
                                                CAST(l_quantity AS VARCHAR)) = 1
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
                   SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
                   SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) / 10000.0 AS sum_disc_price,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "window_rank": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM orders
            QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) = 1
        """,
        "scalar_date": """
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
                   COUNT(*) AS n_orders,
                   SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS total_price
            FROM orders GROUP BY 1
        """,
        "json_props": """
            SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        """,
        "union_distinct": """
            SELECT DISTINCT nationkey FROM (
                SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
                UNION ALL
                SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
            )
        """,
        "text_stats": _text_stats_sql(),
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_ngram": _NGRAM_SQL,
        "dedup_ngram_fast": _NGRAM_SQL,
        "dedup_minhash": _MINHASH_SQL,
        "dedup_minhash_fast": _MINHASH_SQL,
        "semantic_dedup": _semantic_dedup_sql(),
        "ann_recall": _ANN_RECALL_SQL,
        "skew_report": """
WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey),
t AS (SELECT SUM(n) AS total, COUNT(*) AS nkeys FROM c)
SELECT c.l_suppkey, c.n,
       c.n * 1.0 / t.total AS share,
       c.n * t.nkeys * 1.0 / t.total AS skew
FROM c, t
ORDER BY c.n DESC, c.l_suppkey
LIMIT 20
""",
        "simhash": _simhash_sql(),
        "sim_topk": _SIM_TOPK_SQL,
        "events_tumbling": _TUMBLING_SQL,
        "stream_tumbling": _STREAM_TUMBLING_SQL,
        "stream_interval": _STREAM_INTERVAL_SQL,
        "events_sliding": _SLIDING_SQL,
        "events_session": _SESSION_SQL,
        "asof_join": _ASOF_SQL,
        "join_outer": _JOIN_OUTER_SQL,
        "rollup_agg": _ROLLUP_SQL,
        "window_running": _WINDOW_RUNNING_SQL,
        "intersect": _INTERSECT_SQL,
        "except_all": _EXCEPT_ALL_SQL,
        "intersect_all": _INTERSECT_ALL_SQL,
        "skew_salted_join": _SKEW_SALTED_JOIN_SQL,
        "top_ties": _TOP_TIES_SQL,
        "incremental_dedup": _INCREMENTAL_DEDUP_SQL,
        "agg_distinct": _AGG_DISTINCT_SQL,
        "dedup_embedding": _DEDUP_EMB_SQL,
        "multimodal_meta": _MULTIMODAL_SQL,
        "explode_tokens": _EXPLODE_SQL,
        "cube_agg": _CUBE_SQL,
        "scalar_string_math": _SCALAR_STRING_MATH_SQL,
        "tpch_q3_shipping": _TPCH_Q3_SQL,
        "tpch_q5_volume": _TPCH_Q5_SQL,
        "quantiles": _QUANTILES_SQL,
        "dedup_clusters": _CLUSTERS_SQL,
        "dedup_clusters_fast": _CLUSTERS_SQL,
        "tfidf": _TFIDF_SQL,
        "pivot": _PIVOT_SQL,
        "date_arith": _DATE_ARITH_SQL,
        "null_funcs": _NULL_FUNCS_SQL,
        "range_join": _RANGE_JOIN_SQL,
        "hash_sample": _HASH_SAMPLE_SQL,
        "dedup_embedding_lsh": _dedup_emb_lsh_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "simhash_pairs60": _simhash_pairs_sql(60),
        "simhash_reps60": _simhash_reps_sql(),
        "ivf_seeded": _IVF_SEEDED_SQL,
        "winnow": _winnow_sql(),
        "token_counts": _TOKEN_COUNTS_SQL,
        "multimodal_features": _MULTIMODAL_FEATURES_SQL,
        "quantize_embeddings": _QUANTIZE_SQL,
        "rand_proj": _rand_proj_sql(),
        "normalize_embeddings": _NORMALIZE_SQL,
        "chunk_docs": _CHUNK_DOCS_SQL,
        "pack_sequences": _PACK_SEQUENCES_SQL,
        "repetition_stats": _REPETITION_SQL,
        "content_flags": _CONTENT_FLAGS_SQL,
        "pii_scrub": _PII_SCRUB_SQL,
        "boilerplate": _BOILERPLATE_SQL,
        "token_budget_mix": _TOKEN_BUDGET_MIX_SQL,
        "rarity": _RARITY_SQL,
        "profile": _profile_sql(),
        "contamination": _CONTAMINATION_SQL,
        "semantic_contam": _SEMANTIC_CONTAM_SQL,
        "temperature_mix": _TEMPERATURE_MIX_SQL,
        "multimodal_png": _MULTIMODAL_PNG_SQL,
        "multimodal_jpeg": _MULTIMODAL_JPEG_SQL,
        "avro_ingest": _AVRO_INGEST_SQL,
        "dup_factor": _DUP_FACTOR_SQL,
        "multimodal_jpeg_px": _multimodal_jpeg_px_sql(),
        "avro_snappy_ingest": _AVRO_SNAPPY_INGEST_SQL,
        "multimodal_resize_px": _multimodal_resize_px_sql(),
        "multimodal_png_px": _multimodal_png_px_sql(),
        "multimodal_gif": _multimodal_gif_sql(),
        "multimodal_flac": _multimodal_flac_sql(),
        "multimodal_tiff": _multimodal_tiff_sql(),
        "multimodal_grid": _MULTIMODAL_GRID_SQL,
        "approx_quantiles": _APPROX_QUANTILES_SQL,
        "canonicalize": _canonicalize_sql(),
        "training_set": _training_set_sql(),
        "lang_cap": _lang_cap_sql(),
        "global_shuffle": _global_shuffle_sql(),
        "unigram_lm": _unigram_lm_sql(),
        "bigram_lm": _bigram_lm_sql(),
        "dsir": _dsir_sql(),
        "weighted_sample": _weighted_sample_sql(),
        "kmeans": _kmeans_sql(),
        "pq_topk": _pq_topk_sql(),
        "fuzzy_join": _FUZZY_JOIN_SQL,
        "fuzzy_join_fast": _FUZZY_JOIN_SQL,
        "ivf2_seeded": _IVF2_SEEDED_SQL,
        "mean_pool": _MEAN_POOL_SQL,
        "linear_scorer": _linear_scorer_sql(),
        "pagerank": _pagerank_sql(),
        "pagerank_reps": _pagerank_sql(docs_src=_PAGERANK_REPS_DOCS_SRC),
        "kcore_reps": _kcore_sql(docs_src=_PAGERANK_REPS_DOCS_SRC),
        "triangles_reps": _triangles_sql(docs_src=_PAGERANK_REPS_DOCS_SRC),
        "triangles": _triangles_sql(),
        "tpch_q9_profit": _TPCH_Q9_SQL,
        "window_lead_ntile": _WINDOW_LEAD_NTILE_SQL,
        "bm25_search": _bm25_search_sql(),
        "embedding_drift": _embedding_drift_sql(),
        "multimodal_wav": _MULTIMODAL_WAV_SQL,
        "multimodal_mp4": _MULTIMODAL_MP4_SQL,
        "funnel": _FUNNEL_SQL,
        "retention": _RETENTION_SQL,
        "cluster_balance": _cluster_balance_sql(),
        "bm25": _BM25_SQL,
        "repeated_spans": _repeated_spans_sql(),
        "remove_spans": _remove_spans_sql(),
        "quality_topfrac": _quality_topfrac_sql(),
        "tpch_q10_returns": _TPCH_Q10_SQL,
        "tpch_q18_bigorders": _TPCH_Q18_SQL,
        "tpch_q4_priority": _TPCH_Q4_SQL,
        "tpch_q12_priority": _TPCH_Q12_SQL,
        "tpch_q19_disjuncts": _TPCH_Q19_SQL,
        "tpch_q22_idle": _TPCH_Q22_SQL,
        "tpch_q21_waiting": _TPCH_Q21_SQL,
        "tpch_q16_suppcnt": _TPCH_Q16_SQL,
        "tpch_q6_forecast": _TPCH_Q6_SQL,
        "tpch_q14_promo": _TPCH_Q14_SQL,
        "tpch_q7_volume": _TPCH_Q7_SQL,
        "tpch_q8_share": _TPCH_Q8_SQL,
        "tpch_q13_custdist": _TPCH_Q13_SQL,
        "tpch_q15_topsupp": _TPCH_Q15_SQL,
        "tpch_q17_smallqty": _TPCH_Q17_SQL,
        "tpch_q20_promosupp": _TPCH_Q20_SQL,
        "ccnet_buckets": _ccnet_sql(),
        "dedup_keep_best": _KEEP_BEST_SQL,
        "dedup_keep_best_fast": _KEEP_BEST_SQL,
        "kcenter": _kcenter_sql(),
        "cms_topk": _CMS_SQL,
        "events_outliers": _MAD_SQL,
        "tpch_q2_mincost": _TPCH_Q2_SQL,
        "leakage_split": _LEAKAGE_SPLIT_SQL,
        "events_rolling": _EVENTS_ROLLING_SQL,
        "dedup_containment": _CONTAINMENT_SQL,
        "dedup_containment_fast": _CONTAINMENT_SQL,
        "winsorize": _WINSORIZE_SQL,
        "tpch_q11_share": _TPCH_Q11_SQL,
        "minhash_calibration": _minhash_calibration_sql(),
        "kcore": _kcore_sql(),
        "edit1_names": _EDIT1_SQL,
        "attribution": _ATTRIBUTION_SQL,
        "scd2": _SCD2_SQL,
        "events_ema": _EVENTS_EMA_SQL,
        "bloom_contam": _BLOOM_SQL,
        "copurchase": _COPURCHASE_SQL,
        "rfm": _RFM_SQL,
        "snapshot_diff": _SNAPSHOT_DIFF_SQL,
        "expectations": _EXPECTATIONS_SQL,
        "gopher_quality": _GOPHER_SQL,
        "novel_bigrams": _NOVEL_BIGRAMS_SQL,
        "source_mix": _SOURCE_MIX_SQL,
        "knn_label": _KNN_LABEL_SQL,
        # approx_distinct: the sketch's error bound is ENFORCED inside
        # the Spark plan (raise_error beyond 5% of exact), so the
        # oracle matches the deterministic columns (exact + flag)
        "approx_distinct": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_orderkey) AS exact_orders,
                   TRUE AS within_bound
            FROM lineitem GROUP BY l_returnflag
        """,
        # bpe_counts: the merge loop is enforced in-plan (ws_tokens ≤
        # bpe ≤ utf8 bytes raise_errors on violation) and the pinned
        # rows' expected counts are FROZEN literals (_BPE_PINS) — see
        # q_bpe_counts. This graduated the one rows-only entry (r7
        # verdict item 2).
        "bpe_counts": _bpe_counts_sql(),
    }
