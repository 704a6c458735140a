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


# ----------------------------------------------------------------------
# flagship — the TestLongChain shape (SURVEY.md §3.1/§7.4):
# scan → filter → project → unique index → renamed-key join → prefix
# join → derive → anti-join → order → limit


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", string_mode=True)
    idx = (
        cust.filter(any_(like_({"c_mktsegment": "BUILDING"}),
                         like_({"c_mktsegment": "AUTOMOBILE"})))
        .select_columns("c_custkey", "c_name", "c_mktsegment")
        .unique_index_on("c_custkey")
        .hint_broadcast()
    )
    orders = load_table(spark, sf_dir, "orders", string_mode=True)
    li_idx = load_table(spark, sf_dir, "lineitem", string_mode=True) \
        .select_columns("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice") \
        .index_on("l_orderkey", "l_linenumber")
    bad = cust.filter(F.col("c_acctbal").cast("double") < 0).unique_index_on("c_custkey")

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
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
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
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
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
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
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
                   ROUND(SUM(o_totalprice), 2) AS total_price
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
    }
