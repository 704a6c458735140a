"""Batch event-stream analytics: funnel completion and cohort
retention (extension surface, SURVEY §2.5-adjacent — the reference is
a CSV ETL library with no event analytics).

Both operators are pure aggregate/join compositions over integer
microsecond timestamps — no windows over raw data, no per-user
serialization, engine-exact arithmetic (NOTES determinism rules) —
so both are fully oracle-replayable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_completion(df: DataFrame, steps: Sequence[str],
                      within_us: int = 24 * 3600 * 1_000_000,
                      ts_col: str = "ts", user_col: str = "user_id",
                      type_col: str = "event_type") -> DataFrame:
    """Greedy first-match funnel: per user, ``t1`` is the FIRST
    occurrence of ``steps[0]``; each later ``t{i}`` is the first
    occurrence of ``steps[i-1]`` at or after ``t{i-1}`` and within
    ``within_us`` of it. Returns one row per user that started the
    funnel: ``(user_id, t1_us..tN_us, completed)``.

    Greedy-from-first semantics (the industry-standard "strict order,
    first touch" funnel): a user whose first view leads nowhere but
    whose SECOND view converts counts as not-converted — that is the
    documented tradeoff of every O(events) funnel; a backtracking
    matcher is quadratic per user.

    Scale shape: one filtered min-aggregate per step plus an equi-join
    per step boundary, all keyed on user — Catalyst plans them as one
    shuffle lineage on ``user_col``; timestamps compare as exact
    unix_micros integers.
    """
    if len(steps) < 2:
        raise ValueError("funnel_completion: need at least 2 steps")
    us = F.unix_micros(F.col(ts_col))
    ev = df.select(F.col(user_col).alias("user_id"),
                   F.col(type_col).alias("__t__"), us.alias("__us__"))
    cur = (ev.filter(F.col("__t__") == steps[0])
           .groupBy("user_id").agg(F.min("__us__").alias("t1_us")))
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("__t__") == step).select(
            F.col("user_id").alias("__u__"), F.col("__us__"))
        prev = f"t{i - 1}_us"
        cur = (cur.join(nxt,
                        (F.col("user_id") == F.col("__u__"))
                        & (F.col("__us__") >= F.col(prev))
                        & (F.col("__us__") <= F.col(prev) + within_us),
                        "left")
               .groupBy(*[c for c in cur.columns])
               .agg(F.min("__us__").alias(f"t{i}_us")))
    last = f"t{len(steps)}_us"
    return cur.withColumn("completed", F.col(last).isNotNull())


def cohort_retention(df: DataFrame, period_us: int = 7 * 24 * 3600
                     * 1_000_000, ts_col: str = "ts",
                     user_col: str = "user_id") -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event (``floor(min_ts / period)``); for every
    (cohort, offset) cell, the count of distinct cohort users with
    any event in ``cohort_period + offset``. Returns
    ``(cohort_period, period_offset, n_users)``.

    Scale shape: one min-aggregate (cohorts), one join back on user,
    one distinct-count aggregate — all shuffles keyed on user /
    (cohort, offset). Period math is exact integer division of
    unix_micros.
    """
    us = F.unix_micros(F.col(ts_col))
    ev = df.select(F.col(user_col).alias("user_id"), us.alias("__us__"))
    # exact-integer FLOOR division (subtract the non-negative pmod
    # remainder, then the division is exact): `div` truncates toward
    # zero, so pre-epoch (negative-µs) timestamps would land in the
    # wrong cohort and produce inconsistent offsets; float floor(x/p)
    # would sit on a 2^53 boundary for large µs. DuckDB's integer `//`
    # ALSO truncates (r8 review: -1 // p = 0), so the oracle applies
    # the same posmod floor — both engines identical for ALL inputs.
    cohort = (ev.groupBy("user_id")
              .agg(F.min("__us__").alias("__m__"))
              .select("user_id",
                      F.expr(f"(__m__ - pmod(__m__, {period_us}))"
                             f" div {period_us}")
                      .alias("cohort_period")))
    return (ev.join(cohort, "user_id")
            .select("user_id", "cohort_period",
                    (F.expr(f"(__us__ - pmod(__us__, {period_us}))"
                            f" div {period_us}")
                     - F.col("cohort_period")).alias("period_offset"))
            .groupBy("cohort_period", "period_offset")
            .agg(F.count_distinct("user_id").alias("n_users")))


def last_touch_attribution(df: DataFrame, conversion: str = "purchase",
                           user_col: str = "user_id",
                           type_col: str = "event_type",
                           ts_col: str = "ts",
                           id_col: str = "event_id") -> DataFrame:
    """Last-touch conversion attribution: for each user who converts,
    the LAST non-conversion event strictly before their FIRST
    conversion — the standard marketing-attribution primitive.

    Total order is (epoch-µs, event id), so simultaneous events break
    ties deterministically and identically across engines. Shape: one
    per-user min aggregate over conversions (broadcast-joined back),
    one filtered per-user window (partitioned — parallel across
    users); users whose first conversion has no prior event drop out
    (inner semantics).

    Returns (user_id, first_conv_us, attributed_type, attributed_us,
    attributed_event_id).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    ev = df.select(F.col(user_col), F.col(type_col), F.col(id_col),
                   us.alias("__us__"))
    first_conv = (
        ev.filter(F.col(type_col) == conversion)
        .groupBy(user_col)
        .agg(F.min(F.struct(F.col("__us__"), F.col(id_col))).alias("__fc__"))
        .select(F.col(user_col),
                F.col("__fc__")["__us__"].alias("first_conv_us"),
                F.col("__fc__")[id_col].alias("__fc_id__"))
    )
    prior = (
        ev.filter(F.col(type_col) != conversion)
        .join(first_conv, user_col)
        .filter((F.col("__us__") < F.col("first_conv_us"))
                | ((F.col("__us__") == F.col("first_conv_us"))
                   & (F.col(id_col) < F.col("__fc_id__"))))
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col("__us__").desc(), F.col(id_col).desc())
    return (prior.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .select(user_col, "first_conv_us",
                    F.col(type_col).alias("attributed_type"),
                    F.col("__us__").alias("attributed_us"),
                    F.col(id_col).alias("attributed_event_id")))
