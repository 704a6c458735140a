"""Banded range join — interval/range predicates without the
broadcast-nested-loop trap.

No reference counterpart (the reference joins only on string equality,
SURVEY §2.3). Spark accepts range predicates in joins but plans them
as BroadcastNestedLoopJoin (O(n·m)); this operator restores an
equi-join shape by banding the range dimension:

  bin = floor(value / band_width); a row in bin b can only match rows
  in bins {b-1, b, b+1} when the match window is ≤ band_width, so one
  side explodes to its 3 candidate bins and the join key is the bin —
  a plain shuffled/broadcast equi-join, cost Σ|bin|² instead of n·m.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def within_range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows where |left_on − right_on| ≤ max_distance (numeric
    columns; cast timestamps to epoch first). Returns the joined frame;
    callers project/aggregate as needed.

    ``how`` ∈ {inner, left}: the RIGHT side is the exploded one, so
    right/full-outer would surface each right row's 2 non-matching bin
    copies as spurious null-left rows — flip the inputs instead of
    asking for a right join (review r5).
    """
    # normalize Spark's canonical aliases the same way salted_join does
    # (ADVICE r5: 'left_outer'/'leftouter' callers must not break)
    how = {"left_outer": "left", "leftouter": "left"}.get(how, how)
    if how not in ("inner", "left"):
        raise ValueError(
            f"within_range_join supports how='inner'/'left', got {how!r}; "
            "swap the inputs for right-outer semantics")
    band = float(max_distance)
    if not band > 0:
        raise ValueError(f"max_distance must be > 0, got {max_distance!r}")
    lbin = F.floor(F.col(left_on) / band)
    rbin = F.floor(F.col(right_on) / band)
    lhs = left.withColumn("__bin__", lbin)
    rhs = right.withColumn(
        "__bin__", F.explode(F.array(rbin - 1, rbin, rbin + 1))
    )
    cond = F.abs(F.col(left_on) - F.col(right_on)) <= F.lit(band)
    out = lhs.join(rhs, on=["__bin__"], how=how).filter(cond) if how == "inner" \
        else lhs.join(rhs.withColumnRenamed("__bin__", "__rbin__"),
                      (F.col("__bin__") == F.col("__rbin__")) & cond, how)
    return out.drop("__bin__", "__rbin__")
