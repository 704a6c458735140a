"""As-of (nearest-event) join — an operator Spark's join catalog lacks.

No reference counterpart (the reference has only inner equi / anti
joins, SURVEY.md §2.3); this is the time-series extension a
training-data pipeline needs (align events to the latest prior state).

Scale-first design: NOT a range join (which Catalyst would plan as a
broadcast-nested-loop over an inequality). Instead the classic
union-merge shape:

  1. tag left rows (0) and right rows (1), unionByName;
  2. one window per ``by`` key ordered by (ts, tag): ``last(right
     payload, ignorenulls)`` carries the most recent right row forward;
  3. keep left rows, attach the carried payload.

One shuffle keyed by ``by``, O(n log n) per key in the sort — the same
plan a hand-written merge join would give, expressed declaratively.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str = (),
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    strict: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest right row by ``on``.

    direction='backward': latest right row with ts <= left.ts
    (ts < left.ts when ``strict``); 'forward': earliest right row with
    ts >= left.ts (>), symmetric via a descending window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    right_cols = list(right_cols or [c for c in right.columns if c not in (*by, on)])

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof_payload__")
    # the window scans in "time reaches me" order (asc for backward,
    # desc for forward); within equal timestamps the tag decides
    # visibility: right rows sort before left ones iff ties match
    # (non-strict), after them iff strict — same rule both directions
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lhs = left.withColumn("__asof_tag__", F.lit(l_tag)).withColumn(
        "__asof_payload__", F.lit(None).cast(
            right.select(payload).schema["__asof_payload__"].dataType)
    )
    # a right row with an unknown (NULL) timestamp can never be "the
    # nearest state": under the ascending window NULL sorts FIRST, so
    # an unfiltered NULL right row would be carried into EVERY left
    # row until the next real right row — silent wrong matches
    rhs = right.filter(F.col(on).isNotNull()).select(
        *by, F.col(on),
        F.lit(r_tag).alias("__asof_tag__"),
        payload,
    )
    allrows = lhs.unionByName(rhs, allowMissingColumns=True)

    asc = direction == "backward"
    order = [F.col(on).asc() if asc else F.col(on).desc(),
             F.col("__asof_tag__").asc()]
    w = (
        Window.partitionBy(*by).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = allrows.withColumn(
        "__asof_match__",
        # a LEFT row with a NULL timestamp matches nothing either: in
        # the descending (forward) window NULLs sort last and would
        # pick up whatever payload was carried to the end of the key
        F.when(F.col(on).isNotNull(),
               F.last("__asof_payload__", ignorenulls=True).over(w))
    )
    out = carried.filter(F.col("__asof_tag__") == l_tag).drop(
        "__asof_tag__", "__asof_payload__"
    )
    for c in right_cols:
        name = c if c not in left.columns else f"{c}{suffix}"
        out = out.withColumn(name, F.col(f"__asof_match__.{c}"))
    return out.drop("__asof_match__")
