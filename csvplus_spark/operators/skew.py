"""Skew-resilient join: explicit key salting.

AQE's skew-join handling (on by default in session.py) splits oversized
sort-merge partitions at runtime; this operator is the explicit form
for the cases AQE can't fix — e.g. a single hot key in a shuffle-hash
join, or pre-AQE clusters. No reference counterpart (the reference is
single-threaded; skew cannot exist, SURVEY §4.1).

Shape: the probe side gets a deterministic salt in [0, n); the build
side is replicated n× with every salt value; the join key becomes
(key, salt), spreading one hot key over n shuffle partitions. Cost:
build side ×n (choose n ~ hot-key partition count, keep the build side
the small one).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted and the right side
    replicated ``n_salts``×. Semantically identical to
    ``left.join(right, on, how)`` for inner/left joins — right/full
    would emit each right row's unmatched salt replicas as spurious
    null-left rows, so they are rejected (review r5)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}; put the "
            "replicated (small) side on the right or use a plain join")
    on = [on] if isinstance(on, str) else list(on)
    salt = "__cp_salt__"
    # deterministic spread: hash of the full left row tuple mod n
    lhs = left.withColumn(
        salt, F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    rhs = right.withColumn(
        salt, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lhs.join(rhs, on + [salt], how)
    return out.drop(salt)
