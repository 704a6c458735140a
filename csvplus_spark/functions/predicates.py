"""Predicate vocabulary compiled to native Column expressions.

Reference counterparts (all Go closures over ``Row``):
  - ``Like(match Row)``  — /root/reference/csvplus.go:1279-1293
  - ``All(funcs...)``    — /root/reference/csvplus.go:1243-1253
  - ``Any(funcs...)``    — /root/reference/csvplus.go:1258-1268
  - ``Not(pred)``        — /root/reference/csvplus.go:1271-1275

Compiling these to Catalyst ``Column`` expressions (instead of Python
UDFs) keeps filters inside whole-stage codegen and lets them push down
to the parquet/CSV scan — mandatory at 100 TB.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def like_(match: Mapping[str, object], string_mode: bool = True) -> Column:
    """Row matches all name→value pairs (string equality in compat mode).

    Reference equality is raw-string compare (csvplus.go:1284-1291), so
    ``string_mode=True`` casts the column to string before comparing.
    """
    if not match:
        raise ValueError("empty 'like' condition")  # reference panics (csvplus.go:1280-1282)
    conds = []
    for name, value in match.items():
        col = F.col(name)
        if string_mode:
            conds.append(col.cast("string") == F.lit(str(value)))
        else:
            conds.append(col == F.lit(value))
    return reduce(Column.__and__, conds)


def all_(*conds: Column) -> Column:
    """AND of predicates (csvplus.go:1243-1253)."""
    if not conds:
        raise ValueError("empty list of conditions")
    return reduce(Column.__and__, conds)


def any_(*conds: Column) -> Column:
    """OR of predicates (csvplus.go:1258-1268)."""
    if not conds:
        raise ValueError("empty list of conditions")
    return reduce(Column.__or__, conds)


def not_(cond: Column) -> Column:
    """Negation (csvplus.go:1271-1275)."""
    return ~cond
