"""Typed accessors with the reference's fail-on-bad-value contract.

Reference: ``Row.ValueAsInt`` (/root/reference/csvplus.go:163-183) and
``Row.ValueAsFloat64`` (csvplus.go:185-205) parse on demand and fail
with ``column "x": cannot convert "y" to integer``. Here the same
contract is a Column expression: ``try_cast`` + ``raise_error`` when a
non-null value fails to parse — JVM-side, codegen-friendly, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _checked_cast(col: Column | str, dtype: str, kind: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    casted = c.try_cast(dtype)
    name = col if isinstance(col, str) else "value"
    err = F.raise_error(
        F.concat(
            F.lit(f'column "{name}": cannot convert "'),
            c.cast("string"),
            F.lit(f'" to {kind}'),
        )
    )
    return F.when(c.isNotNull() & casted.isNull(), err.cast(dtype)).otherwise(casted)


def value_as_int(col: Column | str) -> Column:
    """String→integer with error on unparseable non-null values."""
    return _checked_cast(col, "long", "integer")


def value_as_double(col: Column | str) -> Column:
    """String→double with error on unparseable non-null values."""
    return _checked_cast(col, "double", "floating point")


def safe_get_value(col: Column | str, substitute: object = "") -> Column:
    """Value or substitute when absent — Row.SafeGetValue (csvplus.go:69-75)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(substitute))
