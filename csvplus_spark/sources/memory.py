"""In-memory rows source (TakeRows, /root/reference/csvplus.go:218-222).

The reference clones rows defensively on iteration (csvplus.go:230);
Spark rows are immutable so the contract is automatic.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import SparkSession

from ..frame import Frame


def take_rows(spark: SparkSession, rows: Iterable[Mapping], schema=None,
              string_mode: bool = True) -> Frame:
    rows = list(rows)
    if schema is None and rows and string_mode:
        # reference rows are map[string]string: union of keys, strings
        cols = sorted({k for r in rows for k in r})
        schema = ", ".join(f"{c} string" for c in cols)
        rows = [{c: (None if r.get(c) is None else str(r.get(c))) for c in cols} for r in rows]
    if schema is None and not rows:
        # TakeRows() with no rows is a valid empty source in the
        # reference (csvplus.go:218-222) — zero columns, zero rows
        from pyspark.sql.types import StructType

        schema = StructType([])
    df = spark.createDataFrame(rows, schema=schema)
    return Frame(df, None, string_mode).with_ingest_order()


def from_csv_text(spark: SparkSession, text: str, delimiter: str = ",",
                  header: bool = True) -> Frame:
    """CSV from an in-memory string — FromReader/FromReadCloser
    (/root/reference/csvplus.go:936-947). Parsed driver-side (the
    reference's io.Reader is inherently single-node input); unlike the
    reference's single-shot stream, the resulting Frame is re-iterable.
    """
    import csv as _csv
    import io

    # blank lines are SKIPPED, not width-checked: Go encoding/csv skips
    # empty records entirely and the file Reader's width check filters
    # length==0 lines — pasted text with a trailing/interior blank line
    # must parse the same way here (review r6). Physical line numbers
    # are kept for error messages.
    numbered = [(ln, r) for ln, r in
                enumerate(_csv.reader(io.StringIO(text), delimiter=delimiter),
                          start=1) if r]
    if not numbered:
        raise ValueError("empty CSV input")
    if header:
        names, data = numbered[0][1], numbered[1:]
    else:
        names = [f"_c{i}" for i in range(len(numbered[0][1]))]
        data = numbered
    for ln, r in data:
        if len(r) != len(names):
            # Go encoding/csv (FieldsPerRecord auto) rejects ANY width
            # mismatch — over-wide drops data silently, short rows are
            # equally an error (review r6: the old short-row "" padding
            # made this entry point disagree with the file Reader's
            # FAILFAST default on the same content)
            raise ValueError(
                f"record on line {ln}: wrong number of fields: "
                f"{len(r)} != {len(names)}")
    dicts = [{n: r[i] for i, n in enumerate(names)} for _, r in data]
    return take_rows(spark, dicts, schema=", ".join(f"`{n}` string" for n in names))
