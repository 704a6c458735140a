"""CSV source — the reference's configurable ``Reader``, Spark-first.

Reference: ``Reader`` wraps Go's encoding/csv with delimiter/comment/
quote/header/field-count policy (/root/reference/csvplus.go:924-1076,
option table in SURVEY.md §2.1). Here every option compiles to a
``spark.read.csv`` option so the scan stays in the DataSource V2 path
(column pruning + filter pushdown reach the scan); the two behaviors
Spark lacks — positional header verification and error-on-missing-
column — are a one-line driver-side read of the header line.

All columns are read as strings (the reference's only type,
csvplus.go:59); ``.typed()`` opts into Spark schema inference as the
native-layer extension.
"""

from __future__ import annotations

import glob as _glob
from typing import Mapping

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError, HeaderError
from ..frame import Frame


class Reader:
    """Fluent CSV scan configuration (reference csvplus.go:936-1076)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._delimiter = ","
        self._comment: str | None = None
        self._lazy_quotes = False
        self._trim_leading = False
        self._assume_header: Mapping[str, int] | None = None
        self._expect_header: Mapping[str, int] | None = None
        self._select: list[str] | None = None
        self._num_fields: int | None = None  # None=auto, -1=any, n=exact
        self._infer = False
        self._multi_line = False

    # fluent options — csvplus.go:971-1076 -----------------------------

    def delimiter(self, c: str) -> "Reader":
        self._delimiter = c
        return self

    def comment_char(self, c: str) -> "Reader":
        self._comment = c
        return self

    def lazy_quotes(self) -> "Reader":
        self._lazy_quotes = True
        return self

    def multi_line(self) -> "Reader":
        """Allow embedded newlines inside quoted fields. Go's
        encoding/csv does this by default (reference behavior); Spark
        needs ``multiLine=true``, which makes files non-splittable —
        one task per file, so at scale prefer many medium files."""
        self._multi_line = True
        return self

    def trim_leading_space(self) -> "Reader":
        self._trim_leading = True
        return self

    def assume_header(self, spec: Mapping[str, int]) -> "Reader":
        """Headerless input: assign names to positions (csvplus.go:998-1012)."""
        self._assume_header = dict(spec)
        return self

    def expect_header(self, spec: Mapping[str, int]) -> "Reader":
        """Header must exist; verify each named column's position
        (−1 = find by name). csvplus.go:1020-1033 + 1170-1206."""
        self._expect_header = dict(spec)
        return self

    def select_columns(self, *names: str) -> "Reader":
        """Projection pushdown at scan (csvplus.go:1039-1056): Catalyst
        prunes unselected columns out of the physical read."""
        self._select = list(names)
        return self

    def num_fields(self, n: int) -> "Reader":
        self._num_fields = n
        return self

    def num_fields_any(self) -> "Reader":
        """Ragged rows allowed; short rows padded with "" (csvplus.go:1074-1076)."""
        self._num_fields = -1
        return self

    def typed(self) -> "Reader":
        """Native-layer extension: infer column types instead of
        all-strings reference semantics."""
        self._infer = True
        return self

    # ------------------------------------------------------------------

    def _read_header_line(self) -> list[str]:
        """Peek at the first physical line for the header contracts
        Spark lacks (SURVEY §2.1). Local paths use one tiny open();
        anything else (s3://, hdfs://, …) falls back to a 1-row
        spark.read.text — still O(1) I/O (one line of one file)."""
        paths = sorted(_glob.glob(self.path)) or [self.path]
        if "://" in self.path:
            rows = self.spark.read.text(self.path).limit(1).collect()
            line = rows[0][0] if rows else ""
        else:
            with open(paths[0], "r", newline="") as f:
                line = f.readline().rstrip("\r\n")
        if not line:
            raise HeaderError("missing or empty header line")
        fields = line.split(self._delimiter)
        if self._trim_leading:
            fields = [x.lstrip() for x in fields]
        return [x.strip('"') for x in fields]

    def _resolve_header(self) -> tuple[bool, list[str] | None]:
        """Returns (has_header_row, explicit_names or None).

        Mirrors makeHeader (csvplus.go:1149-1206): default = names from
        first line; assume_header = positional names, no header row;
        expect_header = header row + positional validation.
        """
        if self._assume_header is not None:
            width = max(self._assume_header.values()) + 1
            names = [f"_c{i}" for i in range(width)]
            for name, pos in self._assume_header.items():
                if pos < 0:
                    raise HeaderError(f"invalid column index for {name!r}: {pos}")
                names[pos] = name
            return False, names
        if self._expect_header is not None:
            actual = self._read_header_line()
            for name, pos in self._expect_header.items():
                if pos >= 0:
                    if pos >= len(actual) or actual[pos] != name:
                        raise HeaderError(f"misplaced column {name!r}")
                elif name not in actual:
                    raise ColumnNotFoundError([name], "expect_header")
            return True, None
        return True, None

    def to_frame(self) -> Frame:
        has_header, names = self._resolve_header()
        reader = (
            self.spark.read.option("sep", self._delimiter)
            .option("header", has_header)
            .option("inferSchema", self._infer)
            .option("mode", "PERMISSIVE" if self._num_fields == -1 else "FAILFAST")
        )
        if self._comment:
            reader = reader.option("comment", self._comment)
        if self._multi_line:
            reader = reader.option("multiLine", True)
        if self._trim_leading:
            reader = reader.option("ignoreLeadingWhiteSpace", True)
        if self._lazy_quotes:
            reader = reader.option("unescapedQuoteHandling", "STOP_AT_DELIMITER")
        df = reader.csv(self.path)
        if names is not None:
            df = df.toDF(*names[: len(df.columns)])
        if self._num_fields is not None and self._num_fields > 0:
            if len(df.columns) != self._num_fields:
                raise HeaderError(
                    f"expected {self._num_fields} fields, found {len(df.columns)}"
                )
        if self._num_fields == -1 and not self._infer:
            # reference pads short rows with "" not NULL (csvplus.go:1122-1124)
            df = df.select(*[F.coalesce(F.col(c), F.lit("")).alias(c) for c in df.columns])
        if self._select:
            missing = [c for c in self._select if c not in df.columns]
            if missing:
                raise ColumnNotFoundError(missing, "at scan")
            df = df.select(*self._select)
        return Frame(df, None, string_mode=not self._infer).with_ingest_order()


def from_file(spark: SparkSession, path: str) -> Reader:
    """Lazy CSV file source (FromFile, csvplus.go:949-960). Re-iteration
    re-reads the file — same contract as a Spark re-computation."""
    return Reader(spark, path)
