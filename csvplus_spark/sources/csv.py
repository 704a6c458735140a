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
import os as _os
from typing import Mapping

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError, HeaderError
from ..frame import Frame


def _delim_outside_quotes(delimiter: str) -> str:
    """Regex matching ``delimiter`` only OUTSIDE double-quoted cells
    ("" doubling keeps the quote count even). The header peek's split
    and the width check's field count MUST agree on the quoting
    dialect — one pattern, two call sites (review r6)."""
    import re as _re

    return _re.escape(delimiter) + '(?=(?:[^"]*"[^"]*")*[^"]*$)'


def _unquote_cell(x: str) -> str:
    """CSV-unquote one header cell the way the scan's parser does:
    strip ONE surrounding quote pair and unescape doubled quotes inside
    it. A bare ``strip('"')`` is wrong twice over (ADVICE r5): it eats
    every leading/trailing quote (``"a""b"`` → ``a""b``) and never
    unescapes, so expect_header would spuriously mismatch the parsed
    column name (``a"b``)."""
    if len(x) >= 2 and x.startswith('"') and x.endswith('"'):
        return x[1:-1].replace('""', '"')
    return x


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
        self._width_auto = False  # per-row first-line-width contract
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
        """Exact field-count contract (csvplus.go:1060-1067): the schema
        must be ``n`` wide AND every row must have exactly ``n`` fields —
        a mid-file short/long row fails with its line number (lazy,
        fused into the plan; see ``_with_width_check``)."""
        self._num_fields = n
        return self

    def num_fields_auto(self) -> "Reader":
        """Checked auto mode (csvplus.go:1069-1071, FieldsPerRecord=0
        semantics): the first line fixes the width, any later line with
        a different field count fails with its line number. Opt-in
        because the per-row check costs one extra narrow text scan."""
        self._width_auto = True
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
        if _os.path.isdir(paths[0]):
            # directory source (the streaming landing-zone case): peek
            # the first file inside
            inner = sorted(p for p in _glob.glob(_os.path.join(paths[0], "*"))
                           if _os.path.isfile(p))
            if not inner:
                raise HeaderError("missing or empty header line")
            paths = inner
        def _skip(ln: str) -> bool:
            # the header is the first line Spark's parser would treat
            # as one: blank lines and comment lines are skipped by the
            # scan, so the peek must skip them too (review r6 — a file
            # starting with '#generated\n' must validate against the
            # REAL header, not the comment)
            return ln == "" or (self._comment is not None
                                and ln.startswith(self._comment))

        if "://" in self.path:
            # remote peek: list the matching files through the path's
            # own Hadoop FileSystem, pick the FIRST file by sorted URI
            # (the same lexicographic rule the local branch uses on its
            # glob, so multi-file reads validate the same header on
            # every scheme — ADVICE r6), and scan ONLY that file. The
            # old form ran a TakeOrdered over every line of every file
            # — a full-corpus text pass before the real read (ADVICE
            # r6, medium). Line order within the file is still proved
            # by (split byte offset, within-split id) — splits are
            # scheduled by SIZE, not offset.
            first_file = self._first_remote_file()
            txt = (
                self.spark.read.text(first_file)
                .select(F.col("value"),
                        F.col("_metadata.file_block_start").alias("__bs__"),
                        F.monotonically_increasing_id().alias("__lid__"))
                .orderBy("__bs__", "__lid__")
            )
            # geometric fallback instead of a hard cap (ADVICE r6): a
            # valid file may open with arbitrarily many comment/blank
            # lines; keep widening the prefix until a header line or
            # true EOF appears
            line, n = "", 1024
            while True:
                rows = txt.limit(n).collect()
                line = next((r["value"] for r in rows
                             if not _skip(r["value"])), "")
                if line or len(rows) < n:
                    break
                n *= 8
        else:
            line = ""
            with open(paths[0], "r", newline="") as f:
                for raw in f:
                    cand = raw.rstrip("\r\n")
                    if not _skip(cand):
                        line = cand
                        break
        if not line:
            raise HeaderError("missing or empty header line")
        # quote-aware split: a quoted header cell may CONTAIN the
        # delimiter (review r5: a,"b,c",d must yield 3 names, matching
        # the scan's own parse) — same delimiter-outside-quotes regex
        # the width check uses
        import re as _re

        fields = _re.split(_delim_outside_quotes(self._delimiter), line)
        if self._trim_leading:
            fields = [x.lstrip() for x in fields]
        return [_unquote_cell(x) for x in fields]

    def _first_remote_file(self) -> str:
        """First data file of a remote (``scheme://``) path by sorted
        URI — globStatus + a RECURSIVE listing per matched directory
        (review r7: one-level listStatus missed files nested under
        hive ``key=value`` partition dirs, which the scan itself
        resolves), metadata-only, no data read. Hidden/underscore
        files and directories (``_SUCCESS``, ``.crc``, ``_tmp/``) are
        skipped, matching what Spark's scan ignores."""
        jvm = self.spark.sparkContext._jvm
        _Path = jvm.org.apache.hadoop.fs.Path
        p = _Path(self.path)
        fs = p.getFileSystem(self.spark.sparkContext._jsc.hadoopConfiguration())
        statuses = fs.globStatus(p)
        files: list[str] = []
        for st in (statuses or []):
            root = st.getPath().toString().rstrip("/") + "/"
            if st.isDirectory():
                it = fs.listFiles(st.getPath(), True)  # recursive
                while it.hasNext():
                    uri = it.next().getPath().toString()
                    # hidden-filter only segments BELOW the matched
                    # root (the user's own path may contain dots);
                    # a file under _tmp/ is invisible to the scan too
                    rel = uri[len(root):] if uri.startswith(root) else uri
                    if any(seg.startswith(("_", "."))
                           for seg in rel.split("/") if seg):
                        continue
                    files.append(uri)
            else:
                # directly-matched files get the same hidden filter on
                # the FINAL segment (a glob like dir/* matches _SUCCESS
                # and .crc sidecars, which the scan itself ignores) —
                # parent segments belong to the user's own path and may
                # legitimately contain dots
                name = st.getPath().getName()
                if name.startswith(("_", ".")):
                    continue
                files.append(st.getPath().toString())
        files = sorted(files)
        if not files:
            raise HeaderError("missing or empty header line")
        return files[0]

    def _resolve_header(self) -> tuple[bool, list[str] | None]:
        """Returns (has_header_row, explicit_names or None).

        Mirrors makeHeader (csvplus.go:1149-1206): default = names from
        first line; assume_header = positional names, no header row;
        expect_header = header row + positional validation.
        """
        if self._assume_header is not None:
            # ONE implementation of the positional-naming contract —
            # shared with the explicit-schema to_stream path (review
            # r6: the two copies had to be kept in sync by hand)
            return False, self._header_names()
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

    def _with_width_check(self, df):
        """Fuse the per-row field-count contract into the plan.

        Reference semantics (csvplus.go:1060-1071 via Go encoding/csv
        FieldsPerRecord): a row whose field count breaks the contract
        aborts the read with its line number. Spark's CSV parser
        null-pads short rows and drops extra tokens without flagging
        them, so the contract needs its own narrow pass: a lazy
        line-level scan computes each line's quote-aware field count,
        two tiny aggregates reduce that to ONE broadcastable row
        (first offending line + its ordinal), and a conditional
        ``raise_error`` on that row is crossJoined into the main plan —
        no extra jobs, error at first action, message carries the
        1-based line number (counted over non-comment, non-blank lines,
        header included — Go csv counts the header line too).

        The contract is PER FILE, matching Go's FieldsPerRecord
        (csvplus.go:1060-1071): on a directory/glob read, auto mode
        fixes the expected width from the first line of EACH file, and
        the reported line ordinal counts within the offending file
        (named in the message when the read spans several files).
        """
        if self._multi_line:
            raise HeaderError(
                "per-row field-count checks are line-based and cannot be "
                "combined with multi_line()"
            )
        pat = _delim_outside_quotes(self._delimiter)
        txt = self.spark.read.text(self.path)
        if self._comment:
            txt = txt.filter(~F.col("value").startswith(self._comment))
        txt = txt.filter(F.length("value") > 0)
        # file order must be PROVABLE, not assumed: FileSourceScan
        # orders partitions by split size, not file offset, so a bare
        # monotonically_increasing_id can rank a later split's lines
        # before an earlier split's (review r6). The _metadata
        # file_block_start column gives each row its split's byte
        # offset; (block_start, within-partition id) sorts lines in
        # true file order regardless of how splits were scheduled.
        w = txt.select(
            F.input_file_name().alias("__f__"),
            F.struct(
                F.col("_metadata.file_block_start").alias("bs"),
                F.monotonically_increasing_id().alias("lid"),
            ).alias("__ord__"),
            F.size(F.split("value", pat, -1)).alias("__w__"),
        )
        if self._num_fields is not None and self._num_fields > 0:
            w = w.withColumn("__exp__", F.lit(self._num_fields))
        else:  # auto: the first line of EACH file fixes that file's width
            firsts = w.groupBy("__f__").agg(
                F.min_by("__w__", "__ord__").alias("__exp__"))
            w = w.join(F.broadcast(firsts), "__f__")
        bad = w.filter(F.col("__w__") != F.col("__exp__")) \
            .agg(F.min(F.struct("__ord__", "__f__", "__w__", "__exp__")).alias("__b__"))
        chk = (
            w.crossJoin(F.broadcast(bad))
            .agg(
                F.first("__b__").alias("__b__"),
                # line ordinal within the offending file only
                F.sum(F.when((F.col("__f__") == F.col("__b__.__f__"))
                             & (F.col("__ord__") <= F.col("__b__.__ord__")), 1))
                .alias("__bline__"),
                F.count_distinct(F.col("__f__")).alias("__nf__"),
            )
        )
        msg = F.concat(
            F.lit("wrong number of fields: "),
            # name the file only on multi-file reads (single-file message
            # stays reference-identical)
            F.when(F.col("__nf__") > 1,
                   F.concat(F.element_at(F.split(F.col("__b__.__f__"), "/"), -1),
                            F.lit(" "))).otherwise(F.lit("")),
            F.lit("line "),
            F.col("__bline__").cast("string"),
            F.lit(" has "), F.col("__b__.__w__").cast("string"),
            F.lit(" fields, expected "), F.col("__b__.__exp__").cast("string"),
        )
        # the conditional error is fused into EVERY column — wiring it
        # into just one lets Catalyst prune the check away whenever a
        # downstream projection drops that column (review r5: a
        # select_columns("b") over a width-violating file returned rows
        # silently). Reading ANY column now trips the contract; only a
        # pure count(*) (no columns materialized) can skip it.
        return df.crossJoin(F.broadcast(chk)).select(*[
            F.when(F.col("__b__").isNotNull(),
                   F.raise_error(msg).cast(df.schema[c].dataType))
            .otherwise(F.col(c)).alias(c)
            for c in df.columns
        ])

    def _apply_options(self, reader, has_header: bool):
        reader = (
            reader.option("sep", self._delimiter)
            .option("header", has_header)
            .option("inferSchema", self._infer)
            .option("mode", "PERMISSIVE" if self._num_fields == -1 else "FAILFAST")
            # RFC-4180 doubled-quote escaping, the reference's (Go
            # encoding/csv) quoting dialect: "a""b" parses as a"b.
            # Spark's default escape is backslash, under which doubled
            # quotes pass through RAW — a silent value divergence on
            # any quoted data (found via ADVICE r5's header-peek item;
            # matrix pinned by test_strict_quote_parsing)
            .option("escape", '"')
        )
        if self._comment:
            reader = reader.option("comment", self._comment)
        if self._multi_line:
            reader = reader.option("multiLine", True)
        if self._trim_leading:
            reader = reader.option("ignoreLeadingWhiteSpace", True)
        if self._lazy_quotes:
            # closest univocity analogue of Go's LazyQuotes
            # (csvplus.go:984-987). Fidelity matrix vs Go encoding/csv,
            # pinned by test_csv_reader.py::test_lazy_quotes_fidelity:
            #   x"y        -> x"y   (match)
            #   "x""y"     -> x"y   (match; STOP_AT_* modes break this)
            #   "x"y"      -> xy    (Go: x"y")   <- known divergence
            #   "1,z,w EOF -> error (Go: accepts to EOF) <- known divergence
            reader = reader.option("unescapedQuoteHandling", "BACK_TO_DELIMITER")
        return reader

    def _postprocess(self, df, names):
        """Header-naming contract, width checks, ''-padding, and scan
        projection — shared verbatim by the batch and streaming paths."""
        if names is not None:
            if len(df.columns) < len(names):
                gone = [n for i, n in enumerate(names) if i >= len(df.columns)]
                raise HeaderError(
                    f"assumed header declares {len(names)} fields but the "
                    f"file has only {len(df.columns)} "
                    f"(missing: {', '.join(map(repr, gone))})"
                )
            # extra undeclared trailing columns keep Spark's _cN names
            full = names + [f"_c{i}" for i in range(len(names), len(df.columns))]
            df = df.toDF(*full)
        if self._num_fields is not None and self._num_fields > 0:
            if len(df.columns) != self._num_fields:
                raise HeaderError(
                    f"expected {self._num_fields} fields, found {len(df.columns)}"
                )
        if (self._num_fields is not None and self._num_fields > 0) or self._width_auto:
            df = self._with_width_check(df)
        if self._num_fields == -1 and not self._infer:
            # reference pads short rows with "" not NULL (csvplus.go:1122-1124)
            df = df.select(*[F.coalesce(F.col(c), F.lit("")).alias(c) for c in df.columns])
        if self._select:
            missing = [c for c in self._select if c not in df.columns]
            if missing:
                raise ColumnNotFoundError(missing, "at scan")
            df = df.select(*self._select)
        return df

    def to_frame(self) -> Frame:
        has_header, names = self._resolve_header()
        df = self._apply_options(self.spark.read, has_header).csv(self.path)
        df = self._postprocess(df, names)
        return Frame(df, None, string_mode=not self._infer).with_ingest_order()

    def to_stream(self, max_files_per_trigger: int | None = None,
                  schema=None, header: bool | None = None):
        """Structured Streaming twin of :meth:`to_frame`: watch ``path``
        as a directory of arriving CSV files with the same option
        surface and header/naming/padding contract (reference format,
        unbounded arrival — e.g. a crawler landing zone).

        Schema: pass ``schema`` explicitly (StructType or DDL string)
        for a cold start on an EMPTY landing directory and for large
        ``typed()`` directories — without it, the schema comes from a
        batch probe of the files already present, which for untyped
        readers is header metadata but for ``typed()`` readers runs
        Spark's inferSchema scan over the existing files.

        Per-row width checks (``num_fields(k)``/``num_fields_auto``)
        are BATCH-ONLY: their line-number lineage needs a static text
        snapshot (and monotonically_increasing_id, which streaming
        forbids) — requesting them here raises immediately instead of
        failing at stream start. ``num_fields_any`` ''-padding and the
        scan projection are plain Column exprs and apply per
        micro-batch.

        WITH AN EXPLICIT ``schema`` the header policy must also be
        explicit (ADVICE r5: the old default silently treated every
        arriving file as header-first, eating record one of headerless
        landing zones): pass ``assume_header(...)`` (headerless,
        positional names), ``expect_header(...)`` (header row present —
        note its eager first-row VALIDATION is SKIPPED in this path, a
        cold start has no file to validate; each file's header line is
        still consumed as a header), or ``header=True/False`` to state
        the layout directly. ``header=`` always wins when given.
        Returns a streaming DataFrame (no ingest order — arrival order
        is not meaningful across micro-batches; use ``fingerprinted``/
        ``stream_dedup`` downstream for ingest dedup).
        """
        if (self._num_fields is not None and self._num_fields > 0) \
                or self._width_auto:
            raise HeaderError(
                "per-row field-count checks are batch-only (line-number "
                "lineage needs a static file snapshot); use "
                "num_fields_any() for streams, or validate widths in a "
                "foreachBatch sink"
            )
        if schema is None:
            has_header, names = self._resolve_header()
        else:
            if (header is None and self._assume_header is None
                    and self._expect_header is None):
                raise HeaderError(
                    "to_stream(schema=...) needs an explicit header "
                    "policy: assume_header() for headerless files, "
                    "expect_header() when files carry one, or "
                    "header=True/False"
                )
            has_header, names = (self._assume_header is None,
                                 self._header_names())
        if header is not None:
            has_header = header
        if schema is None:
            schema = self._apply_options(
                self.spark.read, has_header).csv(self.path).schema
        reader = self._apply_options(
            self.spark.readStream.schema(schema), has_header)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return self._postprocess(reader.csv(self.path), names)

    def _header_names(self):
        """assume_header positional names without touching any file
        (the explicit-schema cold-start path). Validates positions like
        the batch path — a negative index must raise, not silently
        overwrite the last slot (review r5)."""
        if self._assume_header is None:
            return None
        for name, pos in self._assume_header.items():
            if pos < 0:
                raise HeaderError(f"invalid column index for {name!r}: {pos}")
        width = max(self._assume_header.values()) + 1
        names = [f"_c{i}" for i in range(width)]
        for name, pos in self._assume_header.items():
            names[pos] = name
        return names


def from_file(spark: SparkSession, path: str) -> Reader:
    """Lazy CSV file source (FromFile, csvplus.go:949-960). Re-iteration
    re-reads the file — same contract as a Spark re-computation."""
    return Reader(spark, path)
