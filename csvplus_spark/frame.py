"""``Frame`` — the engine's DataSource: a lazy, fluent DataFrame wrapper.

Reference model: ``DataSource func(RowFunc) error`` — a lazy chain of
closures, executed only by a terminal call (/root/reference/
csvplus.go:207-256, README.md:85-88). Here the chain IS the Catalyst
logical plan: every combinator returns a new ``Frame`` wrapping a new
(still-unexecuted) DataFrame, and terminal ops (``to_rows``,
``to_csv_file``, …) are Spark actions.

Two semantics knobs, per SURVEY.md §7:
  * ``string_mode`` — reference compatibility: comparisons/sorts on
    raw strings (``"10" < "2"``), csvplus.go:794-807/907-920.
  * ``order`` — the declared row order (SURVEY.md §7 H1). DataFrames
    are unordered; order-dependent ops (``top``/``drop``/
    ``take_while``/``drop_while``) compile against this declared order
    instead of an implicit file order.

Scale notes: all combinators are narrow or Catalyst-planned (pushdown,
pruning and join selection are free). The total-order ops
(take_while/drop_while/drop) compile to two-pass scalar cutoffs —
parallel top-k subquery + parallel filter — never a single-partition
sort or global window (plan-guarded in tests/test_guards.py and
tests/test_order_ops.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable, Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .errors import ColumnNotFoundError
from .functions.predicates import like_

if TYPE_CHECKING:
    from .index import Index

#: hidden lineage column carrying ingest order for order-dependent ops
ROW_ID = "__cp_row_id__"


def _as_list(cols) -> list[str]:
    if isinstance(cols, str):
        return [cols]
    return list(cols)


class Frame:
    """A lazy row stream with a declared order.

    ``order`` is a list of ``(column_name, ascending)`` pairs, or None
    when the stream has no defined order.
    """

    def __init__(
        self,
        df: DataFrame,
        order: Sequence[tuple[str, bool]] | None = None,
        string_mode: bool = False,
    ):
        self._df = df
        self.order = list(order) if order else None
        self.string_mode = string_mode

    # ------------------------------------------------------------------
    # plumbing

    @property
    def df(self) -> DataFrame:
        """Underlying DataFrame without hidden lineage columns."""
        hidden = [c for c in self._df.columns if c.startswith("__cp_")]
        return self._df.drop(*hidden) if hidden else self._df

    @property
    def columns(self) -> list[str]:
        return [c for c in self._df.columns if not c.startswith("__cp_")]

    def _wrap(self, df: DataFrame, order="keep") -> "Frame":
        if order == "keep":
            order = self.order
            if order:  # drop order columns that no longer exist
                cols = set(df.columns)
                if not all(c in cols for c, _ in order):
                    order = None
        return Frame(df, order, self.string_mode)

    def _require(self, columns: Iterable[str], context: str) -> None:
        missing = [c for c in columns if c not in self._df.columns]
        if missing:
            raise ColumnNotFoundError(missing, context)

    def _sort_key(self, name: str) -> Column:
        c = F.col(name)
        # engine lineage columns (__cp_*) are numeric by construction and
        # must never get lexicographic treatment
        if self.string_mode and not name.startswith("__cp_"):
            return c.cast("string")
        return c

    def _order_cols(self) -> list[Column]:
        if not self.order:
            raise ValueError(
                "this operation is order-dependent but the Frame has no "
                "declared order; call .ordered_by(...) or .with_ingest_order() first"
            )
        return [
            self._sort_key(c).asc() if asc else self._sort_key(c).desc()
            for c, asc in self.order
        ]

    def ordered_df(self) -> DataFrame:
        """DataFrame sorted by the declared order (no-op when unordered)."""
        df = self._df
        if self.order:
            df = df.orderBy(*self._order_cols())
        hidden = [c for c in df.columns if c.startswith("__cp_")]
        return df.drop(*hidden) if hidden else df

    def ordered_by(self, *columns: str, ascending: bool | Sequence[bool] = True) -> "Frame":
        """Declare (and establish) a row order by the given columns."""
        cols = _as_list(columns)
        self._require(cols, "ordered_by")
        if isinstance(ascending, bool):
            asc = [ascending] * len(cols)
        else:
            asc = list(ascending)
        return Frame(self._df, list(zip(cols, asc)), self.string_mode)

    def with_ingest_order(self) -> "Frame":
        """Attach a monotonically increasing row id as the declared order.

        Stands in for the reference's file order (SURVEY.md §7 H1); ids
        are increasing within and across partitions in scan order.
        """
        if ROW_ID in self._df.columns:
            return self
        df = self._df.withColumn(ROW_ID, F.monotonically_increasing_id())
        return Frame(df, [(ROW_ID, True)], self.string_mode)

    # ------------------------------------------------------------------
    # projections — reference csvplus.go:493-525

    def select_columns(self, *columns: str) -> "Frame":
        """Strict projection; raises on missing columns.

        Reference: DataSource.SelectColumns (csvplus.go:511-525);
        panics on an empty list (csvplus.go:512-514).
        """
        cols = _as_list(columns)
        if not cols:
            raise ValueError("empty list of columns")
        self._require(cols, "select_columns")
        keep = cols + [c for c in self._df.columns if c.startswith("__cp_")]
        return self._wrap(self._df.select(*keep))

    def drop_columns(self, *columns: str) -> "Frame":
        """Tolerant column drop (csvplus.go:493-507)."""
        cols = _as_list(columns)
        if not cols:
            raise ValueError("empty list of columns")
        return self._wrap(self._df.drop(*cols))

    # ------------------------------------------------------------------
    # filters / row transforms — reference csvplus.go:262-310

    def filter(self, cond: Column | Mapping[str, object]) -> "Frame":
        """Keep rows where the condition holds (csvplus.go:276-286).

        Accepts a Column expression or a Like-style mapping
        (csvplus.go:1279-1293).
        """
        if isinstance(cond, Mapping):
            cond = like_(cond, string_mode=self.string_mode)
        return self._wrap(self._df.filter(cond))

    def where(self, cond) -> "Frame":
        return self.filter(cond)

    def with_columns(self, **exprs: Column) -> "Frame":
        """Declarative Map: add/replace columns (csvplus.go:290-296)."""
        return self._wrap(self._df.withColumns(dict(exprs)))

    def map_rows(self, fn: Callable, schema) -> "Frame":
        """Arbitrary row transform via Arrow-batched pandas iterator.

        The general form of Map/Transform (csvplus.go:262-296) for
        callables the Column algebra can't express. ``fn`` takes and
        yields ``pandas.DataFrame`` batches (mapInPandas contract), so
        it may drop rows (Transform's empty-row drop, csvplus.go:268)
        or add columns. Vectorized over Arrow batches — never per-row.

        Row lineage (SURVEY §7 H5, DataSourceError{Line} analogue): when
        the Frame carries ingest order, a callback exception is re-raised
        with the ingest row-id range of the batches this worker had
        consumed, instead of a bare PythonException.
        """
        if ROW_ID not in self._df.columns:
            return Frame(self._df.mapInPandas(fn, schema), None, self.string_mode)
        user_fn = fn

        def _with_lineage(it):
            seen = {"lo": None, "hi": None}

            def feed():
                for pdf in it:
                    if ROW_ID in pdf.columns and len(pdf):
                        lo, hi = int(pdf[ROW_ID].min()), int(pdf[ROW_ID].max())
                        seen["lo"] = lo if seen["lo"] is None else min(seen["lo"], lo)
                        seen["hi"] = hi if seen["hi"] is None else max(seen["hi"], hi)
                    yield pdf

            try:
                yield from user_fn(feed())
            except Exception as exc:
                rng = ("" if seen["lo"] is None else
                       f" (ingest row-id range [{seen['lo']}, {seen['hi']}]"
                       " in this partition)")
                raise RuntimeError(f"map_rows callback failed{rng}: {exc}") from exc

        return Frame(self._df.mapInPandas(_with_lineage, schema), None,
                     self.string_mode)

    def transform_rows(self, fn: Callable, schema) -> "Frame":
        """Alias of :meth:`map_rows` kept for reference-name parity
        (Transform, csvplus.go:262-272)."""
        return self.map_rows(fn, schema)

    def validate(self, cond: Column, message: str = "validation failed",
                 eager: bool = True) -> "Frame":
        """Fail when any row violates ``cond``.

        Reference: Validate (csvplus.go:300-310) — first bad row aborts
        iteration. ``eager=True`` (default) runs one small filter+limit
        job now and raises :class:`DataSourceError` — the distributed
        analogue of the reference's scan-time failure (and the filter
        pushes down to the scan, so it is cheap). ``eager=False`` wires
        a type-preserving conditional ``raise_error`` into every column
        instead, deferring the check to whatever action consumes the
        rows — but Catalyst column pruning means a column nobody reads
        is never checked.
        """
        # a row where the check can't evaluate (NULL — e.g. `v > 0`
        # with v NULL) is a VIOLATION, not a pass: ~NULL is NULL and a
        # bare negated filter would silently wave such rows through
        # (same hazard class as the r7 merge_upsert delete_filter)
        viol = ~F.coalesce(cond, F.lit(False))
        if eager:
            from .errors import DataSourceError

            bad = self._df.filter(viol).limit(1)
            if self.order and self.order[0][0] == ROW_ID:
                # row lineage (SURVEY §7 H5): report the 1-based ingest
                # position of the first violating row, like the
                # reference's DataSourceError{Line} — the extra jobs run
                # only on the failure path
                first_bad = self._df.filter(viol).agg(F.min(ROW_ID)).collect()[0][0]
                if first_bad is not None:
                    line = self._df.filter(F.col(ROW_ID) <= first_bad).count()
                    raise DataSourceError(message, line=line)
            elif bad.count():
                raise DataSourceError(message)
            return self
        exprs = []
        for field in self._df.schema.fields:
            c = F.col(field.name)
            err = F.raise_error(F.lit(message)).cast(field.dataType)
            exprs.append(F.when(viol, err).otherwise(c).alias(field.name))
        return self._wrap(self._df.select(*exprs))

    # ------------------------------------------------------------------
    # order-dependent ops — reference csvplus.go:313-374 (SURVEY §7 H1)

    def top(self, n: int) -> "Frame":
        """First n rows in declared order (Top, csvplus.go:313-326).

        With a declared order Spark plans TakeOrderedAndProject (the
        distributed analogue of the reference's io.EOF short-circuit);
        without one it is a plain LIMIT.
        """
        if self.order:
            df = self._df.orderBy(*self._order_cols()).limit(n)
        else:
            df = self._df.limit(n)
        return self._wrap(df)

    def top_with_ties(self, n: int) -> "Frame":
        """SQL ``FETCH FIRST n ROWS WITH TIES`` over the declared
        order: the first n rows plus every row tying the n-th row's
        order key — a deterministic SET even when the order has ties
        (plain :meth:`top` picks an arbitrary tie subset). Same
        scalar-cutoff family as drop/take_while: parallel top-n
        subquery + parallel filter, no global window. Fewer than n
        rows → keep all."""
        self._order_cols()  # raises if no declared order
        if n <= 0:
            return self._wrap(self._df.limit(0))
        kth = (
            self._df.orderBy(*self._order_cols()).limit(n).offset(n - 1)
            .select(self._order_key_struct().alias("__cp_cut__"))
        ).scalar()
        before, eq = self._lex_vs_cut(kth)
        keep = F.when(kth.isNull(), F.lit(True)).otherwise(before | eq)
        return self._wrap(self._df.filter(keep))

    def drop(self, n: int) -> "Frame":
        """Skip first n rows in declared order (Drop, csvplus.go:329-342).

        Scale plan (same family as :meth:`_latched`, no global sort):
        the n-th row's order-key is a parallel top-n scalar subquery
        (TakeOrderedAndProject), rows strictly after it pass a plain
        parallel filter, and boundary ties are resolved exactly — a
        second scalar counts rows strictly before the cutoff, and only
        the tie group (bounded by the key's multiplicity; a single row
        under the documented total-order contract) goes through a
        row_number to keep the surplus. ``orderBy().offset(n)`` — the
        r1-r4 form — planned a single-partition global sort.
        """
        if not self.order:
            return self._wrap(self._df.offset(n))
        if n <= 0:
            return self._wrap(self._df)
        kth = (
            self._df.orderBy(*self._order_cols()).limit(n).offset(n - 1)
            .select(self._order_key_struct().alias("__cp_cut__"))
        ).scalar()
        before, eq = self._lex_vs_cut(kth)
        below = (
            self._df.filter(before).groupBy()
            .agg(F.count(F.lit(1)).alias("c"))
        ).scalar()
        # kth NULL ⇔ fewer than n rows ⇔ result is empty
        after_part = self._df.filter(kth.isNotNull() & ~before & ~eq)
        # tie resolution must be REPRODUCIBLE, not just count-stable
        # (ADVICE r5): order the tie group by the remaining (orderable)
        # columns so a task retry or a second action keeps the SAME
        # physical rows. Rows identical in every orderable column are
        # interchangeable — any pick is the same row value.
        from pyspark.sql.types import ArrayType, MapType, StructType

        def _orderable(dt) -> bool:
            # Spark cannot sort on maps at ANY nesting depth
            # (array<map>, struct<...,map,...> are equally invalid
            # ordering types) — recurse, don't just check the top level
            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return _orderable(dt.elementType)
            if isinstance(dt, StructType):
                return all(_orderable(f.dataType) for f in dt.fields)
            return True

        key_names = {c for c, _ in self.order}
        tie_order = [self._df[c] for c in self._df.columns
                     if c not in key_names
                     and _orderable(self._df.schema[c].dataType)]
        ties = (
            self._df.filter(kth.isNotNull() & eq)
            # partitionBy the key cols: the tie group shares ONE key, so
            # this is the same single group — but hash-partitioned (no
            # "No Partition Defined" global-window plan)
            .withColumn("__cp_rn__", F.row_number().over(
                Window.partitionBy(*[self._sort_key(c) for c, _ in self.order])
                .orderBy(*(tie_order or [F.lit(1)]))))
            .filter(F.col("__cp_rn__") > (F.lit(n) - F.coalesce(below, F.lit(0))))
            .drop("__cp_rn__")
        )
        return self._wrap(after_part.unionAll(ties))

    def _order_key_struct(self) -> Column:
        """The declared-order key tuple as a struct (scalar-cutoff unit)."""
        return F.struct(*[self._sort_key(c).alias(f"k{i}")
                          for i, (c, _) in enumerate(self.order)])

    def _lex_vs_cut(self, cut: Column) -> tuple[Column, Column]:
        """(strictly-before, all-equal) comparisons of each row's
        declared-order key tuple against the scalar cutoff struct,
        honoring per-key direction and Spark null placement
        (asc=nulls first, desc=nulls last); null-safe throughout."""
        keys = list(self.order)
        before = F.lit(False)
        eq = F.lit(True)
        for i in reversed(range(len(keys))):
            c, asc = keys[i]
            a = self._sort_key(c)
            b = cut.getField(f"k{i}")
            if asc:
                lt = (a.isNull() & b.isNotNull()) | (a < b)
            else:
                lt = (b.isNull() & a.isNotNull()) | (a > b)
            before = lt | (a.eqNullSafe(b) & before)
            eq = a.eqNullSafe(b) & eq
        return F.coalesce(before, F.lit(False)), eq

    def _latched(self, cond: Column, keep_before: bool) -> "Frame":
        """Shared engine for take_while/drop_while: two-pass scalar
        cutoff over the declared order (SURVEY §2.6 scale plan).

        Pass 1 finds the FIRST violating row's order-key tuple — a
        parallel top-1 (TakeOrderedAndProject), no global sort —
        surfaced as an uncorrelated scalar subquery (DataFrame.scalar).
        Pass 2 keeps rows lexicographically before it (TakeWhile) or
        from it on (DropWhile) with a fully parallel filter. Replaces
        the r1-r4 unpartitioned-window latch, which was a
        single-partition sort at scale (VERDICT r4 item 4).

        No violation anywhere → the scalar subquery yields NULL →
        keep all (TakeWhile) / none (DropWhile).
        """
        order_exprs = self._order_cols()  # raises if no declared order
        cut = (
            self._df.filter(~cond)
            .orderBy(*order_exprs)
            .limit(1)
            .select(self._order_key_struct().alias("__cp_cut__"))
        ).scalar()  # uncorrelated scalar subquery: Filter(... Subquery)
        before, _ = self._lex_vs_cut(cut)
        keep = F.when(cut.isNull(), F.lit(keep_before)) \
            .otherwise(before if keep_before else ~before)
        return self._wrap(self._df.filter(keep))

    def take_while(self, cond: Column) -> "Frame":
        """Pass rows while cond holds, then stop (csvplus.go:346-358)."""
        return self._latched(cond, keep_before=True)

    def drop_while(self, cond: Column) -> "Frame":
        """Skip rows while cond holds, pass the rest (csvplus.go:362-374)."""
        return self._latched(cond, keep_before=False)

    # ------------------------------------------------------------------
    # joins — reference csvplus.go:545-608 (semantics pinned in SURVEY §2.3)

    def _join_conditions(self, other_df: DataFrame, index: "Index", probe_cols):
        index_cols = index.columns
        probe = _as_list(probe_cols) if probe_cols else list(index_cols)
        if len(probe) > len(index_cols):
            raise ValueError(
                f"too many probe columns: {len(probe)} > {len(index_cols)}"
            )  # reference panics, csvplus.go:548-550
        self._require(probe, "join probe")
        conds = []
        for pc, ic in zip(probe, index_cols):
            left = self._df[pc]
            ren = f"__cp_ix_{ic}__"
            right = other_df[ren] if ren in other_df.columns else other_df[ic]
            if self.string_mode:
                left, right = left.cast("string"), right.cast("string")
            # plain SQL equality (nulls never match) — matches both the
            # reference (a probe row with a missing key column errors,
            # csvplus.go:556) and the ANSI-SQL oracle semantics
            conds.append(left == right)
        return conds, probe

    def _index_side(self, index: "Index") -> DataFrame:
        """The index DataFrame with every column renamed to a
        collision-proof temp name. The aliases mint FRESH expression
        ids, so joining a Frame against an index built from that SAME
        Frame resolves instead of raising an ambiguous-self-join
        AnalysisException (review r5)."""
        other = index.df
        return other.select(
            *[other[c].alias(f"__cp_ix_{c}__") for c in other.columns])

    def join(self, index: "Index", *probe_cols: str, broadcast: bool | None = None,
             assume_fk: bool = False) -> "Frame":
        """Inner equi-join against an Index; possibly 1-to-many.

        Reference semantics (csvplus.go:545-583):
          * probe columns match the index columns positionally and may
            be a strict prefix (whole equal-prefix range matches);
          * empty probe list = natural join on the index's own columns;
          * output = index row ∪ probe row, probe wins name collisions
            (mergeRows, csvplus.go:571-583) — so a renamed-key join
            keeps BOTH key columns.

        Spark planning: one equi-join; broadcast-hash when the index is
        small (auto via autoBroadcastJoinThreshold, forceable with
        ``broadcast=True``), else sort-merge — the distributed
        replacement for the reference's per-row binary search
        (csvplus.go:893-897).

        Uniqueness as a Catalyst-visible constraint (SURVEY §4.2):
        when the index is UNIQUE and contributes no output columns
        (key-only index whose names the probe side already carries),
        the inner join cannot multiply rows — it is exactly an
        existence filter, so it is planned as a LEFT SEMI join
        instead. Catalyst cannot make this rewrite itself (it has no
        uniqueness metadata); the semi form ships only key columns to
        the build side and never materializes matched rows.
        ``assume_fk=True`` additionally asserts referential integrity
        (every probe key non-null and present in the index) — then
        the existence filter passes everything and the join is
        ELIMINATED outright (returns self; the classic FK + unique-key
        join elimination). The caller owns that assertion: a violating
        row that the join would have dropped is KEPT.
        """
        other = self._index_side(index)
        conds, probe = self._join_conditions(other, index, probe_cols)
        probe_names = set(self._df.columns)
        added = [c for c in index.df.columns if c not in probe_names]
        if index.unique and not added:
            if assume_fk:
                return self
            right = F.broadcast(other) if broadcast or (
                broadcast is None and index.small) else other
            return self._wrap(self._df.join(right, _and(conds), "left_semi"))
        right = F.broadcast(other) if broadcast or (broadcast is None and index.small) else other
        joined = self._df.join(right, _and(conds), "inner")
        # probe side wins name collisions; keep both sides otherwise
        out = [other[f"__cp_ix_{c}__"].alias(c) for c in added]
        out += [self._df[c] for c in self._df.columns]
        return self._wrap(joined.select(*out))

    def except_(self, index: "Index", *probe_cols: str, broadcast: bool | None = None) -> "Frame":
        """Left anti join: pass rows whose key is NOT in the index,
        unchanged (Except, csvplus.go:588-608)."""
        other = self._index_side(index)
        conds, _ = self._join_conditions(other, index, probe_cols)
        right = F.broadcast(other) if broadcast or (broadcast is None and index.small) else other
        return self._wrap(self._df.join(right, _and(conds), "left_anti"))

    def join_frame(self, other: "Frame", on: Sequence[str] | str,
                   how: str = "inner") -> "Frame":
        """Generic typed join (extension, SURVEY §2.3: the reference has
        only inner-vs-index and anti; Spark gives every ``how`` free)."""
        out = self.df.join(other.df, _as_list(on), how)
        return Frame(out, None, self.string_mode)

    def explode(self, column: str, alias: str | None = None) -> "Frame":
        """One-to-many row expansion over an array column (UDTF shape —
        no reference counterpart, SURVEY §2.10)."""
        self._require([column], "explode")
        out = self._df.withColumn(alias or column, F.explode(F.col(column)))
        return self._wrap(out)

    # ------------------------------------------------------------------
    # index builders — reference csvplus.go:529-537

    def index_on(self, *columns: str) -> "Index":
        """Sorted index on the given columns (IndexOn, csvplus.go:529-531).

        Spark-side this is lazy: the sort is declared (range-partitioned
        external sort at action time), never an in-memory materialize —
        strictly better than the reference's all-in-memory build
        (README.md:103-106).
        """
        from .index import Index

        cols = _as_list(columns)
        if not cols or len(set(cols)) != len(cols):
            raise ValueError("empty or duplicate index columns")  # csvplus.go:708-717
        self._require(cols, "index_on")
        return Index(self, cols, unique=False)

    def unique_index_on(self, *columns: str, lazy_check: bool = False) -> "Index":
        """IndexOn + uniqueness assertion (csvplus.go:535-537, 740-756);
        raises DuplicateKeyError with the offending key. ``lazy_check``
        fuses the assertion into the consuming plan instead of running
        an eager probe job (see Index.assert_unique)."""
        from .index import Index

        idx = self.index_on(*columns)
        idx.assert_unique(lazy=lazy_check)
        return idx

    # ------------------------------------------------------------------
    # set ops (Spark extension — SURVEY §2.7: reference has none)

    def union(self, other: "Frame") -> "Frame":
        """unionByName with missing-column tolerance — the natural fit
        for the reference's per-row dynamic schemas (SURVEY §2.7)."""
        df = self.df.unionByName(other.df, allowMissingColumns=True)
        return Frame(df, None, self.string_mode)

    def distinct(self) -> "Frame":
        return Frame(self.df.dropDuplicates(), None, self.string_mode)

    def intersect(self, other: "Frame") -> "Frame":
        return Frame(self.df.intersect(other.df), None, self.string_mode)

    def except_all(self, other: "Frame") -> "Frame":
        """Multiset difference (SQL EXCEPT ALL): each match removes ONE
        occurrence, so duplicate multiplicities survive arithmetic."""
        return Frame(self.df.exceptAll(other.df), None, self.string_mode)

    def intersect_all(self, other: "Frame") -> "Frame":
        """Multiset intersection (SQL INTERSECT ALL): keeps
        min(multiplicity_left, multiplicity_right) copies per row."""
        return Frame(self.df.intersectAll(other.df), None, self.string_mode)

    # ------------------------------------------------------------------
    # partitioning control (scale knobs; no reference counterpart)

    def repartition_by(self, *cols: str, n: int | None = None) -> "Frame":
        """Hash-partition by columns (pre-shuffle for repeated joins/aggs
        on the same key; pairs with sort_within_partitions for clustered
        parquet output)."""
        self._require(_as_list(cols), "repartition_by")
        df = self._df.repartition(n, *cols) if n else self._df.repartition(*cols)
        return self._wrap(df)

    def sort_within_partitions(self, *cols: str) -> "Frame":
        self._require(_as_list(cols), "sort_within_partitions")
        return self._wrap(self._df.sortWithinPartitions(*cols))

    def coalesce(self, n: int) -> "Frame":
        return self._wrap(self._df.coalesce(n))

    # ------------------------------------------------------------------
    # group-by (Spark extension — SURVEY §2.4: reference aggregates by hand)

    def group_by(self, *cols: str):
        self._require(_as_list(cols), "group_by")
        return self.df.groupBy(*cols)

    def agg_by(self, group_cols: Sequence[str] | str, **aggs: Column) -> "Frame":
        """Grouped aggregation facade: ``f.agg_by("k", total=F.sum("v"))``.

        The idiomatic replacement for the reference's aggregate-in-the-
        terminal-callback pattern (SURVEY §2.4; csvplus_test.go:440-451):
        partial aggregation map-side, one shuffle on the group keys.
        """
        cols = _as_list(group_cols)
        self._require(cols, "agg_by")
        exprs = [c.alias(name) for name, c in aggs.items()]
        return Frame(self.df.groupBy(*cols).agg(*exprs), None, self.string_mode)

    # ------------------------------------------------------------------
    # sinks — reference csvplus.go:379-490

    def to_rows(self) -> list[dict]:
        """Collect as list of dicts (ToRows, csvplus.go:483-490)."""
        return [r.asDict(recursive=True) for r in self.ordered_df().collect()]

    def to_csv_file(self, path: str, *columns: str, single_file: bool = False) -> None:
        """Write CSV with header (ToCsv/ToCsvFile, csvplus.go:379-415).

        ``single_file=True`` gives the reference's one-file contract via
        coalesce(1) (compat, small outputs); default is a partitioned
        directory write — the only sane layout at scale (SURVEY §7 H6).
        """
        df = self.ordered_df()
        if columns:
            self._require(columns, "to_csv")
            df = df.select(*columns)
        elif not df.columns:
            raise ValueError("empty list of columns")
        if single_file:
            df = df.coalesce(1)
        # escape='"': write RFC-4180 doubled quotes ("a""b"), the
        # reference csv.Writer's dialect, instead of Spark's default
        # backslash escaping — keeps write→read byte-roundtrip closed
        # now that the scan parses doubled quotes (sources/csv.py)
        df.write.mode("overwrite").option("header", True) \
            .option("escape", '"').csv(path)

    def to_json_file(self, path: str, single_file: bool = False,
                     array: bool = False) -> None:
        """Write JSON (ToJSON/ToJSONFile, csvplus.go:446-480).

        Default is JSONL (the scalable form). ``array=True`` reproduces
        the reference's single-JSON-array file via a streamed driver
        write — compat for small outputs only (documented tradeoff of
        SURVEY §7 H6).
        """
        df = self.ordered_df()
        if array:
            with open(path, "w") as f:
                f.write("[")
                first = True
                for line in df.toJSON().toLocalIterator():
                    f.write(("" if first else ",") + line)
                    first = False
                f.write("]")
            return
        if single_file:
            df = df.coalesce(1)
        df.write.mode("overwrite").json(path)

    def to_avro_file(self, path: str, codec: str = "deflate",
                     objects_per_block: int = 1000) -> None:
        """Write ONE Avro Object Container File via the built-in
        pure-Python encoder (sources/avrocodec.py) — jar-less, streamed
        through toLocalIterator in bounded blocks so nothing
        corpus-sized materializes on the driver at once. Like
        ``to_json_file(array=True)`` this is the small-output compat
        form (SURVEY §7 H6); for corpus-scale Avro output use Spark's
        external spark-avro writer (``df.write.format("avro")``), which
        writes sharded files executor-side."""
        from .sources import avrocodec as ac

        schema = ac.spark_to_avro_schema(self.df.schema)
        rows = (row.asDict(recursive=True)
                for row in self.ordered_df().toLocalIterator())
        with open(path, "wb") as fh:
            ac.write_container(fh, schema, rows, codec=codec,
                               objects_per_block=objects_per_block)

    def to_parquet(self, path: str, partition_by: Sequence[str] | None = None) -> None:
        df = self.df
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def write_bucketed(self, table: str, bucket_cols: Sequence[str] | str,
                       n_buckets: int = 64, sort: bool = True,
                       single_file_buckets: bool = False) -> None:
        """Persist hash-bucketed (and key-sorted) — repeated joins /
        point lookups on ``bucket_cols`` then run shuffle-free
        (bucketed sort-merge join; partition pruning on the bucket).
        At 100 TB this is the difference between re-shuffling the fact
        table per join and never shuffling it at all. Plan shape pinned
        by tests/test_plans.py::test_bucketed_join_avoids_shuffle."""
        from .sources.bucketed import write_bucketed

        write_bucketed(self.df, table, _as_list(bucket_cols), n_buckets,
                       sort=sort, single_file_buckets=single_file_buckets)

    # ------------------------------------------------------------------
    # row-helper parity (reference Row utilities, SURVEY §1.1)

    def has_column(self, name: str) -> bool:
        """Row.HasColumn (csvplus.go:62-65) lifted to frame level."""
        return name in self.columns

    def header(self) -> list[str]:
        """Sorted column names — Row.Header (csvplus.go:78-87)."""
        return sorted(self.columns)

    def select_existing(self, *columns: str) -> "Frame":
        """Projection keeping only the named columns that exist; never
        errors — Row.SelectExisting (csvplus.go:108-118). When NONE of
        the names exist the result is a zero-column frame, regardless
        of hidden lineage columns (review r5: the old fallback returned
        the whole frame only when no hidden columns were present)."""
        keep = [c for c in _as_list(columns) if c in self._df.columns]
        hidden = [c for c in self._df.columns if c.startswith("__cp_")]
        # hidden lineage columns always ride along (ordered_df drops
        # them at the sink) so the declared order survives even a
        # select-nothing projection
        return self._wrap(self._df.select(*(keep + hidden)))

    def row_string(self, name: str = "row_json") -> "Frame":
        """Canonical per-row rendering, keys sorted — Row.String
        (csvplus.go:90-104), as a JSON column."""
        cols = sorted(self.columns)
        return self._wrap(
            self._df.withColumn(
                name, F.to_json(F.struct(*[F.col(c) for c in cols]))
            )
        )

    def for_each(self, fn: Callable[[dict], None]) -> None:
        """Terminal per-row consumer in declared order — the reference's
        direct DataSource invocation ``src(fn)`` (csvplus.go:215).

        Driver-side sequential iteration (toLocalIterator streams one
        partition at a time). For distributed side-effects use
        ``df.foreachPartition`` instead; this compat form exists for
        the reference's ordered, single-consumer contract.
        """
        for row in self.ordered_df().toLocalIterator():
            fn(row.asDict(recursive=True))

    # ------------------------------------------------------------------

    def count(self) -> int:
        return self._df.count()

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    def cache(self) -> "Frame":
        self._df.cache()
        return self


def _and(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
