"""Order-dependent ops (Top/Drop/TakeWhile/DropWhile) — reference
csvplus.go:313-374, behaviors pinned by csvplus_test.go:454-514."""

import pytest
from pyspark.sql import functions as F

from csvplus_spark import load_table, take_rows


def _seq_frame(spark, vals):
    return take_rows(spark, [{"v": v} for v in vals])  # carries ingest order


def test_top_and_drop_over_ingest_order(spark):
    f = _seq_frame(spark, ["a", "b", "c", "d", "e"])
    assert [r["v"] for r in f.top(2).to_rows()] == ["a", "b"]
    assert [r["v"] for r in f.drop(3).to_rows()] == ["d", "e"]


def test_take_while_latches(spark):
    # latch: once false, stays false even if pred holds again later
    f = _seq_frame(spark, ["x", "x", "y", "x"])
    assert [r["v"] for r in f.take_while(F.col("v") == "x").to_rows()] == ["x", "x"]
    assert [r["v"] for r in f.drop_while(F.col("v") == "x").to_rows()] == ["y", "x"]


def test_take_while_all_pass(spark):
    f = _seq_frame(spark, ["x", "x"])
    assert f.take_while(F.col("v") == "x").count() == 2
    assert f.drop_while(F.col("v") == "x").count() == 0


def test_order_required(spark, sf_dir):
    f = load_table(spark, sf_dir, "customer", string_mode=True)
    with pytest.raises(ValueError, match="order"):
        f.take_while(F.col("c_custkey") == "0")


def test_topk_sorted(spark, sf_dir):
    f = (
        load_table(spark, sf_dir, "customer", string_mode=True)
        .ordered_by("c_custkey")
        .top(3)
    )
    got = [r["c_custkey"] for r in f.to_rows()]
    assert got == sorted(got)  # lexicographic
    assert len(got) == 3


def test_drop_exact_with_boundary_ties(spark):
    """drop(n) where the n-th position falls INSIDE a run of tied keys
    must still drop exactly n rows (the scalar-cutoff impl resolves
    boundary ties via a count-below + tie-group row_number)."""
    rows = [{"k": "a", "i": "1"}, {"k": "a", "i": "2"},
            {"k": "b", "i": "3"}, {"k": "b", "i": "4"}, {"k": "b", "i": "5"},
            {"k": "c", "i": "6"}]
    f = take_rows(spark, rows).ordered_by("k")
    for n in range(0, 8):
        got = f.drop(n).to_rows()
        assert len(got) == max(0, 6 - n), f"n={n}"
        # every fully-after key group survives intact
        kept_keys = [r["k"] for r in got]
        assert kept_keys == sorted(kept_keys), f"n={n}"
    # boundary inside the 'b' run: exactly one b survives, plus c
    assert sorted(r["k"] for r in f.drop(4).to_rows()) == ["b", "c"]


def test_drop_desc_order_and_overrun(spark):
    f = take_rows(spark, [{"v": x} for x in "abcde"]).ordered_by(
        "v", ascending=False)
    assert [r["v"] for r in f.drop(2).to_rows()] == ["c", "b", "a"]
    assert f.drop(5).count() == 0
    assert f.drop(99).count() == 0


def test_drop_plan_has_no_global_sort_offset(spark, sf_dir):
    """drop over a declared order must plan the parallel top-n cutoff
    (TakeOrderedAndProject), not a single-partition global sort+offset."""
    import __spark_entry__ as em

    plan = em.queries()["drop_offset"](spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_top_with_ties(spark):
    rows = [{"k": "a", "i": "1"}, {"k": "b", "i": "2"}, {"k": "b", "i": "3"},
            {"k": "b", "i": "4"}, {"k": "c", "i": "5"}]
    f = take_rows(spark, rows).ordered_by("k")
    # n=2 lands inside the 'b' run: ALL b ties come back
    got = sorted(r["i"] for r in f.top_with_ties(2).to_rows())
    assert got == ["1", "2", "3", "4"]
    # exact boundary: no surplus
    assert f.top_with_ties(1).count() == 1
    assert f.top_with_ties(0).count() == 0
    assert f.top_with_ties(99).count() == 5  # n > rows keeps all
    plan = f.top_with_ties(2).df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # scalar-cutoff, not a rank window


def test_drop_tie_pick_is_reproducible(spark):
    """ADVICE r5: within a boundary tie group, which physical rows
    survive drop(n) must be a pure function of the data (tie window
    ordered by the remaining columns), not of partition layout — two
    independent actions must keep the same rows."""
    rows = [{"k": "a", "i": str(i)} for i in range(8)]  # all keys tie
    f = take_rows(spark, rows).ordered_by("k")
    first = sorted(r["i"] for r in f.drop(3).to_rows())
    for _ in range(3):
        again = sorted(r["i"] for r in f.drop(3).to_rows())
        assert again == first
    # deterministic pick = the 3 smallest remaining-column values go
    assert first == ["3", "4", "5", "6", "7"]


def test_drop_ties_with_nested_unorderable_columns(spark):
    """Nested unorderable types (array<map>, struct with a map field)
    must be excluded from the tie window's ordering just like top-level
    maps — Spark rejects sort orders on them at ANY nesting depth."""
    from pyspark.sql import functions as F

    from csvplus_spark import Frame

    df = spark.createDataFrame(
        [(1, [{"a": "x"}], ("p", {"m": "v"})),
         (1, [{"b": "y"}], ("q", {"n": "w"})),
         (2, [{"c": "z"}], ("r", {"o": "u"}))],
        "k long, am array<map<string,string>>, "
        "st struct<s:string, m:map<string,string>>")
    f = Frame(df, [("k", "asc")], string_mode=False)
    assert f.drop(1).df.count() == 2   # crashed pre-fix: INVALID_ORDERING_TYPE
    # all columns unorderable except the key -> lit(1) fallback path
    f2 = Frame(df.select("k", "am"), [("k", "asc")], string_mode=False)
    assert f2.drop(2).df.count() == 1
