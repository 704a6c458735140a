"""As-of join semantics + row-helper parity + in-memory CSV source."""

import json

import pytest
from pyspark.sql import functions as F

from csvplus_spark import from_csv_text, take_rows
from csvplus_spark.operators.asof import asof_join


@pytest.fixture()
def quotes_and_trades(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0), ("B", 3, 99.0)],
        "sym string, t long, px double",
    )
    trades = spark.createDataFrame(
        [("A", 1), ("A", 4), ("A", 5), ("A", 10), ("B", 2), ("C", 7)],
        "sym string, t long",
    )
    return quotes, trades


def test_asof_backward_strict(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    out = asof_join(trades, quotes, on="t", by="sym", right_cols=["px"],
                    direction="backward", strict=True)
    got = {(r["sym"], r["t"]): r["px"] for r in out.collect()}
    assert got == {
        ("A", 1): None,     # strict: quote at t=1 not visible
        ("A", 4): 10.0,
        ("A", 5): 10.0,     # strict: quote at t=5 not visible
        ("A", 10): 12.0,
        ("B", 2): None,
        ("C", 7): None,     # no quotes for C
    }


def test_asof_backward_inclusive(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    out = asof_join(trades, quotes, on="t", by="sym", right_cols=["px"],
                    direction="backward", strict=False)
    got = {(r["sym"], r["t"]): r["px"] for r in out.collect()}
    assert got[("A", 1)] == 10.0 and got[("A", 5)] == 11.0


def test_asof_forward(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    out = asof_join(trades, quotes, on="t", by="sym", right_cols=["px"],
                    direction="forward", strict=False)
    got = {(r["sym"], r["t"]): r["px"] for r in out.collect()}
    assert got == {
        ("A", 1): 10.0, ("A", 4): 11.0, ("A", 5): 11.0, ("A", 10): None,
        ("B", 2): 99.0, ("C", 7): None,
    }


def test_asof_name_collision_suffix(spark):
    left = spark.createDataFrame([(1, 10, "l")], "k long, t long, v string")
    right = spark.createDataFrame([(1, 5, "r")], "k long, t long, v string")
    out = asof_join(left, right, on="t", by="k", right_cols=["v"])
    row = out.collect()[0]
    assert row["v"] == "l" and row["v_right"] == "r"


def test_row_helpers(spark):
    f = take_rows(spark, [{"b": "2", "a": "1"}])
    assert f.header() == ["a", "b"]
    assert f.has_column("a") and not f.has_column("z")
    assert f.select_existing("a", "zzz").columns == ["a"]
    rows = f.row_string().to_rows()
    assert json.loads(rows[0]["row_json"]) == {"a": "1", "b": "2"}


def test_for_each_ordered(spark):
    f = take_rows(spark, [{"v": str(i)} for i in range(5)])
    seen = []
    f.for_each(lambda r: seen.append(r["v"]))
    assert seen == ["0", "1", "2", "3", "4"]


def test_from_csv_text(spark):
    f = from_csv_text(spark, "a,b\n1,2\n3,4\n")
    assert f.columns == ["a", "b"]
    assert [r["a"] for r in f.to_rows()] == ["1", "3"]
    g = from_csv_text(spark, "1;2\n3;4\n", delimiter=";", header=False)
    assert g.columns == ["_c0", "_c1"]


def test_to_json_array(spark, tmp_path):
    f = take_rows(spark, [{"v": "1"}, {"v": "2"}])
    p = str(tmp_path / "out.json")
    f.to_json_file(p, array=True)
    data = json.load(open(p))
    assert data == [{"v": "1"}, {"v": "2"}]


def test_within_range_join_boundaries(spark):
    from csvplus_spark.operators.rangejoin import within_range_join

    l = spark.createDataFrame([(1, 100.0), (2, 250.0)], "lid long, lv double")
    r = spark.createDataFrame(
        [(10, 40.0), (11, 160.0), (12, 161.0), (13, 310.0), (14, 250.0)],
        "rid long, rv double",
    )
    out = within_range_join(l, r, "lv", "rv", 60.0)
    got = {(row["lid"], row["rid"]) for row in out.collect()}
    # |100-40|=60 inclusive; |100-160|=60 inclusive; |100-161|=61 out;
    # |250-310|=60 inclusive; |250-250|=0
    assert got == {(1, 10), (1, 11), (2, 13), (2, 14)}


def test_within_range_join_accepts_left_outer_aliases(spark):
    """ADVICE r5: Spark's canonical 'left_outer'/'leftouter' spellings
    must behave exactly like 'left' (salted_join already normalizes)."""
    from csvplus_spark.operators.rangejoin import within_range_join

    l = spark.createDataFrame([(1, 100.0), (2, 900.0)], "lid long, lv double")
    r = spark.createDataFrame([(10, 120.0)], "rid long, rv double")
    expect = {(row["lid"], row["rid"])
              for row in within_range_join(l, r, "lv", "rv", 60.0, how="left").collect()}
    assert expect == {(1, 10), (2, None)}
    for how in ("left_outer", "leftouter"):
        got = {(row["lid"], row["rid"])
               for row in within_range_join(l, r, "lv", "rv", 60.0, how=how).collect()}
        assert got == expect, how


def test_asof_join_null_timestamps_never_match(spark):
    """NULL timestamps on either side must match NOTHING: an
    unfiltered NULL right row sorts NULLS-FIRST into the backward
    window and silently poisons every left row until the next real
    right row; a NULL-ts left row in the forward direction picks up
    the stale end-of-key carry."""
    from csvplus_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "L10"), (1, None, "Lnull"), (1, 2, "L2")],
        "k long, ts long, lv string")
    right = spark.createDataFrame(
        [(1, None, "POISON"), (1, 5, "R5")],
        "k long, ts long, rv string")
    back = {r["lv"]: r["rv"]
            for r in asof_join(left, right, "ts", by="k").collect()}
    # L2 precedes every real right row -> no match; NULL-left no match
    assert back == {"L10": "R5", "Lnull": None, "L2": None}
    fwd = {r["lv"]: r["rv"]
           for r in asof_join(left, right, "ts", by="k",
                              direction="forward").collect()}
    assert fwd == {"L10": None, "Lnull": None, "L2": "R5"}
