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
