"""Randomized property tests (reference §5 style: deterministic
structure, random values, independent Python oracle)."""

import random

from pyspark.sql import functions as F

from csvplus_spark import take_rows


def test_string_collation_matches_python_sorted(spark):
    rng = random.Random(7)
    vals = [str(rng.randrange(10 ** rng.randint(1, 6))) for _ in range(300)]
    f = take_rows(spark, [{"v": v} for v in vals]).ordered_by("v")
    got = [r["v"] for r in f.to_rows()]
    assert got == sorted(vals)  # python sort on str == lexicographic


def test_take_drop_while_partition_stream(spark):
    rng = random.Random(11)
    for _ in range(3):
        vals = [rng.choice(["x", "y"]) for _ in range(rng.randint(1, 40))]
        f = take_rows(spark, [{"v": v} for v in vals])
        pred = F.col("v") == "x"
        tw = [r["v"] for r in f.take_while(pred).to_rows()]
        dw = [r["v"] for r in f.drop_while(pred).to_rows()]
        # python oracle
        cut = 0
        while cut < len(vals) and vals[cut] == "x":
            cut += 1
        assert tw == vals[:cut]
        assert dw == vals[cut:]
        assert tw + dw == vals


def test_topk_matches_python(spark):
    rng = random.Random(13)
    rows = [{"k": str(rng.randrange(1000)), "u": str(i)} for i in range(200)]
    f = take_rows(spark, rows).ordered_by("k", "u", ascending=[False, True]).top(17)
    got = [(r["k"], r["u"]) for r in f.to_rows()]
    expect = sorted(((r["k"], r["u"]) for r in rows),
                    key=lambda t: (_neg(t[0]), t[1]))[:17]
    assert got == expect


def _neg(s):
    # descending lexicographic: invert each char
    return tuple(-ord(c) for c in s)
