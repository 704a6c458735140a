"""Randomized duplicate-pack property test, mirroring the reference's
TestResolver (csvplus_test.go:695-752): inject a random pack of
duplicates; the resolver must be called exactly once per pack and see
exactly the pack's rows; groups of 1 pass through untouched."""

import random

from pyspark.sql import functions as F

from csvplus_spark import take_rows


def test_resolver_sees_whole_pack_once(spark):
    rng = random.Random(42)
    for trial in range(5):  # reference runs 1000 single-node iterations
        n_unique = rng.randint(5, 30)
        pack_key = str(rng.randrange(n_unique))
        pack_size = rng.randint(2, 20)
        rows = [{"k": str(i), "v": "base"} for i in range(n_unique)]
        rows += [{"k": pack_key, "v": f"dup{j}"} for j in range(pack_size)]
        rng.shuffle(rows)

        idx = take_rows(spark, rows).index_on("k")

        def resolve(pdf, pack_key=pack_key, pack_size=pack_size):
            # called only for packs of >=2; must see the full pack
            assert set(pdf["k"]) == {pack_key}
            assert len(pdf) == pack_size + 1
            return pdf.sort_values("v").head(1)

        out = idx.resolve_duplicates(resolve, schema="k string, v string")
        got = {r["k"]: r["v"] for r in out.df.collect()}
        assert len(got) == n_unique
        assert got[pack_key] == "base"  # "base" < "dupN" lexicographically
        others = {k: v for k, v in got.items() if k != pack_key}
        assert all(v == "base" for v in others.values())


def test_resolver_empty_result_drops_pack(spark):
    rows = [{"k": "a", "v": "1"}, {"k": "a", "v": "2"}, {"k": "b", "v": "3"}]
    idx = take_rows(spark, rows).index_on("k")
    out = idx.resolve_duplicates(lambda pdf: pdf.iloc[0:0], schema="k string, v string")
    got = {r["k"] for r in out.df.collect()}
    assert got == {"b"}  # pack 'a' dropped entirely (csvplus.go:845)


def test_agg_by_facade(spark):
    f = take_rows(spark, [{"k": "a", "v": "2"}, {"k": "a", "v": "3"}, {"k": "b", "v": "5"}])
    out = f.agg_by("k", total=F.sum(F.col("v").cast("double")),
                   n=F.count(F.lit(1)))
    got = {r["k"]: (r["total"], r["n"]) for r in out.df.collect()}
    assert got == {"a": (5.0, 2), "b": (5.0, 1)}


def test_write_bucketed_roundtrip(spark):
    f = take_rows(spark, [{"k": str(i), "v": str(i * 2)} for i in range(50)])
    try:
        f.write_bucketed("bucketed_test", "k", n_buckets=4)
        back = spark.table("bucketed_test")
        assert back.count() == 50
        # bucketed self-join on k must not shuffle the bucketed sides
        joined = back.join(spark.table("bucketed_test"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_test")
