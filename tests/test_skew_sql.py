"""Salted join equivalence + SQL facade."""

from pyspark.sql import functions as F

from csvplus_spark import load_table
from csvplus_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").df
    c = load_table(spark, sf_dir, "customer").df \
        .withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, c, "o_custkey", n_salts=4) \
        .select("o_orderkey", "c_name")
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0
    assert salted.count() == plain.count()


def test_salted_left_join_keeps_unmatched(spark):
    l = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    r = spark.createDataFrame([(1, "x")], "k long, w string")
    out = salted_join(l, r, "k", n_salts=3, how="left").collect()
    got = {(row["k"], row["w"]) for row in out}
    assert got == {(1, "x"), (2, None)}


def test_sql_facade(spark, sf_dir):
    from csvplus_spark.sql import register_tables

    register_tables(spark, sf_dir)
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert n > 0
    j = spark.sql("""
        SELECT c_mktsegment, COUNT(*) AS n FROM orders
        JOIN customer ON o_custkey = c_custkey GROUP BY 1
    """)
    assert j.count() == 5
