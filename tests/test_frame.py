"""Frame combinators — mirrors the reference's unit tests
(csvplus_test.go TestSimpleDataSource/TestFilterMap/TestSorted)."""

import pytest
from pyspark.sql import functions as F

from csvplus_spark import (
    ColumnNotFoundError,
    all_,
    any_,
    like_,
    load_table,
    not_,
    take_rows,
    value_as_double,
    value_as_int,
)


def test_select_columns_strict(spark, sf_dir):
    f = load_table(spark, sf_dir, "nation", string_mode=True)
    assert f.select_columns("n_name", "n_nationkey").columns == ["n_name", "n_nationkey"]
    with pytest.raises(ColumnNotFoundError):
        f.select_columns("n_name", "nope")
    with pytest.raises(ValueError):
        f.select_columns()


def test_drop_columns_tolerant(spark, sf_dir):
    f = load_table(spark, sf_dir, "nation", string_mode=True)
    out = f.drop_columns("n_regionkey", "does_not_exist")
    assert out.columns == ["n_nationkey", "n_name"]
    with pytest.raises(ValueError):
        f.drop_columns()


def test_filter_like_and_combinators(spark, sf_dir):
    f = load_table(spark, sf_dir, "customer", string_mode=True)
    n_building = f.filter(like_({"c_mktsegment": "BUILDING"})).count()
    n_machinery = f.filter(like_({"c_mktsegment": "MACHINERY"})).count()
    both = f.filter(
        any_(like_({"c_mktsegment": "BUILDING"}), like_({"c_mktsegment": "MACHINERY"}))
    ).count()
    assert both == n_building + n_machinery
    none = f.filter(
        all_(like_({"c_mktsegment": "BUILDING"}), like_({"c_mktsegment": "MACHINERY"}))
    ).count()
    assert none == 0
    assert f.filter(not_(like_({"c_mktsegment": "BUILDING"}))).count() == f.count() - n_building
    with pytest.raises(ValueError):
        like_({})


def test_string_mode_lexicographic_order(spark):
    # "10" < "2" in index order — the reference's load-bearing semantic
    # (csvplus.go:798; SURVEY §7 H2)
    rows = [{"k": str(i)} for i in [1, 2, 10, 20, 3]]
    f = take_rows(spark, rows).ordered_by("k")
    got = [r["k"] for r in f.to_rows()]
    assert got == ["1", "10", "2", "20", "3"]


def test_map_with_columns_and_casts(spark, sf_dir):
    f = load_table(spark, sf_dir, "lineitem", string_mode=True)
    out = f.with_columns(
        qty=value_as_int("l_quantity").cast("double"),  # "33.0" fails int parse? quantity is double-string
    )
    # l_quantity strings are like "33.0" → int parse must fail
    with pytest.raises(Exception):
        out.df.select("qty").collect()
    ok = f.with_columns(qty=value_as_double("l_quantity")).df.select("qty").limit(5).collect()
    assert all(isinstance(r["qty"], float) for r in ok)


def test_validate(spark, sf_dir):
    f = load_table(spark, sf_dir, "customer", string_mode=True)
    f.validate(F.col("c_custkey").isNotNull(), "null key")  # passes eagerly
    with pytest.raises(Exception, match="acctbal"):
        f.validate(F.col("c_acctbal").cast("double") > 1e12, "acctbal too small")
    # lazy variant raises when rows are consumed
    lazy = f.validate(F.col("c_acctbal").cast("double") > 1e12, "acctbal too small",
                      eager=False)
    with pytest.raises(Exception, match="acctbal"):
        lazy.df.collect()


def test_map_rows_pandas(spark, sf_dir):
    f = load_table(spark, sf_dir, "nation", string_mode=True)

    def double_names(batches):
        for pdf in batches:
            pdf = pdf[pdf.n_name.str.startswith("NATION_1")].copy()
            pdf["n_name"] = pdf.n_name + "!"
            yield pdf

    out = f.map_rows(double_names, f.df.schema)
    rows = out.to_rows()
    assert rows and all(r["n_name"].endswith("!") for r in rows)


def test_union_by_name_dynamic_schema(spark):
    a = take_rows(spark, [{"x": "1", "y": "a"}])
    b = take_rows(spark, [{"x": "2", "z": "b"}])
    u = a.union(b)
    assert sorted(u.columns) == ["x", "y", "z"]
    rows = {r["x"]: r for r in u.to_rows()}
    assert rows["1"]["z"] is None and rows["2"]["y"] is None


def test_validate_row_lineage(spark):
    # eager validate over an ingest-ordered source reports the 1-based
    # row position, like the reference's DataSourceError (csvplus.go:1229)
    from csvplus_spark import DataSourceError

    f = take_rows(spark, [{"v": "1"}, {"v": "2"}, {"v": "x"}, {"v": "4"}])
    with pytest.raises(DataSourceError, match="row 3: not a number"):
        f.validate(F.col("v").try_cast("int").isNotNull(), "not a number")


def test_nested_ntz_timestamps_normalized(spark, tmp_path):
    """TIMESTAMP_NTZ buried inside struct/array columns must be cast to
    TIMESTAMP too (ADVICE r4): write µs-no-tz timestamps nested in a
    struct and an array via pyarrow, read through from_parquet, and
    assert no NTZ survives anywhere in the schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampNTZType

    from csvplus_spark import from_parquet

    ts = pa.array([1_700_000_000_000_000, 1_700_000_060_000_000],
                  type=pa.timestamp("us"))
    tbl = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "plain": ts,
        "nested": pa.StructArray.from_arrays([ts], names=["inner_ts"]),
        "arr": pa.ListArray.from_arrays(pa.array([0, 1, 2]), ts),
    })
    path = str(tmp_path / "ntz_nested.parquet")
    pq.write_table(tbl, path)

    df = from_parquet(spark, path).df

    def no_ntz(dt):
        from pyspark.sql.types import ArrayType, StructType
        if isinstance(dt, TimestampNTZType):
            return False
        if isinstance(dt, StructType):
            return all(no_ntz(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return no_ntz(dt.elementType)
        return True

    for f in df.schema.fields:
        assert no_ntz(f.dataType), f"NTZ survived in column {f.name}: {f.dataType}"
    rows = df.orderBy("id").collect()
    # nested value round-trips to the same wall-clock instant as the plain one
    assert rows[0]["nested"]["inner_ts"] == rows[0]["plain"]
    assert rows[0]["arr"][0] == rows[0]["plain"]


def test_multiset_ops_multiplicities(spark):
    from csvplus_spark import take_rows

    a = take_rows(spark, [{"v": x} for x in ["a", "a", "a", "b", "c"]])
    b = take_rows(spark, [{"v": x} for x in ["a", "b", "b"]])
    ex = sorted(r["v"] for r in a.except_all(b).to_rows())
    assert ex == ["a", "a", "c"]  # one 'a' cancelled, 'b' fully cancelled
    ix = sorted(r["v"] for r in a.intersect_all(b).to_rows())
    assert ix == ["a", "b"]  # min multiplicity per value


def test_take_rows_empty_source(spark):
    """TakeRows() with no rows is a valid empty source in the reference
    (csvplus.go:218-222) — must not crash on schema inference."""
    from csvplus_spark import take_rows

    f = take_rows(spark, [])
    assert f.count() == 0 and f.to_rows() == []


def test_validate_null_evaluating_check_is_violation(spark):
    """A check that can't evaluate (NULL — `v > 0` with v NULL) must
    FAIL validation, not silently pass through ~NULL = NULL (the
    merge_upsert delete_filter hazard class, applied to validate)."""
    import pyspark.sql.functions as F

    from csvplus_spark import DataSourceError, take_rows

    f = take_rows(spark, [{"v": "1"}, {"v": None}]) \
        .with_columns(v=F.col("v").cast("int"))
    with pytest.raises(DataSourceError):
        f.validate(F.col("v") > 0, "null v slipped through")
    # and the lazy variant raises at consumption
    with pytest.raises(Exception, match="null v slipped"):
        f.validate(F.col("v") > 0, "null v slipped (lazy)",
                   eager=False).to_rows()
    # rows that genuinely pass still flow
    ok = take_rows(spark, [{"v": "1"}]) \
        .with_columns(v=F.col("v").cast("int")) \
        .validate(F.col("v") > 0, "nope")
    assert [r["v"] for r in ok.to_rows()] == [1]
