"""Error-contract matrix mirroring the reference's TestErrors
(csvplus_test.go:808-909): same class of misuse raises the same class
of error (exact Go message text is a non-goal, SURVEY §7 H5)."""

import pytest
from pyspark.sql import functions as F

from csvplus_spark import (
    ColumnNotFoundError,
    DataSourceError,
    DuplicateKeyError,
    HeaderError,
    from_file,
    take_rows,
)


@pytest.fixture()
def frame(spark):
    return take_rows(spark, [{"a": "1", "b": "x"}, {"a": "2", "b": "y"},
                             {"a": "2", "b": "z"}])


def test_missing_column_at_scan(spark, tmp_path):
    p = tmp_path / "f.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ColumnNotFoundError, match="xxx"):
        from_file(spark, str(p)).select_columns("xxx").to_frame()


def test_strict_select_missing(frame):
    with pytest.raises(ColumnNotFoundError):
        frame.select_columns("a", "zzz")


def test_empty_column_lists(frame):
    with pytest.raises(ValueError):
        frame.select_columns()
    with pytest.raises(ValueError):
        frame.drop_columns()


def test_index_on_empty_and_duplicate_columns(frame):
    with pytest.raises(ValueError):
        frame.index_on()
    with pytest.raises(ValueError):
        frame.index_on("a", "a")


def test_index_on_missing_column(frame):
    with pytest.raises(ColumnNotFoundError, match="zzz"):
        frame.index_on("zzz")


def test_unique_index_duplicate_key_rendering(frame):
    with pytest.raises(DuplicateKeyError) as err:
        frame.unique_index_on("a")
    assert '"a" : "2"' in str(err.value)  # offending key rendered


def test_sub_index_arity(frame):
    idx = frame.index_on("a", "b")
    with pytest.raises(ValueError):
        idx.sub_index("1", "x")  # values must be a STRICT prefix
    with pytest.raises(ValueError):
        idx.find("1", "x", "extra")


def test_join_arity(frame):
    idx = frame.index_on("a")
    with pytest.raises(ValueError, match="too many probe columns"):
        frame.join(idx, "a", "b")


def test_probe_column_missing(frame):
    idx = frame.index_on("a")
    with pytest.raises(ColumnNotFoundError, match="join probe"):
        frame.join(idx, "nope")


def test_misplaced_header(spark, tmp_path):
    p = tmp_path / "g.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(HeaderError, match="misplaced column"):
        from_file(spark, str(p)).expect_header({"b": 0}).to_frame()
    # spec index beyond row width (csvplus_test.go:886-908)
    with pytest.raises(HeaderError, match="misplaced column"):
        from_file(spark, str(p)).expect_header({"a": 9}).to_frame()


def test_validate_error_class(frame):
    with pytest.raises(DataSourceError, match="row 2"):
        frame.validate(F.col("a") != "2", "bad a")
