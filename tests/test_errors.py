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


# per-row field-count contract (csvplus.go:1060-1076; mid-file errors
# pinned by csvplus_test.go's reader tests) ---------------------------


def _rows(fr):
    return fr.to_rows()


def test_map_rows_failure_carries_row_lineage(frame):
    def boom(it):
        for pdf in it:
            if (pdf["a"] == "2").any():
                raise ValueError("bad value in batch")
            yield pdf

    fr = frame.map_rows(boom, "a string, b string")
    with pytest.raises(Exception, match=r"ingest row-id range \[\d+, \d+\]"):
        fr.to_rows()


def test_num_fields_short_row_mid_file(spark, tmp_path):
    p = tmp_path / "short.csv"
    p.write_text("a,b,c\n1,2,3\n4,5\n6,7,8\n")
    fr = from_file(spark, str(p)).num_fields(3).to_frame()
    with pytest.raises(Exception, match="line 3 has 2 fields, expected 3"):
        _rows(fr)


def test_num_fields_long_row_mid_file(spark, tmp_path):
    p = tmp_path / "long.csv"
    p.write_text("a,b\n1,2\n3,4,5\n")
    fr = from_file(spark, str(p)).num_fields(2).to_frame()
    with pytest.raises(Exception, match="line 3 has 3 fields, expected 2"):
        _rows(fr)


def test_num_fields_auto_mid_file(spark, tmp_path):
    p = tmp_path / "auto.csv"
    p.write_text("a,b\n1,2\n3\n")
    fr = from_file(spark, str(p)).num_fields_auto().to_frame()
    with pytest.raises(Exception, match="line 3 has 1 fields, expected 2"):
        _rows(fr)


def test_num_fields_auto_is_per_file(spark, tmp_path):
    """Go's FieldsPerRecord=0 contract is per file (csvplus.go:1069-71):
    each file's first line fixes ITS width, and the reported ordinal
    counts within the offending file, which is named on glob reads."""
    d = tmp_path / "many"
    d.mkdir()
    # (one global schema across files — Spark contract; widths match)
    (d / "a.csv").write_text("a,b\n1,2\n3,4\n")
    (d / "b.csv").write_text("a,b\n5,6\n7,8\n")
    fr = from_file(spark, str(d / "*.csv")).num_fields_auto().to_frame()
    assert len(_rows(fr)) == 4
    # a mid-file break in the SECOND file reports line 3 OF b.csv (the
    # old global count would have said line 6) and names the file
    (d / "b.csv").write_text("a,b\n5,6\n7,8,9\n")
    fr2 = from_file(spark, str(d / "*.csv")).num_fields_auto().to_frame()
    with pytest.raises(Exception, match=r"b\.csv line 3 has 3 fields, expected 2"):
        _rows(fr2)


def test_num_fields_clean_file_passes(spark, tmp_path):
    p = tmp_path / "clean.csv"
    # quoted delimiter must NOT count as a field break
    p.write_text('a,b\n"x,y",2\n3,4\n')
    fr = from_file(spark, str(p)).num_fields(2).to_frame()
    assert [r["a"] for r in _rows(fr)] == ["x,y", "3"]
    fr2 = from_file(spark, str(p)).num_fields_auto().to_frame()
    assert len(_rows(fr2)) == 2


def test_assume_header_arity(spark, tmp_path):
    p = tmp_path / "narrow.csv"
    p.write_text("1,2\n3,4\n")
    # declared position beyond the file's width → explicit HeaderError
    with pytest.raises(HeaderError, match="'z'"):
        from_file(spark, str(p)).assume_header({"a": 0, "z": 4}).to_frame()
    # file wider than the spec → extra columns keep _cN names
    fr = from_file(spark, str(p)).assume_header({"a": 0}).to_frame()
    assert fr.columns == ["a", "_c1"]


def test_width_check_survives_column_pruning(spark, tmp_path):
    """The per-row width contract must fire even when the consumer
    projects AWAY the first column — the conditional raise_error rides
    every column so Catalyst cannot prune the check (review r5)."""
    import pytest

    p = tmp_path / "w.csv"
    p.write_text("a,b,c\n1,2,3\n4,5\n")
    from csvplus_spark import from_file

    fr = from_file(spark, str(p)).num_fields(3).to_frame()
    with pytest.raises(Exception, match="wrong number of fields"):
        fr.select_columns("b").to_rows()


def test_lazy_unique_check_survives_natural_join(spark):
    """lazy unique_index_on joined naturally (probe wins the key column,
    dropping the index's copy) must still raise on duplicate keys
    (review r5)."""
    import pytest

    from csvplus_spark import take_rows

    f = take_rows(spark, [{"k": "1", "v": "a"}, {"k": "1", "v": "b"}])
    idx = f.unique_index_on("k", lazy_check=True)
    probe = take_rows(spark, [{"k": "1", "x": "p"}])
    with pytest.raises(Exception, match="duplicate value"):
        probe.join(idx).to_rows()


def test_quoted_header_with_delimiter(spark, tmp_path):
    """expect_header must parse quoted header cells containing the
    delimiter the same way the scan does (review r5)."""
    p = tmp_path / "q.csv"
    p.write_text('a,"b,c",d\n1,2,3\n')
    from csvplus_spark import from_file

    f = from_file(spark, str(p)).expect_header({"a": 0, "b,c": 1, "d": 2}).to_frame()
    assert f.count() == 1


def test_from_csv_text_rejects_overwide_rows(spark):
    import pytest

    from csvplus_spark import from_csv_text

    with pytest.raises(ValueError, match="wrong number of fields"):
        from_csv_text(spark, "a,b\n1,2,3\n")


def test_self_join_against_own_index(spark):
    from csvplus_spark import take_rows

    f = take_rows(spark, [{"k": "1", "v": "x"}, {"k": "2", "v": "y"}])
    assert f.join(f.index_on("k")).count() == 2
    assert f.except_(f.index_on("k")).count() == 0


def test_rangejoin_and_salted_join_reject_bad_modes(spark):
    import pytest

    from csvplus_spark.operators.rangejoin import within_range_join
    from csvplus_spark.operators.skew import salted_join

    df = spark.range(3).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="inner"):
        within_range_join(df, df, "x", "x", 1.0, how="right")
    with pytest.raises(ValueError, match="max_distance"):
        within_range_join(df, df, "x", "x", 0.0)
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(df, df, "x", how="full")


def test_num_fields_auto_multi_split_file(spark, tmp_path):
    """Review r6: on a file large enough to span several input splits,
    auto mode must fix the expected width from the file's TRUE first
    line — split scheduling order (by size, not offset) must not leak
    into the per-file width contract or the reported line ordinal."""
    p = str(tmp_path / "wide.csv")
    with open(p, "w") as f:
        f.write("a,b,c\n")                       # 3 fields fixes the width
        for i in range(4000):
            f.write(f"{i},x{i},y{i}\n")
        f.write("only,two\n")                    # line 4002 violates
        for i in range(1000):
            f.write(f"{i},z{i},w{i}\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        from csvplus_spark import from_file

        with pytest.raises(Exception, match="line 4002 has 2 fields, expected 3"):
            from_file(spark, p).num_fields_auto().to_frame().to_rows()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_from_csv_text_rejects_short_rows(spark):
    """Review r6: short rows are a width error exactly like over-wide
    ones (Go csv auto FieldsPerRecord; the file Reader's FAILFAST
    default) — not data to be silently padded."""
    from csvplus_spark import from_csv_text

    with pytest.raises(ValueError, match="wrong number of fields"):
        from_csv_text(spark, "a,b\n1\n")


def test_from_csv_text_skips_blank_lines(spark):
    """Review r6 follow-up: blank lines are skipped (Go csv skips empty
    records; the file Reader filters them) — not width errors — and
    error messages keep PHYSICAL line numbers across skipped blanks."""
    from csvplus_spark import from_csv_text

    rows = from_csv_text(spark, "a,b\n1,2\n\n3,4\n\n").to_rows()
    assert rows == [{"a": "1", "b": "2"}, {"a": "3", "b": "4"}]
    with pytest.raises(ValueError, match="line 4"):
        from_csv_text(spark, "a,b\n1,2\n\nonly-one\n")


def test_expect_header_on_file_uri_multi_split(spark, tmp_path):
    """Review r6 follow-up: the remote-scheme header peek must read the
    TRUE first line — with many small splits a bare limit() samples
    whichever split is scheduled first (splits order by size)."""
    from csvplus_spark import from_file

    p = tmp_path / "big.csv"
    with open(p, "w") as f:
        f.write("#generated\n")
        f.write("id,name\n")
        for i in range(4000):
            f.write(f"{i},n{i}\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        n = (from_file(spark, f"file://{p}").comment_char("#")
             .expect_header({"id": 0, "name": 1})
             .to_frame().df.count())
        assert n == 4000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_remote_peek_first_file_and_deep_comment_prefix(spark, tmp_path):
    """ADVICE r6 (medium): the remote peek must (a) validate against the
    lexicographically FIRST file — same rule as the local glob branch,
    so header selection can't differ by scheme — and (b) survive a file
    whose comment prefix is deeper than the old 1024-line cap."""
    from csvplus_spark import from_file
    from csvplus_spark.errors import HeaderError

    d = tmp_path / "multi"
    d.mkdir()
    # b.csv sorts after a.csv; give it a DIFFERENT header — the peek
    # must validate against a.csv's header, whatever the scheme
    (d / "a.csv").write_text("id,name\n1,x\n")
    (d / "b.csv").write_text("name,id\n2,y\n")
    f = (from_file(spark, f"file://{d}")
         .expect_header({"id": 0, "name": 1}).to_frame())
    assert f.df.count() == 2
    with pytest.raises(HeaderError):
        (from_file(spark, f"file://{d}")
         .expect_header({"name": 0, "id": 1}).to_frame())

    deep = tmp_path / "deep.csv"
    with open(deep, "w") as fh:
        for i in range(1500):  # > the first 1024-row probe
            fh.write(f"# preamble {i}\n")
        fh.write("id,name\n7,z\n")
    n = (from_file(spark, f"file://{deep}").comment_char("#")
         .expect_header({"id": 0, "name": 1}).to_frame().df.count())
    assert n == 1


def test_remote_peek_resolves_nested_partition_dirs(spark, tmp_path):
    """Review r7: the remote peek must find files nested under hive
    key=value partition dirs (the scan itself resolves them), while
    still skipping hidden _tmp/.staging subtrees."""
    from csvplus_spark import from_file

    d = tmp_path / "ptab"
    (d / "part=1").mkdir(parents=True)
    (d / "part=2").mkdir()
    (d / "_tmp").mkdir()
    (d / "part=1" / "a.csv").write_text("id,name\n1,x\n")
    (d / "part=2" / "b.csv").write_text("id,name\n2,y\n")
    (d / "_tmp" / "junk.csv").write_text("zzz,qqq\n9,9\n")
    n = (from_file(spark, f"file://{d}")
         .expect_header({"id": 0, "name": 1}).to_frame().df.count())
    assert n == 2
