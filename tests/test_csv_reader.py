"""CSV Reader option surface — reference csvplus.go:924-1206, error
contracts pinned by csvplus_test.go:808-909 (class-of-error, not text)."""

import pytest

from csvplus_spark import ColumnNotFoundError, HeaderError, from_file


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "people.csv"
    p.write_text(
        "id,name,surname\n"
        "# a comment line\n"
        "0,Amelia,Smith\n"
        "1, Olivia,Jones\n"
        "2,Jack,\n"
    )
    return str(p)


def test_basic_scan_header(spark, csv_file):
    f = from_file(spark, csv_file).comment_char("#").to_frame()
    assert f.columns == ["id", "name", "surname"]
    rows = f.to_rows()
    assert len(rows) == 3
    assert rows[0]["name"] == "Amelia"


def test_select_columns_at_scan(spark, csv_file):
    f = from_file(spark, csv_file).comment_char("#").select_columns("id", "surname").to_frame()
    assert f.columns == ["id", "surname"]
    with pytest.raises(ColumnNotFoundError, match="xxx"):
        from_file(spark, csv_file).select_columns("xxx").to_frame()


def test_trim_leading_space(spark, csv_file):
    f = from_file(spark, csv_file).comment_char("#").trim_leading_space().to_frame()
    rows = f.to_rows()
    assert rows[1]["name"] == "Olivia"


def test_expect_header(spark, csv_file):
    # correct positions pass
    from_file(spark, csv_file).expect_header({"id": 0, "surname": 2}).to_frame()
    # by-name lookup passes with -1
    from_file(spark, csv_file).expect_header({"name": -1}).to_frame()
    with pytest.raises(HeaderError, match="misplaced"):
        from_file(spark, csv_file).expect_header({"name": 0}).to_frame()
    with pytest.raises(ColumnNotFoundError):
        from_file(spark, csv_file).expect_header({"zzz": -1}).to_frame()


def test_assume_header(spark, tmp_path):
    p = tmp_path / "nohdr.csv"
    p.write_text("0,Amelia\n1,Jack\n")
    f = from_file(spark, str(p)).assume_header({"id": 0, "name": 1}).to_frame()
    assert f.columns == ["id", "name"]
    assert f.to_rows()[1]["name"] == "Jack"


def test_delimiter(spark, tmp_path):
    p = tmp_path / "semi.csv"
    p.write_text("a;b\n1;2\n")
    f = from_file(spark, str(p)).delimiter(";").to_frame()
    assert f.columns == ["a", "b"]


def test_num_fields_any_pads_empty_string(spark, tmp_path):
    # reference pads short rows with "" not NULL (csvplus.go:1122-1124)
    p = tmp_path / "ragged.csv"
    p.write_text("a,b,c\n1,2,3\n4,5\n")
    f = from_file(spark, str(p)).num_fields_any().to_frame()
    rows = f.to_rows()
    assert rows[1]["c"] == ""


def test_ingest_order_preserved(spark, csv_file):
    f = from_file(spark, csv_file).comment_char("#").to_frame()
    ids = [r["id"] for r in f.to_rows()]
    assert ids == ["0", "1", "2"]
    assert [r["id"] for r in f.top(2).to_rows()] == ["0", "1"]


def test_csv_roundtrip(spark, csv_file, tmp_path):
    # read → write → read: same rows (TestWriteFile analogue)
    f = from_file(spark, csv_file).comment_char("#").to_frame()
    out = str(tmp_path / "out_csv")
    f.to_csv_file(out, single_file=True)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 3
    assert set(back.columns) == {"id", "name", "surname"}


def test_multiline_quoted_fields(spark, tmp_path):
    # Go encoding/csv accepts embedded newlines in quoted fields by
    # default; multi_line() restores that parity
    p = tmp_path / "ml.csv"
    p.write_text('id,note\n1,"line one\nline two"\n2,simple\n')
    f = from_file(spark, str(p)).multi_line().to_frame()
    rows = {r["id"]: r["note"] for r in f.to_rows()}
    assert rows["1"] == "line one\nline two"
    assert rows["2"] == "simple"


def test_typed_reader_inference(spark, tmp_path):
    p = tmp_path / "typed.csv"
    p.write_text("a,b\n1,2.5\n3,4.5\n")
    f = from_file(spark, str(p)).typed().to_frame()
    types = dict(f.df.dtypes)
    assert types["a"] in ("int", "bigint") and types["b"] == "double"
    assert not f.string_mode


def test_lazy_quotes_fidelity(spark, tmp_path):
    """Adversarial fixture pinning lazy_quotes() vs Go LazyQuotes
    (csvplus.go:984-987). Two behaviors match, two diverge — the
    divergences are documented in sources/csv.py and pinned here so a
    silent change in Spark's parser is caught."""
    p = tmp_path / "lq.csv"
    p.write_text('a,b\n1,x"y\n2,"x""y"\n3,"x"y"\n')
    f = from_file(spark, str(p)).lazy_quotes().to_frame()
    got = {r["a"]: r["b"] for r in f.to_rows()}
    assert got["1"] == 'x"y'   # bare quote mid-field: matches Go
    assert got["2"] == 'x"y'   # well-formed "" escape: matches Go
    assert got["3"] == "xy"    # stray quote in quoted field: Go gives x"y"
    # unterminated leading quote: Go accepts the rest of input as the
    # field; Spark's line-based parser raises instead
    p2 = tmp_path / "lq2.csv"
    p2.write_text('a,b\n"1,z,w\n')
    with pytest.raises(Exception):
        from_file(spark, str(p2)).lazy_quotes().to_frame().to_rows()


def test_jsonl_source(spark, tmp_path):
    from csvplus_spark.sources.jsonl import from_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
                 '{"doc_id": 2, "text": "hola mundo", "lang": "es"}\n')
    f = from_jsonl(spark, str(p), "doc_id long, text string, lang string")
    rows = {r["doc_id"]: r["lang"] for r in f.to_rows()}
    assert rows == {1: "en", 2: "es"}
    # schema provided → no inference pass, columns typed
    assert dict(f.df.dtypes)["doc_id"] == "bigint"
    # composes with the text operators directly
    from csvplus_spark.operators.text import text_stats
    assert text_stats(f.df).count() == 2


def test_text_source_line_and_whole_file(spark, tmp_path):
    from csvplus_spark.sources.jsonl import from_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first doc line one\nsecond doc line\n")
    (d / "b.txt").write_text("entire file is one document\nwith two lines\n")
    lines = from_text(spark, str(d / "a.txt"))
    assert [r["text"] for r in lines.to_rows()] == [
        "first doc line one", "second doc line"]
    whole = from_text(spark, str(d), whole_file=True)
    docs = {r["doc_id"].split("/")[-1]: r["text"] for r in whole.to_rows()}
    assert set(docs) == {"a.txt", "b.txt"}
    assert "with two lines" in docs["b.txt"]


def test_orc_roundtrip_matches_parquet_semantics(spark, sf_dir, tmp_path):
    """from_orc: write the events table (µs timestamps) as ORC, read it
    back, and assert identical typed values to the parquet path —
    including the shared timestamp normalization."""
    from csvplus_spark import from_orc, load_table

    ev = load_table(spark, sf_dir, "events").df.limit(200)
    orc = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(orc)
    back = from_orc(spark, orc).df
    assert str(back.schema["ts"].dataType) == "TimestampType()"
    import pyspark.sql.functions as F
    a = {r["event_id"]: r["us"]
         for r in ev.select("event_id", F.unix_micros("ts").alias("us")).collect()}
    b = {r["event_id"]: r["us"]
         for r in back.select("event_id", F.unix_micros("ts").alias("us")).collect()}
    assert a == b and len(a) == 200


def test_expect_header_doubled_quote_cell(spark, tmp_path):
    """ADVICE r5: a quoted header cell with an escaped quote
    (``"a""b"``) must unquote to ``a"b`` — one surrounding pair
    stripped, doubled quotes unescaped — so expect_header agrees with
    the name Spark's own CSV parse produces."""
    p = tmp_path / "q.csv"
    p.write_text('"a""b",c\n1,2\n')
    f = from_file(spark, str(p)).expect_header({'a"b': 0, "c": 1}).to_frame()
    assert f.to_rows() == [{'a"b': "1", "c": "2"}]


def test_strict_quote_parsing(spark, tmp_path):
    """Strict-mode quote dialect vs Go encoding/csv (csvplus.go:984-987
    is the LAZY option; this pins the DEFAULT). With escape='"' the
    well-formed RFC-4180 cases match Go exactly; Go's strict-mode
    ERRORS on malformed quotes become Spark pass-through values —
    documented divergence (Spark is laxer, never corrupts good cells)."""
    p = tmp_path / "strict.csv"
    p.write_text('a,b\n1,"x""y"\n2,"p,q"\n3,x"y\n')
    got = {r["a"]: r["b"] for r in from_file(spark, str(p)).to_frame().to_rows()}
    assert got["1"] == 'x"y'   # doubled quote unescapes (Go parity)
    assert got["2"] == "p,q"   # quoted delimiter (Go parity)
    assert got["3"] == 'x"y'   # bare quote: Go strict ERRORS, Spark passes


def test_csv_write_rfc4180_quoting(spark, tmp_path):
    """to_csv_file writes the reference csv.Writer dialect: quotes
    doubled, not backslash-escaped — so write→read roundtrips values
    containing quotes and delimiters byte-exactly."""
    from csvplus_spark import take_rows

    f = take_rows(spark, [{"a": 'x"y', "b": "p,q"}])
    out = tmp_path / "w"
    f.to_csv_file(str(out), single_file=True)
    import glob
    body = open(glob.glob(str(out / "part*"))[0]).read()
    assert body == 'a,b\n"x""y","p,q"\n'
    back = from_file(spark, str(out)).to_frame().to_rows()
    assert back == [{"a": 'x"y', "b": "p,q"}]


def test_expect_header_skips_comment_and_blank_lines(spark, tmp_path):
    """Review r6: the header peek must validate against the first line
    Spark's parser treats as the header — comment lines and blank
    lines before it are skipped by the scan and must be skipped by the
    peek too (previously '#generated' was compared against the
    expected names and a valid file raised HeaderError)."""
    p = str(tmp_path / "commented.csv")
    with open(p, "w") as f:
        f.write("#generated by tool\n\nid,name\n1,ann\n2,bob\n")
    rows = (from_file(spark, p).comment_char("#")
            .expect_header({"id": 0, "name": 1})
            .to_frame().to_rows())
    assert [r["name"] for r in rows] == ["ann", "bob"]
    # and a genuinely wrong header still fails AFTER the skip
    with pytest.raises(HeaderError):
        from_file(spark, p).comment_char("#") \
            .expect_header({"name": 0}).to_frame()


def test_remote_glob_direct_match_skips_hidden_files(spark, tmp_path):
    """ADVICE r7: a remote glob that matches FILES directly (dir/*)
    must not pick _SUCCESS or a dotfile as the header-peek file —
    Spark's scan ignores them, so the peek must too."""
    d = tmp_path / "landing"
    d.mkdir()
    # sort BEFORE the real data file on purpose
    (d / "_SUCCESS").write_text("")
    (d / ".hidden.crc").write_text("junk\n")
    (d / "data.csv").write_text("id,name\n1,a\n2,b\n")
    f = from_file(spark, f"file://{d}/*").to_frame()
    assert f.columns == ["id", "name"]
    assert sorted(r["id"] for r in f.to_rows()) == ["1", "2"]


def test_from_avro_env_gate_or_roundtrip(spark, tmp_path):
    """Avro reads work JAR-LESS now (r9): with spark-avro on the
    classpath the scan uses it; without it (this container) the
    pure-Python OCF decoder (sources/avrocodec.py) reads the same
    files through a binaryFile scan — same Frame either way."""
    from csvplus_spark import from_avro
    from csvplus_spark.sources.avrocodec import encode_container

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]}]}
    recs = [{"id": 1, "s": "a"}, {"id": 2, "s": "b"},
            {"id": 3, "s": None}]
    d = tmp_path / "avro"
    d.mkdir()
    # two shards → the fallback's per-file parallelism is exercised
    (d / "part-0.avro").write_bytes(encode_container(schema, recs[:2]))
    (d / "part-1.avro").write_bytes(
        encode_container(schema, recs[2:], codec="null"))
    f = from_avro(spark, str(d))
    assert sorted(((r["id"], r["s"]) for r in f.to_rows()),
                  key=lambda t: t[0]) == [(1, "a"), (2, "b"), (3, None)]
    assert dict(f.df.dtypes) == {"id": "bigint", "s": "string"}


def test_avrocodec_roundtrip_types(tmp_path):
    """Pure-Python OCF codec: every supported type round-trips through
    encode_container → decode_container, both block codecs."""
    import datetime as dt

    from csvplus_spark.sources.avrocodec import (AvroError,
                                                 decode_container,
                                                 encode_container)

    schema = {"type": "record", "name": "doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "neg", "type": "int"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "ok", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "k",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f4",
                                "size": 4}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "sub", "type": {"type": "record", "name": "inner",
                                 "fields": [{"name": "x",
                                             "type": "long"}]}},
    ]}
    recs = [
        {"id": 7, "neg": -123456, "text": "hello", "score": 2.5,
         "ratio": 0.25, "ok": True, "raw": b"\x00\xff", "tags": ["x", "y"],
         "props": {"a": 1, "b": -2}, "kind": "B", "fx": b"abcd",
         "day": dt.date(2026, 8, 15),
         # Avro timestamps are UTC by spec: the codec encodes aware
         # values verbatim and decodes to AWARE UTC (naive inputs are
         # treated as local wall-clock — the Spark collect contract)
         "ts": dt.datetime(2026, 8, 15, 12, 30, 0, 123456,
                           tzinfo=dt.timezone.utc),
         "sub": {"x": 42}},
        {"id": -9, "neg": 0, "text": None, "score": -1e300,
         "ratio": 1.0, "ok": False, "raw": b"", "tags": [],
         "props": {}, "kind": "A", "fx": b"\x00\x00\x00\x00",
         "day": dt.date(1969, 12, 31),
         "ts": dt.datetime(1955, 1, 1, tzinfo=dt.timezone.utc),
         "sub": {"x": -1}},
    ]
    for codec in ("deflate", "null"):
        blob = encode_container(schema, recs, codec=codec)
        got_schema, got = decode_container(blob)
        assert got_schema == schema
        assert got == recs, codec
    # determinism: same inputs → same bytes
    assert encode_container(schema, recs) == encode_container(schema, recs)
    # corruption is detected, not silently decoded
    blob = bytearray(encode_container(schema, recs))
    blob[-1] ^= 0xFF  # flip a sync-marker byte
    with pytest.raises(AvroError):
        decode_container(bytes(blob))
    with pytest.raises(AvroError):
        decode_container(b"NotAvro" + bytes(16))


def test_to_avro_file_roundtrip(spark, tmp_path):
    """Frame.to_avro_file → from_avro roundtrip, jar-less: typed
    columns (long/string/double/bool/date/timestamp/array) survive
    bit-for-bit through the pure-Python container codec."""
    import datetime as dt

    from csvplus_spark import Frame, from_avro

    df = spark.createDataFrame(
        [(1, "a", 2.5, True, dt.date(2026, 8, 15),
          dt.datetime(2026, 8, 15, 12, 0, 0, 123456), [1, 2]),
         (2, None, -0.0, False, None, None, [])],
        "id long, s string, x double, b boolean, d date, ts timestamp,"
        " arr array<bigint>")
    out = tmp_path / "out.avro"
    Frame(df, None, False).to_avro_file(str(out))
    back = from_avro(spark, str(out))
    got = sorted((r["id"], r["s"], r["x"], r["b"], r["d"], r["ts"],
                  r["arr"]) for r in back.to_rows())
    want = sorted((r["id"], r["s"], r["x"], r["b"], r["d"], r["ts"],
                   list(r["arr"])) for r in df.collect())
    assert got == want
    assert dict(back.df.dtypes) == dict(df.dtypes)


def test_from_avro_shard_schema_divergence_raises(spark, tmp_path):
    """r9 review: a schema-evolved shard (extra field) must RAISE, not
    silently drop/NULL the divergent field — while cosmetic spelling
    differences ({'type': 'long'} vs 'long') stay readable."""
    from csvplus_spark import from_avro
    from csvplus_spark.sources.avrocodec import (AvroError,
                                                 encode_container)

    base = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}]}
    spelled = {"type": "record", "name": "r2", "fields": [
        {"name": "id", "type": {"type": "long"}}]}  # same projection
    evolved = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "extra", "type": ["null", "string"]}]}
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "part-0.avro").write_bytes(
        encode_container(base, [{"id": 1}]))
    (d / "part-1.avro").write_bytes(
        encode_container(spelled, [{"id": 2}]))
    # cosmetic difference reads fine
    assert sorted(r["id"] for r in from_avro(spark, str(d)).to_rows()) \
        == [1, 2]
    (d / "part-2.avro").write_bytes(
        encode_container(evolved, [{"id": 3, "extra": "x"}]))
    with pytest.raises(Exception) as ei:
        from_avro(spark, str(d)).to_rows()
    assert "schema" in str(ei.value)


def test_avro_snappy_codec_pure_python(tmp_path):
    """r10: the snappy OCF codec is built in — raw-format block decode
    (literals, 1/2-byte-offset copies, overlapping RLE copies, varint
    lengths) + CRC32-of-uncompressed verification, no python-snappy
    needed. Encoder emits genuine back-references (compression ratio
    check), and corrupting the compressed body trips the CRC gate."""
    import random
    import struct
    import zlib

    from csvplus_spark.sources.avrocodec import (
        AvroError, _snappy_compress, _snappy_uncompress,
        decode_container, encode_container)

    rng = random.Random(5)
    cases = [b"", b"x", b"abcd" * 500,
             bytes(rng.randrange(256) for _ in range(5000)),
             b"the quick brown fox " * 300, bytes(70000)]
    for c in cases:
        assert _snappy_uncompress(_snappy_compress(c)) == c
    # repetitive data genuinely compresses (copies are emitted)
    rep = b"hello snappy world " * 200
    assert len(_snappy_compress(rep)) < len(rep) // 4
    # hand-crafted overlapping copy (RLE idiom): lit 'ab' then
    # copy(offset=2, len=8) -> 'ababababab'
    body = bytes([10, (2 - 1) << 2]) + b"ab" + bytes([((8 - 4) << 2) | 1, 2])
    assert _snappy_uncompress(body) == b"ababababab"
    # malformed streams raise, never garbage
    with pytest.raises(AvroError):
        _snappy_uncompress(bytes([10, ((8 - 4) << 2) | 1, 9]))  # offset>out
    with pytest.raises(AvroError):
        _snappy_uncompress(bytes([99, (40 << 2)]) + b"ab")  # truncated

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]}]}
    recs = [{"id": i, "s": ("hello world " * (i % 5)) or None}
            for i in range(2500)]
    blob = encode_container(schema, recs, codec="snappy",
                            objects_per_block=700)
    _, out = decode_container(blob)
    assert out == recs
    # flip a byte INSIDE the first compressed block -> CRC (or decode)
    # failure, never a silently wrong record
    bad = bytearray(blob)
    bad[blob.index(b"hello") + 2] ^= 0x55
    with pytest.raises(AvroError):
        decode_container(bytes(bad))
