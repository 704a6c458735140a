"""JSONL and raw-text sources — the ingestion formats LLM training
corpora actually arrive in (one JSON doc per line; one document per
file or per line).

Both map straight onto Spark file sources, so they inherit
splittability (JSONL splits by line), predicate/column pruning through
the scan, and distributed reads — no custom reader loop.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..frame import Frame


def from_jsonl(spark: SparkSession, path: str, schema: str | None = None,
               multi_line: bool = False) -> Frame:
    """Read JSON-lines into a typed Frame.

    ``schema`` (DDL string) skips inference — at 100 TB schema
    inference is a full extra pass, so production reads should always
    pass it. ``multi_line=True`` reads whole-file JSON arrays instead
    (non-splittable; one task per file — prefer JSONL).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if multi_line:
        reader = reader.option("multiLine", True)
    df = reader.json(path)
    return Frame(df, None, string_mode=False)


def from_text(spark: SparkSession, path: str, whole_file: bool = False,
              text_col: str = "text", id_col: str = "doc_id") -> Frame:
    """Raw text as documents.

    ``whole_file=False`` (default): one document per LINE, with a
    deterministic per-line id in scan order (splittable, scales).
    ``whole_file=True``: one document per FILE, id = file path
    (non-splittable per file; right for file-per-doc corpora).
    """
    if whole_file:
        df = (
            spark.read.option("wholetext", True).text(path)
            .select(F.input_file_name().alias(id_col),
                    F.col("value").alias(text_col))
        )
        return Frame(df, None, string_mode=False)
    df = (
        spark.read.text(path)
        .select(F.monotonically_increasing_id().alias(id_col),
                F.col("value").alias(text_col))
    )
    return Frame(df, [(id_col, True)], string_mode=False)


def _finish_columnar(spark: SparkSession, df, string_mode: bool) -> Frame:
    """Shared tail of the columnar sources (ORC/Avro): timestamp
    normalization + optional string-compat cast + Frame wrap — ONE
    copy so the formats can't silently drift (r8 review)."""
    from .parquet import normalize_timestamps

    df = normalize_timestamps(df)
    if string_mode:
        df = df.select(*[df[c].cast("string").alias(c) for c in df.columns])
    return Frame(df, None, string_mode)


def from_orc(spark: SparkSession, path: str, string_mode: bool = False) -> Frame:
    """ORC scan — the other columnar interchange format warehouses
    hand over. Same Catalyst benefits as parquet (predicate pushdown,
    column pruning, stripe-level min/max skipping) and the same
    timestamp normalization, so a corpus delivered as ORC behaves
    identically to the parquet path.
    """
    from .parquet import configure_parquet_session

    configure_parquet_session(spark)
    return _finish_columnar(spark, spark.read.orc(path), string_mode)


def from_avro(spark: SparkSession, path: str, string_mode: bool = False) -> Frame:
    """Avro scan — the row-oriented interchange format Kafka/ingest
    pipelines hand over. Prefers Spark's EXTERNAL spark-avro module
    when it is on the classpath (``--packages
    org.apache.spark:spark-avro_2.13:<spark version>`` — block-level
    splitting + JVM-side decode, the right plan at 100 TB). Without
    the jar (this container has no network to fetch it) the scan
    falls back to the built-in pure-Python Object Container File
    decoder (sources/avrocodec.py): a ``binaryFile`` scan + per-file
    block decode — FILE-level parallelism, so a sharded corpus (the
    normal Kafka-ingest layout: many container files) still
    distributes; null/deflate/snappy block codecs are all built in
    (r10: snappy via the pure-Python raw-format codec). Either path
    then gets the same timestamp normalization and string-compat
    treatment as parquet/ORC.
    """
    from .parquet import configure_parquet_session

    configure_parquet_session(spark)
    try:
        df = spark.read.format("avro").load(path)
    except Exception as exc:
        # loose match (ADVICE r8): any data-source-resolution failure
        # naming avro routes to the fallback, so Spark message churn
        # ("Failed to find data source" vs "Failed to find THE data
        # source", error-class renames) can't silently degrade it
        msg = str(exc).lower()
        if not ("data source" in msg and "avro" in msg):
            raise
        df = _avro_pure_scan(spark, path)
    return _finish_columnar(spark, df, string_mode)


def _avro_pure_scan(spark: SparkSession, path: str):
    """Jar-less Avro OCF read: schema from ONE file's header (bounded
    driver pull), then a distributed per-file decode — imperative
    per-partition work, the sanctioned RDD use-case."""
    from . import avrocodec

    files = spark.read.format("binaryFile").load(path).select("content")
    head = files.limit(1).collect()
    if not head:
        raise avrocodec.AvroError(f"no Avro files matched: {path}")
    schema, _codec, _sync, _pos = avrocodec.parse_header(
        bytes(head[0]["content"]))
    stype = avrocodec.avro_to_spark_type(schema)
    from pyspark.sql import types as T

    if not isinstance(stype, T.StructType):
        raise avrocodec.AvroError(
            "top-level Avro schema must be a record")
    field_names = [f["name"] for f in schema["fields"]]
    # structural fingerprint of the header-peeked file: every shard
    # must PROJECT to the same (field name -> Spark type) mapping, or
    # a schema-evolved corpus would silently drop/NULL the divergent
    # fields — raise instead (the codec's no-silent-wrong-answer
    # contract). Compared at the projected-type level, not raw schema
    # JSON: cosmetic spellings (namespace/doc attrs, {"type":"string"}
    # vs "string", field order) differ across writers and each shard
    # decodes per its OWN header anyway.
    def fingerprint(avro_schema) -> list[tuple[str, str]]:
        t = avrocodec.avro_to_spark_type(avro_schema)
        return sorted((f.name, f.dataType.simpleString())
                      for f in t.fields)

    expect_fp = fingerprint(schema)

    def rows(row):
        blob = bytes(row["content"])
        header = avrocodec.parse_header(blob)
        if fingerprint(header[0]) != expect_fp:
            raise avrocodec.AvroError(
                "Avro shard schema projects differently from the "
                "first file's (schema evolution across shards): "
                "reading would silently drop or NULL the divergent "
                "fields — read the generations separately or install "
                "spark-avro, whose reader resolves schemas per file")
        for rec in avrocodec.iter_container_records(blob, header=header):
            yield tuple(rec.get(n) for n in field_names)

    return spark.createDataFrame(files.rdd.flatMap(rows), stype)
