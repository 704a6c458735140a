"""Pure-Python Avro Object Container File codec (decode + fixture
encode) — the pngcodec/jpegcodec pattern applied to the row-oriented
interchange format Kafka/ingest pipelines hand over.

Spark ships Avro support as an EXTERNAL jar (spark-avro); codec-less
containers (like this one — no network to fetch packages) previously
hit an honest env-gate. Avro OCF is simple enough to decode directly
(spec: https://avro.apache.org/docs/current/specification/): a header
(magic ``Obj\\x01``, a metadata map carrying the JSON schema and codec
name, a 16-byte sync marker) followed by data blocks (object count,
byte length, binary-encoded objects, sync marker). Values use zigzag
varints for int/long, little-endian IEEE for float/double,
length-prefixed bytes/strings, field-order records, index-prefixed
unions, and block-encoded arrays/maps.

Scope (the realistic corpus subset): records of primitives, nullable
``["null", T]`` unions, arrays, string-keyed maps, nested records,
enums (as strings), fixed (as bytes), and the date /
timestamp-millis / timestamp-micros logical types. ``null`` and
``deflate`` and ``snappy`` block codecs are built in (snappy via the
pure-Python raw-format codec below, r10; python-snappy used when
importable); unknown codecs raise an honest AvroError
(the only remaining env-gate).

Reference parity note: csvplus (csvplus.go) has no Avro surface; this
is extension code for the sources family (SURVEY §2.1).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterator

MAGIC = b"Obj\x01"


class AvroError(ValueError):
    """Malformed Avro container or unsupported schema feature."""


# --------------------------------------------------------------- decode

class _Reader:
    __slots__ = ("b", "pos")

    def __init__(self, blob: bytes, pos: int = 0):
        self.b = blob
        self.pos = pos

    def long(self) -> int:
        """Zigzag-encoded varint (Avro int and long)."""
        b, pos, shift, acc = self.b, self.pos, 0, 0
        while True:
            if pos >= len(b):
                raise AvroError("truncated varint")
            byte = b[pos]
            pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroError("varint too long")
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)

    def raw(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.b):
            raise AvroError("truncated data")
        out = self.b[self.pos:self.pos + n]
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def utf8(self) -> str:
        return self.bytes_().decode("utf-8")


def _decode_value(schema: Any, r: _Reader, names: dict[str, Any]) -> Any:
    """One value per the (parsed-JSON) schema node."""
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _decode_value(names[t], r, names)
        if t == "null":
            return None
        if t == "boolean":
            return r.raw(1) != b"\x00"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.raw(4))[0]
        if t == "double":
            return struct.unpack("<d", r.raw(8))[0]
        if t == "bytes":
            return r.bytes_()
        if t == "string":
            return r.utf8()
        raise AvroError(f"unsupported Avro type: {t!r}")
    if isinstance(schema, list):  # union: long index, then that branch
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode_value(schema[idx], r, names)
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode_value(f["type"], r, names)
                for f in schema["fields"]}
    if t == "enum":
        syms = schema["symbols"]
        idx = r.long()
        if not 0 <= idx < len(syms):
            raise AvroError(f"enum index {idx} out of range")
        return syms[idx]
    if t == "fixed":
        return r.raw(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block-size form: abs count + byte length
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode_value(schema["items"], r, names))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.utf8()  # key BEFORE value (RHS evaluates first)
                out[k] = _decode_value(schema["values"], r, names)
    if isinstance(t, (dict, list)):  # inline nested/union type node
        return _decode_value(t, r, names)
    # primitive spelled as {"type": "long", "logicalType": ...}
    val = _decode_value(t, r, names)
    return _apply_logical(schema, val)


def _apply_logical(schema: dict, val: Any) -> Any:
    lt = schema.get("logicalType")
    if lt is None or val is None:
        return val
    import datetime as dt

    if lt == "date":  # days since epoch
        return dt.date(1970, 1, 1) + dt.timedelta(days=val)
    # Avro timestamps are UTC epoch offsets by spec — return AWARE
    # UTC datetimes so downstream consumers (Spark's TimestampType
    # toInternal included) can't reinterpret them as machine-local
    # wall-clock and shift them by the host timezone offset
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    if lt == "timestamp-millis":
        return epoch + dt.timedelta(milliseconds=val)
    if lt == "timestamp-micros":
        return epoch + dt.timedelta(microseconds=val)
    return val  # unknown logical types fall back to the raw primitive


def _collect_names(schema: Any, names: dict[str, Any]) -> None:
    """Register named types (record/enum/fixed) for by-name reuse."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed") and "name" in schema:
        names[schema["name"]] = schema
    if t == "record":
        for f in schema.get("fields", ()):
            _collect_names(f.get("type"), names)
    elif t == "array":
        _collect_names(schema.get("items"), names)
    elif t == "map":
        _collect_names(schema.get("values"), names)


def parse_header(blob: bytes) -> tuple[dict, str, bytes, int]:
    """(schema, codec, sync_marker, body_offset) from an OCF header."""
    if blob[:4] != MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    r = _Reader(blob, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            # NB assignment evaluates the RHS first — read key then
            # value explicitly, in stream order
            k = r.utf8()
            meta[k] = r.bytes_()
    sync = r.raw(16)
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise AvroError("container header has no avro.schema") from None
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, r.pos


def _snappy_uncompress(data: bytes) -> bytes:
    """Raw (non-framed) snappy block decode, pure Python — the format
    Avro OCF uses (google/snappy format_description.txt, public):
    varint32 uncompressed length, then tagged elements — literals
    (tag&3==0) and back-references with 1/2/4-byte little-endian
    offsets. ~O(n) bytearray appends; OCF blocks are bounded
    (objects_per_block), so no pathological growth."""
    i, n = 0, len(data)
    ulen, shift = 0, 0
    while True:
        if i >= n:
            raise AvroError("snappy: truncated length varint")
        b = data[i]
        i += 1
        ulen |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
        if shift > 32:
            raise AvroError("snappy: length varint overflow")
    out = bytearray()
    while i < n:
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:  # 60..63: length-1 in next 1..4 LE bytes
                nb = length - 59
                if i + nb > n:
                    raise AvroError("snappy: truncated literal length")
                length = int.from_bytes(data[i:i + nb], "little")
                i += nb
            length += 1
            if i + length > n:
                raise AvroError("snappy: truncated literal")
            out += data[i:i + length]
            i += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            if i >= n:
                raise AvroError("snappy: truncated copy")
            offset = ((tag >> 5) << 8) | data[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if i + 2 > n:
                raise AvroError("snappy: truncated copy")
            offset = int.from_bytes(data[i:i + 2], "little")
            i += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if i + 4 > n:
                raise AvroError("snappy: truncated copy")
            offset = int.from_bytes(data[i:i + 4], "little")
            i += 4
        if offset == 0 or offset > len(out):
            raise AvroError("snappy: copy offset out of range")
        # overlapping copies are legal (RLE idiom): byte-at-a-time
        # when the run overlaps, slice when it doesn't
        start = len(out) - offset
        if offset >= length:
            out += out[start:start + length]
        else:
            for k in range(length):
                out.append(out[start + k])
    if len(out) != ulen:
        raise AvroError(
            f"snappy: decoded {len(out)} bytes, header says {ulen}")
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """Raw snappy block encode — greedy 4-byte-hash match finder, the
    classic snappy strategy (deterministic; decoder-exercising copies
    with 1- and 2-byte offsets). Correctness contract is only
    'round-trips through any spec decoder'."""
    out = bytearray()
    ulen = len(data)
    while True:  # varint32 length
        b = ulen & 0x7F
        ulen >>= 7
        out.append(b | (0x80 if ulen else 0))
        if not ulen:
            break

    def emit_literal(lo: int, hi: int) -> None:
        length = hi - lo
        while length > 0:
            chunk = min(length, 0x10000)
            if chunk <= 60:
                out.append(((chunk - 1) << 2) | 0)
            elif chunk <= 0x100:
                out.append((60 << 2) | 0)
                out.append(chunk - 1)
            else:
                out.append((61 << 2) | 0)
                out.extend((chunk - 1).to_bytes(2, "little"))
            out.extend(data[lo:lo + chunk])
            lo += chunk
            length -= chunk

    n = len(data)
    table: dict[bytes, int] = {}
    i = lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF:
            i += 1
            continue
        # extend the match
        length = 4
        while (i + length < n and length < 64
               and data[cand + length] == data[i + length]):
            length += 1
        emit_literal(lit_start, i)
        offset = i - cand
        if 4 <= length <= 11 and offset < 2048:
            out.append((((offset >> 8) & 0x7) << 5)
                       | ((length - 4) << 2) | 1)
            out.append(offset & 0xFF)
        else:
            out.append(((length - 1) << 2) | 2)
            out += offset.to_bytes(2, "little")
        i += length
        lit_start = i
    emit_literal(lit_start, n)
    return bytes(out)


def _decompress(block: bytes, codec: str) -> bytes:
    if codec == "null":
        return block
    if codec == "deflate":  # raw deflate, no zlib header (spec)
        return zlib.decompress(block, -15)
    if codec == "snappy":
        # spec: raw snappy body + 4-byte big-endian CRC32 of the
        # UNCOMPRESSED data. Pure-Python decode built in (r10);
        # python-snappy used opportunistically when importable (C-fast)
        if len(block) < 4:
            raise AvroError("snappy block too short for CRC suffix")
        try:
            import snappy  # type: ignore

            raw = snappy.decompress(block[:-4])
        except ImportError:
            raw = _snappy_uncompress(block[:-4])
        crc = struct.unpack(">I", block[-4:])[0]
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            raise AvroError("snappy block CRC mismatch (corrupt data)")
        return raw
    raise AvroError(f"unsupported Avro codec: {codec!r}")


def decode_container(blob: bytes,
                     header: tuple | None = None) -> tuple[dict, list[dict]]:
    """Decode a whole OCF blob → (schema, records). Raises AvroError
    on malformed input — never a silent wrong answer. ``header``
    accepts a pre-parsed :func:`parse_header` tuple so callers that
    already inspected the header don't parse it twice."""
    if header is None:
        header = parse_header(blob)
    return header[0], list(_iter_blocks(blob, header))


def _iter_blocks(blob: bytes, header: tuple) -> Iterator[dict]:
    """Record stream over an OCF blob — decompresses and decodes ONE
    data block at a time, yielding records as they materialize, so a
    lazy consumer never holds more than a block's worth of decoded
    rows (plus the raw blob) in memory."""
    schema, codec, sync, pos = header
    names: dict[str, Any] = {}
    _collect_names(schema, names)
    r = _Reader(blob, pos)
    while r.pos < len(blob):
        n_obj = r.long()
        block = _decompress(r.bytes_(), codec)
        if r.raw(16) != sync:
            raise AvroError("sync marker mismatch (corrupt block)")
        br = _Reader(block)
        for _ in range(n_obj):
            yield _decode_value(schema, br, names)
        if br.pos != len(block):
            raise AvroError("trailing bytes in data block")


# ------------------------------------------------- schema -> Spark type

def avro_to_spark_type(schema: Any, names: dict[str, Any] | None = None):
    """Parsed Avro schema node → pyspark DataType. Unions must be the
    nullable ``["null", T]`` form (general unions have no Spark
    column-type counterpart — raise, don't guess)."""
    from pyspark.sql import types as T

    if names is None:
        names = {}
        _collect_names(schema, names)
    prim = {"boolean": T.BooleanType(), "int": T.IntegerType(),
            "long": T.LongType(), "float": T.FloatType(),
            "double": T.DoubleType(), "bytes": T.BinaryType(),
            "string": T.StringType(), "null": T.NullType()}
    if isinstance(schema, str):
        if schema in names:
            return avro_to_spark_type(names[schema], names)
        if schema in prim:
            return prim[schema]
        raise AvroError(f"unsupported Avro type: {schema!r}")
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1 or len(branches) == len(schema):
            raise AvroError(
                "only nullable ['null', T] unions map to a Spark type")
        return avro_to_spark_type(branches[0], names)
    t = schema["type"]
    lt = schema.get("logicalType")
    if lt == "date":
        return T.DateType()
    if lt in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType()
    if t == "record":
        return T.StructType([
            T.StructField(f["name"],
                          avro_to_spark_type(f["type"], names),
                          nullable=_is_nullable(f["type"]))
            for f in schema["fields"]])
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"], names))
    if t == "map":
        return T.MapType(T.StringType(),
                         avro_to_spark_type(schema["values"], names))
    return avro_to_spark_type(t, names)


def _is_nullable(schema: Any) -> bool:
    return (schema == "null"
            or (isinstance(schema, list) and "null" in schema))


def spark_to_avro_schema(schema, name: str = "row") -> dict:
    """pyspark StructType → Avro record schema (the reverse of
    :func:`avro_to_spark_type`, same supported subset). Nullable
    fields become ``["null", T]`` unions; date/timestamp map to their
    logical types (timestamps as timestamp-micros, Spark's native
    precision)."""
    from pyspark.sql import types as T

    def conv(dt, field_name: str) -> Any:
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.ArrayType):
            return {"type": "array",
                    "items": _maybe_null(conv(dt.elementType, field_name),
                                         dt.containsNull)}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise AvroError("Avro maps require string keys")
            return {"type": "map",
                    "values": _maybe_null(conv(dt.valueType, field_name),
                                          dt.valueContainsNull)}
        if isinstance(dt, T.StructType):
            return spark_to_avro_schema(dt, f"{name}_{field_name}")
        raise AvroError(f"no Avro mapping for Spark type {dt}")

    return {"type": "record", "name": name, "fields": [
        {"name": f.name,
         "type": _maybe_null(conv(f.dataType, f.name), f.nullable)}
        for f in schema.fields]}


def _maybe_null(avro_type: Any, nullable: bool) -> Any:
    return ["null", avro_type] if nullable else avro_type


# ------------------------------------------------------ fixture encode

def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _encode_value(schema: Any, val: Any, out: io.BytesIO,
                  names: dict[str, Any]) -> None:
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _encode_value(names[t], val, out, names)
        if t == "null":
            return
        if t == "boolean":
            out.write(b"\x01" if val else b"\x00")
        elif t in ("int", "long"):
            _write_long(out, int(val))
        elif t == "float":
            out.write(struct.pack("<f", val))
        elif t == "double":
            out.write(struct.pack("<d", val))
        elif t == "bytes":
            _write_bytes(out, bytes(val))
        elif t == "string":
            _write_bytes(out, val.encode("utf-8"))
        else:
            raise AvroError(f"unsupported Avro type: {t!r}")
        return
    if isinstance(schema, list):
        # nullable-union convention: null -> its branch, else first
        # non-null branch (the fixture subset)
        if val is None and "null" in schema:
            _write_long(out, schema.index("null"))
            return
        for i, s in enumerate(schema):
            if s != "null":
                _write_long(out, i)
                return _encode_value(s, val, out, names)
        raise AvroError("no matching union branch")
    t = schema["type"]
    lt = schema.get("logicalType")
    if lt is not None:
        import datetime as dt

        if lt == "date" and isinstance(val, dt.date) \
                and not isinstance(val, dt.datetime):
            val = (val - dt.date(1970, 1, 1)).days
        elif lt in ("timestamp-millis", "timestamp-micros") \
                and isinstance(val, dt.datetime):
            # naive datetimes are LOCAL wall-clock (that is what
            # Spark's collect/toLocalIterator hands back); attach the
            # local zone before differencing against the UTC epoch so
            # the stored micros are true UTC offsets per the Avro spec
            if val.tzinfo is None:
                try:
                    val = val.astimezone()
                except (OSError, OverflowError):
                    # Windows mktime cannot resolve pre-epoch local
                    # offsets; approximate with the zone's CURRENT
                    # offset rather than crash (exact DST history for
                    # pre-1970 local times is unavailable there)
                    val = val.replace(
                        tzinfo=dt.datetime.now().astimezone().tzinfo)
            delta = val - dt.datetime(1970, 1, 1,
                                      tzinfo=dt.timezone.utc)
            micros = (delta.days * 86400 + delta.seconds) * 1_000_000 \
                + delta.microseconds
            val = micros // 1000 if lt == "timestamp-millis" else micros
        return _encode_value(t, val, out, names)
    if t == "record":
        for f in schema["fields"]:
            _encode_value(f["type"], val[f["name"]], out, names)
        return
    if t == "enum":
        _write_long(out, schema["symbols"].index(val))
        return
    if t == "fixed":
        if len(val) != schema["size"]:
            raise AvroError("fixed value size mismatch")
        out.write(bytes(val))
        return
    if t == "array":
        if val:
            _write_long(out, len(val))
            for item in val:
                _encode_value(schema["items"], item, out, names)
        _write_long(out, 0)
        return
    if t == "map":
        if val:
            _write_long(out, len(val))
            for k, v in val.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode_value(schema["values"], v, out, names)
        _write_long(out, 0)
        return
    return _encode_value(t, val, out, names)


def write_container(fh, schema: dict | str, records,
                    codec: str = "deflate",
                    objects_per_block: int = 1000) -> None:
    """Stream ``records`` (any iterable of dicts) into ``fh`` as one
    OCF — header then bounded blocks, so nothing corpus-sized is held
    at once. Deterministic: the sync marker derives from the schema
    text, so identical inputs give identical files (the
    encode_minimal_* fixture convention). This is THE block-framing
    implementation — encode_container and Frame.to_avro_file both
    delegate here so the spec logic lives in one place."""
    import hashlib

    if isinstance(schema, str):
        schema = json.loads(schema)
    schema_text = json.dumps(schema, separators=(",", ":"))
    if codec not in ("null", "deflate", "snappy"):
        raise AvroError(
            f"encode supports null/deflate/snappy, not {codec!r}")
    names: dict[str, Any] = {}
    _collect_names(schema, names)
    sync = hashlib.md5(schema_text.encode()).digest()
    fh.write(MAGIC)
    meta = {"avro.schema": schema_text.encode(),
            "avro.codec": codec.encode()}
    _write_long(fh, len(meta))
    for k, v in meta.items():
        _write_bytes(fh, k.encode())
        _write_bytes(fh, v)
    _write_long(fh, 0)
    fh.write(sync)

    def flush(chunk: list) -> None:
        body = io.BytesIO()
        for rec in chunk:
            _encode_value(schema, rec, body, names)
        raw = body.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            raw = comp.compress(raw) + comp.flush()
        elif codec == "snappy":  # raw snappy + CRC32-of-uncompressed
            raw = _snappy_compress(raw) + struct.pack(
                ">I", zlib.crc32(raw) & 0xFFFFFFFF)
        _write_long(fh, len(chunk))
        _write_bytes(fh, raw)
        fh.write(sync)

    block: list = []
    for rec in records:
        block.append(rec)
        if len(block) >= objects_per_block:
            flush(block)
            block = []
    if block:
        flush(block)


def encode_container(schema: dict | str, records: list[dict],
                     codec: str = "deflate",
                     objects_per_block: int = 1000) -> bytes:
    """Records → OCF bytes (in-memory form of :func:`write_container`)."""
    out = io.BytesIO()
    write_container(out, schema, records, codec, objects_per_block)
    return out.getvalue()


def iter_container_records(blob: bytes,
                           header: tuple | None = None) -> Iterator[dict]:
    """Generator form of decode_container's record stream (executor-
    side use: one file's blocks decode lazily per partition). True
    per-block laziness (r10 ADVICE): each data block is decompressed
    and decoded only as the consumer reaches it — a huge container
    file never materializes all records at once on the executor."""
    if header is None:
        header = parse_header(blob)
    yield from _iter_blocks(blob, header)
