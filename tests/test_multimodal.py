"""Multimodal binary-column plumbing: metadata, stubbed decode,
frame sampling (schemas + Arrow batch shapes are real; codecs stubbed)."""

import pytest
from pyspark.sql import functions as F

from csvplus_spark.operators.multimodal import (
    attach_media_meta,
    decode_images,
    sample_frames,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, bytearray(b"\xff\xd8\xff\xe0" + b"fakejpegdata")),
        (2, bytearray(b"\x89PNG\r\n" + b"fakepngdata")),
        (3, bytearray(b"RIFFxxxxWAVE" + b"fakewav")),
        (4, bytearray(b"\x00\x01\x02\x03unknownblob")),
    ]
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_media_meta(media_df):
    rows = {r["media_id"]: r["media_meta"] for r in attach_media_meta(media_df).collect()}
    assert rows[1]["kind"] == "jpeg"
    assert rows[2]["kind"] == "png"
    assert rows[3]["kind"] == "riff/wav"
    assert rows[4]["kind"] == "unknown"
    assert rows[1]["byte_len"] == 16
    assert len(rows[1]["content_md5"]) == 32


def test_decode_stub_deterministic(media_df):
    a = {r["media_id"]: (r["width"], r["height"]) for r in decode_images(media_df).collect()}
    b = {r["media_id"]: (r["width"], r["height"]) for r in decode_images(media_df).collect()}
    assert a == b and len(a) == 4
    for w, h in a.values():
        assert 16 <= w <= 271 and 16 <= h <= 271


def test_decode_real_codec_raises_without_pillow(media_df, spark):
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed: env-gate does not fire")
    except ImportError:
        pass
    # a format NO built-in codec handles (not PNG, not JPEG) hits the
    # honest env-gate
    unknown = spark.createDataFrame(
        [(4, bytearray(b"\x00\x01\x02\x03unknownblob"))],
        "media_id long, data binary")
    with pytest.raises(Exception, match="Pillow is not importable"):
        decode_images(unknown, real_codec=True).collect()
    # a JPEG-magic blob with a garbage body is a MALFORMED stream: the
    # r8 marker walk raises ValueError rather than guessing dimensions
    with pytest.raises(Exception, match="marker|segment|SOF"):
        decode_images(media_df.filter("media_id = 1"),
                      real_codec=True).collect()


def test_real_codec_smoke_with_pillow(spark, tmp_path):
    """VERDICT r5 item 8: when Pillow IS available, real_codec=True
    must push a real PNG through the SAME mapInPandas path — decode
    yields true geometry, resize yields a re-decodable PNG blob."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from csvplus_spark.operators.multimodal import resize_images

    buf = io.BytesIO()
    Image.new("RGB", (37, 21), (250, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "media_id long, data binary")
    got = decode_images(df, real_codec=True).collect()[0]
    assert (got["width"], got["height"], got["n_pixels"]) == (37, 21, 777)

    out = resize_images(df, 8, 6, real_codec=True).collect()[0]
    with Image.open(io.BytesIO(bytes(out["data"]))) as im:
        assert im.size == (8, 6)


def test_feature_extract_feeds_similarity(media_df):
    from csvplus_spark.operators.multimodal import extract_features
    from csvplus_spark.operators.similarity import brute_force_topk

    feats = extract_features(media_df, dim=8)
    rows = feats.collect()
    assert len(rows) == 32  # 4 blobs x 8 dims
    assert all(-0.5 <= r["feature"] <= 0.5 for r in rows)
    # pivot the exploded features into an embedding column and run ANN:
    # the multimodal -> similarity composition end-to-end
    emb = (feats.groupBy("media_id")
           .agg(F.array_sort(F.collect_list(F.struct("feat_idx", "feature"))).alias("s"))
           .select(F.col("media_id").alias("vec_id"),
                   F.expr("transform(s, x -> x.feature)").alias("embedding")))
    out = brute_force_topk(emb, emb, k=2)
    assert out.count() == 8  # 4 queries x top-2
    assert out.filter(F.col("query_id") == F.col("corpus_id")).count() == 0


def test_resize_binary_roundtrip(media_df):
    from csvplus_spark.operators.multimodal import resize_images

    out = resize_images(media_df, 32, 16).collect()
    assert len(out) == 4
    for r in out:
        assert r["width"] == 32 and r["height"] == 16
        assert isinstance(r["data"], (bytes, bytearray))
        assert len(r["data"]) == 32 * 16  # size-proportional stub payload
    # deterministic across runs
    again = {r["media_id"]: bytes(r["data"])
             for r in resize_images(media_df, 32, 16).collect()}
    assert {r["media_id"]: bytes(r["data"]) for r in out} == again
    try:
        import PIL  # noqa: F401
    except ImportError:
        # unknown (non-image) blob → env-gate message; the fake "jpeg"
        # (magic only, garbage markers) → a REAL malformed-stream error
        # from the r9 baseline decoder. Filter per row: across
        # partitions, whichever task fails first would otherwise win.
        with pytest.raises(Exception, match="Pillow is not importable"):
            resize_images(media_df.filter("media_id = 4"), 32, 16,
                          real_codec=True).collect()
        with pytest.raises(Exception, match="segment|marker|JPEG"):
            resize_images(media_df.filter("media_id = 1"), 32, 16,
                          real_codec=True).collect()


def test_frame_sampling_one_to_many(media_df):
    out = sample_frames(media_df, n_frames=3)
    rows = out.collect()
    assert len(rows) == 12  # 4 blobs x 3 frames
    per = out.groupBy("media_id").agg(F.countDistinct("frame_md5").alias("n")).collect()
    assert all(r["n"] == 3 for r in per)


def _checker_png(w=12, h=7, ch=3):
    """Deterministic RGB(A) checker image + its PNG bytes (pure codec)."""
    from csvplus_spark.operators.pngcodec import encode_png

    px = bytearray()
    for y in range(h):
        for x in range(w):
            base = [255 * ((x + y) % 2), (x * 20) % 256, (y * 35) % 256]
            px += bytes(base[:ch] if ch <= 3 else base + [200])
    return bytes(px), encode_png(w, h, ch, bytes(px))


def test_pngcodec_roundtrip_and_filters():
    """VERDICT r6 item 4: the pure-Python PNG codec round-trips pixels
    exactly, and its decoder handles all five scanline filters (a
    crafted IDAT exercises Sub/Up/Average/Paeth, which our encoder
    never emits)."""
    import struct
    import zlib

    from csvplus_spark.operators.pngcodec import (PNG_MAGIC, _chunk,
                                                  decode_png, encode_png,
                                                  is_png, png_info)

    for ch in (1, 2, 3, 4):
        px, blob = _checker_png(12, 7, ch)
        assert is_png(blob)
        assert png_info(blob)[:2] == (12, 7)
        w, h, ch2, got = decode_png(blob)
        assert (w, h, ch2) == (12, 7, ch) and got == px

    # hand-built 3x5 RGB image using filters 0..4 (one per scanline):
    # decode must invert each filter exactly. Reference pixels chosen
    # so every filter sees non-trivial left/up/upper-left context.
    w, h, ch = 3, 5, 3
    rows = [bytes([(x * 37 + y * 91 + c * 13) % 256
                   for x in range(w) for c in range(ch)])
            for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(w * ch)
    for y, line in enumerate(rows):
        f = y % 5
        raw.append(f)
        for x in range(w * ch):
            left = line[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                raw.append(line[x])
            elif f == 1:
                raw.append((line[x] - left) & 0xFF)
            elif f == 2:
                raw.append((line[x] - up) & 0xFF)
            elif f == 3:
                raw.append((line[x] - ((left + up) >> 1)) & 0xFF)
            else:
                raw.append((line[x] - paeth(left, up, ul)) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    assert decode_png(blob) == (w, h, ch, b"".join(rows))

    # cross-check against Pillow when available (optional)
    try:
        import io

        from PIL import Image
    except ImportError:
        return
    _px, blob2 = _checker_png(9, 4, 3)
    with Image.open(io.BytesIO(blob2)) as im:
        assert im.size == (9, 4)
        assert im.tobytes() == _px
    with Image.open(io.BytesIO(blob)) as im:
        assert im.tobytes() == b"".join(rows)


def test_real_codec_png_without_pillow(spark):
    """The real_codec=True path must decode and resize REAL PNG bytes
    in this sandbox (no Pillow) via the pure-Python codec — true
    geometry out, re-decodable PNG back."""
    from csvplus_spark.operators.multimodal import resize_images
    from csvplus_spark.operators.pngcodec import decode_png

    _px, blob = _checker_png(37, 21, 3)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, data binary")
    got = decode_images(df, real_codec=True).collect()[0]
    assert (got["width"], got["height"], got["n_pixels"]) == (37, 21, 777)

    out = resize_images(df, 8, 6, real_codec=True).collect()[0]
    w, h, ch, px = decode_png(bytes(out["data"]))
    assert (w, h, ch) == (8, 6, 3) and len(px) == 8 * 6 * 3
    # nearest-neighbor: corner pixel survives exactly
    assert px[:3] == _px[:3]


def test_wavcodec_roundtrip_all_depths():
    """Pure-Python WAV codec: encode→decode identity for 8/16/24/32
    bit PCM incl. sign extension and odd data-chunk padding; malformed
    and compressed inputs raise."""
    import random
    import struct

    from csvplus_spark.operators.wavcodec import (decode_wav, encode_wav,
                                                  is_wav, wav_info)

    for bits in (8, 16, 24, 32):
        rng = random.Random(bits)
        lim = 1 << (bits - 1)
        samples = [rng.randrange(-lim, lim) for _ in range(101 * 2)]
        blob = encode_wav(8000, 2, bits, samples)
        assert is_wav(blob)
        info, back = decode_wav(blob)
        assert info == (8000, 2, bits, 101)
        assert back == samples
    with pytest.raises(ValueError):
        wav_info(b"not a wav at all")
    # format code 3 (float) is honestly rejected
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8)
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        wav_info(blob)


def test_decode_audio_real_and_stub(spark):
    """decode_audio: real_codec decodes actual WAV bytes through
    mapInPandas with exact integer stats; non-WAV blobs under
    real_codec raise the honest env-gate; the stub stays
    deterministic."""
    from csvplus_spark.operators.multimodal import decode_audio
    from csvplus_spark.operators.wavcodec import encode_wav

    samples = [0, 100, -200, 300, -32768, 32767]
    blob = encode_wav(16000, 1, 16, samples)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, data binary")
    r = decode_audio(df, real_codec=True).collect()[0]
    assert (r.sample_rate, r.channels, r.n_frames) == (16000, 1, 6)
    assert r.peak == 32768
    assert r.duration_us == 6 * 1_000_000 // 16000
    bad = spark.createDataFrame([(2, bytearray(b"mp3junk" * 4))],
                                "media_id long, data binary")
    with pytest.raises(Exception) as ei:
        decode_audio(bad, real_codec=True).collect()
    assert "RIFF/WAVE" in str(ei.value)
    stub = decode_audio(df, real_codec=False).collect()[0]
    assert stub.sample_rate == 8000 and stub.n_frames >= 10


def test_mp4_info_box_walk(spark):
    """BMFF walker: both mvhd versions parse; 64-bit largesize boxes
    and to-EOF boxes traverse; junk and mvhd-less streams raise; the
    Spark decode path carries exact integer durations."""
    import struct

    from csvplus_spark.operators.multimodal import (decode_video_meta,
                                                    encode_minimal_mp4,
                                                    mp4_info)

    for v in (0, 1):
        ts, dur, us = mp4_info(encode_minimal_mp4(30000, 90090, version=v))
        assert (ts, dur, us) == (30000, 90090, 3003000)
    # a largesize (size==1) free box before moov must be skipped
    base = encode_minimal_mp4(600, 1200)
    ftyp, moov = base[:24], base[24:]
    free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 20) + b"pad!"
    assert mp4_info(ftyp + free + moov)[2] == 2_000_000
    with pytest.raises(ValueError):
        mp4_info(b"garbage bytes here!!")
    with pytest.raises(ValueError):
        mp4_info(ftyp + struct.pack(">I", 8) + b"moov")  # no mvhd
    df = spark.createDataFrame(
        [(7, bytearray(encode_minimal_mp4(600, 1500)))],
        "media_id long, data binary")
    r = decode_video_meta(df, real_codec=True).collect()[0]
    assert (r.timescale, r.duration_units, r.duration_us) == (600, 1500,
                                                              2_500_000)


def test_jpegcodec_marker_walk():
    """SOF marker walk: roundtrip through encode_minimal_jpeg for
    baseline + progressive, fill bytes tolerated, malformed streams
    raise instead of guessing."""
    import struct

    import pytest as _pt

    from csvplus_spark.operators.jpegcodec import (encode_minimal_jpeg,
                                                   is_jpeg, jpeg_info)

    for w, h, nc, prog in [(1, 1, 1, False), (640, 480, 3, False),
                           (65535, 65535, 4, True), (13, 7, 2, True)]:
        blob = encode_minimal_jpeg(w, h, nc, prog)
        assert is_jpeg(blob)
        assert jpeg_info(blob) == (w, h, nc, prog)

    base = encode_minimal_jpeg(33, 44, 3)
    # extra APPn + COM segments before SOF are walked over
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    padded = base[:2] + b"\xff" + com + app1 + base[2:]  # fill byte too
    assert jpeg_info(padded)[:2] == (33, 44)
    # restart markers (standalone, no length) are skipped
    with_rst = base[:2] + b"\xff\xd0" + base[2:]
    assert jpeg_info(with_rst)[:2] == (33, 44)

    with _pt.raises(ValueError):
        jpeg_info(b"\x89PNG\r\n\x1a\n")        # not a JPEG
    with _pt.raises(ValueError):
        jpeg_info(b"\xff\xd8\xff\xd9")          # EOI before any SOF
    with _pt.raises(ValueError):
        jpeg_info(base[:10])                    # truncated mid-segment
    # DHT (C4) must NOT be mistaken for a frame header
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    assert jpeg_info(base[:2] + dht + base[2:])[:2] == (33, 44)


def test_decode_images_jpeg_without_pillow(spark):
    """The real_codec image path handles JPEG blobs via the marker
    walk when Pillow is absent — only non-PNG/JPEG formats env-gate."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed: exercises PIL, not the walker")
    except ImportError:
        pass
    import pandas as pd

    from csvplus_spark.operators.jpegcodec import encode_minimal_jpeg
    from csvplus_spark.operators.multimodal import decode_images
    from csvplus_spark.operators.pngcodec import encode_png

    rows = [(1, bytearray(encode_minimal_jpeg(100, 50, 3))),
            (2, bytearray(encode_png(4, 3, 1, bytes(range(12))))),
            (3, bytearray(encode_minimal_jpeg(7, 9, 1, progressive=True)))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r.media_id: (r.width, r.height, r.n_pixels)
           for r in decode_images(df, real_codec=True).collect()}
    assert out == {1: (100, 50, 5000), 2: (4, 3, 12), 3: (7, 9, 63)}


def test_jpeg_exif_orientation_walk():
    """EXIF orientation marker-walk (VERDICT r9 task 7 + ADVICE r8):
    crafted fixtures for both TIFF byte orders, the no-EXIF default,
    out-of-range degradation, and the progressive-SOF marker family."""
    import struct

    from csvplus_spark.operators.jpegcodec import (encode_minimal_jpeg,
                                                   jpeg_info,
                                                   jpeg_orientation)

    # encoder round-trip, every legal value (little-endian TIFF)
    for o in range(1, 9):
        blob = encode_minimal_jpeg(20, 10, orientation=o)
        assert jpeg_orientation(blob) == o
        assert jpeg_info(blob) == (20, 10, 3, False)  # EXIF untouched

    # no EXIF block → upright default
    assert jpeg_orientation(encode_minimal_jpeg(20, 10)) == 1

    # big-endian (MM) TIFF, hand-built: same tag must parse
    ifd = (struct.pack(">H", 1)
           + struct.pack(">HHIHH", 0x0112, 3, 1, 6, 0)
           + struct.pack(">I", 0))
    tiff = b"MM" + struct.pack(">HI", 42, 8) + ifd
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    base = encode_minimal_jpeg(20, 10)
    mm = base[:2] + app1 + base[2:]
    assert jpeg_orientation(mm) == 6

    # out-of-range orientation value (9) degrades to default, not error
    bad_ifd = (struct.pack("<H", 1)
               + struct.pack("<HHIHH", 0x0112, 3, 1, 9, 0)
               + struct.pack("<I", 0))
    bad_tiff = b"II" + struct.pack("<HI", 42, 8) + bad_ifd
    bad_payload = b"Exif\x00\x00" + bad_tiff
    bad_app1 = (b"\xff\xe1" + struct.pack(">H", len(bad_payload) + 2)
                + bad_payload)
    assert jpeg_orientation(base[:2] + bad_app1 + base[2:]) == 1

    # encoder rejects out-of-range up front
    try:
        encode_minimal_jpeg(20, 10, orientation=0)
        assert False
    except ValueError:
        pass

    # progressive flag covers the whole SOF family (ADVICE r8): byte-
    # patch the fixture's SOF2 marker to SOF6/SOF10/SOF14
    prog = encode_minimal_jpeg(20, 10, progressive=True)
    assert jpeg_info(prog)[3] is True
    for m in (0xC6, 0xCA, 0xCE):
        patched = prog.replace(b"\xff\xc2", bytes([0xFF, m]))
        assert jpeg_info(patched) == (20, 10, 3, True), hex(m)
    # and a baseline-extended SOF1 frame is NOT progressive
    sof1 = prog.replace(b"\xff\xc2", b"\xff\xc1")
    assert jpeg_info(sof1) == (20, 10, 3, False)


def test_jpeg_baseline_pixel_codec_roundtrip():
    """r9 full pixel codec: bounded lossy roundtrip across gray/RGB x
    4:4:4/4:2:0 x restart intervals on smooth images, deterministic
    encode, and honest failure on malformed / non-baseline streams."""
    import random

    from csvplus_spark.operators.jpegcodec import (decode_baseline_jpeg,
                                                   encode_baseline_jpeg,
                                                   jpeg_info)

    w, h = 24, 17  # deliberately not a multiple of 8
    smooth = bytes(min(255, max(0, int(128 + 60 * ((x / w) - (y / h))
                                       + c * 10)))
                   for y in range(h) for x in range(w) for c in range(3))
    for sub in ("444", "420"):
        for rst in (0, 2):
            blob = encode_baseline_jpeg(w, h, 3, smooth, quality=92,
                                        restart_interval=rst,
                                        subsampling=sub)
            assert jpeg_info(blob) == (w, h, 3, False)
            w2, h2, c2, out = decode_baseline_jpeg(blob)
            assert (w2, h2, c2) == (w, h, 3)
            diffs = [abs(a - b) for a, b in zip(smooth, out)]
            assert max(diffs) <= 3, (sub, rst, max(diffs))

    # grayscale gradient at q95 decodes near-exactly
    gray = bytes(((x * 7 + y * 5) % 256) for y in range(16)
                 for x in range(16))
    blob = encode_baseline_jpeg(16, 16, 1, gray, quality=95)
    _, _, c, out = decode_baseline_jpeg(blob)
    assert c == 1
    assert max(abs(a - b) for a, b in zip(gray, out)) <= 1

    # saturated color + 4:2:0: chroma is box-averaged, so allow more
    # error but the luma structure must survive
    blocks = bytes((255 if (x // 8 + y // 8) % 2 else 0)
                   if c == 0 else (0 if (x // 8 + y // 8) % 2 else 255)
                   for y in range(16) for x in range(16) for c in range(3))
    blob = encode_baseline_jpeg(16, 16, 3, blocks, quality=90,
                                subsampling="420")
    _, _, _, out = decode_baseline_jpeg(blob)
    mean_err = sum(abs(a - b) for a, b in zip(blocks, out)) / len(blocks)
    assert mean_err < 40  # hard edges ring, but the image survives

    # noise roundtrips lossily but deterministically
    random.seed(7)
    noise = bytes(random.randrange(256) for _ in range(w * h * 3))
    b1 = encode_baseline_jpeg(w, h, 3, noise, quality=90)
    assert b1 == encode_baseline_jpeg(w, h, 3, noise, quality=90)
    _, _, _, n1 = decode_baseline_jpeg(b1)
    _, _, _, n2 = decode_baseline_jpeg(b1)
    assert n1 == n2

    # honest gates: truncated scan, progressive frame, header-only
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b1[:len(b1) // 2])
    prog = b1.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive|baseline"):
        decode_baseline_jpeg(prog)
    from csvplus_spark.operators.jpegcodec import encode_minimal_jpeg
    with pytest.raises(ValueError):
        decode_baseline_jpeg(encode_minimal_jpeg(8, 8))  # no scan data
    with pytest.raises(ValueError):
        encode_baseline_jpeg(4, 4, 2, bytes(32))  # 2 channels
    with pytest.raises(ValueError):
        encode_baseline_jpeg(4, 4, 1, bytes(3))  # size mismatch


def test_resize_images_decodes_real_jpeg_pixels(spark):
    """real_codec resize now handles baseline JPEGs without Pillow:
    decode -> nearest resample -> re-encode; output is itself a
    decodable baseline JPEG of the target geometry."""
    from csvplus_spark.operators.jpegcodec import (decode_baseline_jpeg,
                                                   encode_baseline_jpeg)
    from csvplus_spark.operators.multimodal import resize_images

    w, h = 20, 12
    px = bytes(min(255, max(0, 40 + x * 9)) for y in range(h)
               for x in range(w))
    df = spark.createDataFrame(
        [(1, bytearray(encode_baseline_jpeg(w, h, 1, px, quality=95)))],
        "media_id long, data binary")
    out = resize_images(df, 10, 6, real_codec=True).collect()[0]
    w2, h2, c2, small = decode_baseline_jpeg(bytes(out["data"]))
    assert (w2, h2, c2) == (10, 6, 1)
    # nearest-neighbor of a horizontal gradient keeps monotone rows
    row = list(small[:10])
    assert row == sorted(row) and row[-1] > row[0]


def test_jpeg_decoder_review_hardening():
    """r9 review fixes: (a) single-component scans are non-interleaved
    per T.81 A.2 — a grayscale stream whose SOF declares h=v=2 decodes
    identically to the 1,1 form instead of scrambling; (b) truncated
    DQT/DHT raise ValueError (the documented malformed-stream
    contract), never IndexError; (c) restart_interval is validated up
    front."""
    from csvplus_spark.operators.jpegcodec import (decode_baseline_jpeg,
                                                   encode_baseline_jpeg)

    gray = bytes(((x * 7 + y * 5) % 256) for y in range(24)
                 for x in range(24))
    blob = encode_baseline_jpeg(24, 24, 1, gray, quality=95)
    # patch the SOF component sampling byte 0x11 -> 0x22: locate SOF0
    i = blob.index(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) ncomp(1) [cid hv tq]
    hv_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert blob[hv_off] == 0x11
    patched = blob[:hv_off] + b"\x22" + blob[hv_off + 1:]
    assert decode_baseline_jpeg(patched) == decode_baseline_jpeg(blob)

    with pytest.raises(ValueError):  # truncated DQT payload
        decode_baseline_jpeg(b"\xff\xd8\xff\xdb\x00\x03\x00\xff\xd9")
    with pytest.raises(ValueError):  # truncated DHT payload
        decode_baseline_jpeg(b"\xff\xd8\xff\xc4\x00\x04\x00\x01\xff\xd9")
    with pytest.raises(ValueError, match="restart_interval"):
        encode_baseline_jpeg(8, 8, 1, bytes(64), restart_interval=70000)
    with pytest.raises(ValueError, match="restart_interval"):
        encode_baseline_jpeg(8, 8, 1, bytes(64), restart_interval=-1)


def test_apply_orientation_group_properties():
    """EXIF orientation normalization: exact index remapping with the
    right group structure — flips and rotate-180 are involutions,
    rotate-90 four times is the identity, transpose twice is the
    identity, and every orientation is a bijection on pixels."""
    from csvplus_spark.operators.jpegcodec import apply_orientation

    w, h, ch = 5, 3, 3
    px = bytes((y * w + x) * 3 + c + 1 & 0xFF
               for y in range(h) for x in range(w) for c in range(ch))

    def ap(o, www, hhh, p):
        return apply_orientation(www, hhh, ch, p, o)

    for o in (2, 3, 4, 5, 7):  # involutions
        w2, h2, p2 = ap(o, w, h, px)
        w3, h3, p3 = ap(o, w2, h2, p2)
        assert (w3, h3, p3) == (w, h, px), o
    # rotate 90 CW x4 = identity; x2 = rotate 180
    cur = (w, h, px)
    for _ in range(4):
        cur = ap(6, *cur)
    assert cur == (w, h, px)
    r90 = ap(6, w, h, px)
    r180_via_90 = ap(6, *r90)
    assert r180_via_90 == ap(3, w, h, px)
    # 8 is the inverse of 6
    assert ap(8, *ap(6, w, h, px)) == (w, h, px)
    # bijection: multiset of pixel triples is preserved
    for o in range(1, 9):
        _, _, p2 = ap(o, w, h, px)
        assert sorted(p2) == sorted(px), o
    with pytest.raises(ValueError):
        apply_orientation(w, h, ch, px, 9)


def test_resize_auto_orients_exif_jpegs(spark):
    """A camera-style JPEG (landscape sensor pixels + orientation=6)
    must resize from the UPRIGHT geometry: a horizontal gradient in
    sensor space becomes a vertical gradient after auto-orient."""
    from csvplus_spark.operators.jpegcodec import (_exif_app1,
                                                   decode_baseline_jpeg,
                                                   encode_baseline_jpeg)
    from csvplus_spark.operators.multimodal import resize_images

    w, h = 24, 8  # sensor-native landscape
    px = bytes(min(255, 10 * x) for y in range(h) for x in range(w))
    blob = encode_baseline_jpeg(w, h, 1, px, quality=95)
    # splice the EXIF APP1 (orientation 6 = rotate 90 CW to display)
    blob = blob[:2] + _exif_app1(6) + blob[2:]
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, data binary")
    out = resize_images(df, 4, 12, real_codec=True).collect()[0]
    w2, h2, c2, small = decode_baseline_jpeg(bytes(out["data"]))
    assert (w2, h2, c2) == (4, 12, 1)
    # upright image = rotated gradient: now varies down the COLUMN and
    # is ~constant across each row
    col = [small[y * 4] for y in range(12)]
    row = list(small[:4])
    assert max(col) - min(col) > 100       # strong vertical variation
    assert max(row) - min(row) < 30, row   # near-flat horizontally


def test_jpeg_progressive_codec_matches_baseline():
    """r10 progressive codec: a progressive (SOF2) encoding of the same
    quantized coefficients decodes PIXEL-IDENTICAL to the baseline
    encoding's decode — any error in spectral-selection banding,
    successive-approximation shifts, EOB runs, AC refinement
    correction bits, or the optimized huffman tables breaks equality.
    Covers gray/RGB x 4:4:4/4:2:0 x both scan scripts x restarts."""
    from csvplus_spark.operators.jpegcodec import (
        _PROG_SCRIPT_SPECTRAL, _PROG_SCRIPT_SPECTRAL_GRAY,
        decode_baseline_jpeg, decode_jpeg, decode_progressive_jpeg,
        encode_baseline_jpeg, encode_progressive_jpeg, jpeg_info)

    import random

    random.seed(11)
    for w, h, ch, sub, rst in [
        (24, 17, 3, "444", 0),
        (24, 17, 3, "420", 0),
        (16, 16, 1, "444", 0),
        (33, 9, 3, "420", 2),   # restart interval in every scan
        (10, 26, 1, "444", 3),
    ]:
        px = bytes(random.randrange(256) for _ in range(w * h * ch))
        ref = decode_baseline_jpeg(
            encode_baseline_jpeg(w, h, ch, px, quality=90,
                                 subsampling=sub))
        for script in (None,
                       _PROG_SCRIPT_SPECTRAL if ch == 3
                       else _PROG_SCRIPT_SPECTRAL_GRAY):
            blob = encode_progressive_jpeg(
                w, h, ch, px, quality=90, subsampling=sub,
                script=script, restart_interval=rst)
            assert jpeg_info(blob) == (w, h, ch, True)
            got = decode_progressive_jpeg(blob)
            assert got == (w, h, ch, ref[3]), (w, h, ch, sub, rst,
                                               script is None)
            # the dispatcher routes by SOF marker
            assert decode_jpeg(blob) == got

    # determinism: identical inputs -> identical bytes
    px = bytes(random.randrange(256) for _ in range(20 * 20 * 3))
    b1 = encode_progressive_jpeg(20, 20, 3, px)
    assert b1 == encode_progressive_jpeg(20, 20, 3, px)


def test_jpeg_progressive_honest_gates():
    """Progressive decoder rejects what it cannot decode — arithmetic
    frames, truncated streams, malformed scan scripts — and the
    baseline decoder still refuses SOF2 (routing belongs to
    decode_jpeg)."""
    from csvplus_spark.operators.jpegcodec import (
        decode_baseline_jpeg, decode_jpeg, decode_progressive_jpeg,
        encode_baseline_jpeg, encode_progressive_jpeg)

    px = bytes(((x * 5 + y * 3) % 256) for y in range(16)
               for x in range(16))
    prog = encode_progressive_jpeg(16, 16, 1, px)

    with pytest.raises(ValueError, match="progressive|baseline"):
        decode_baseline_jpeg(prog)
    # arithmetic-coded progressive (SOF10 = 0xCA): honest gate
    arith = prog.replace(b"\xff\xc2", b"\xff\xca", 1)
    with pytest.raises(ValueError, match="arithmetic|SOF"):
        decode_progressive_jpeg(arith)
    with pytest.raises(ValueError):
        decode_jpeg(prog[:len(prog) // 3])  # truncated mid-stream
    with pytest.raises(ValueError):
        decode_progressive_jpeg(b"\x00\x01")  # not a JPEG
    # a baseline stream routed to the progressive decoder is refused
    base = encode_baseline_jpeg(16, 16, 1, px)
    with pytest.raises(ValueError):
        decode_progressive_jpeg(base)
    # malformed script: AC scan with two components
    with pytest.raises(ValueError, match="single-component"):
        encode_progressive_jpeg(16, 16, 3, px * 3,
                                script=[((0, 1), 1, 63, 0, 0)])


def test_resize_handles_progressive_jpeg(spark):
    """real_codec resize decodes PROGRESSIVE input without Pillow (the
    r9 gate this round closes) and re-encodes at target geometry."""
    from csvplus_spark.operators.jpegcodec import (decode_baseline_jpeg,
                                                   encode_progressive_jpeg)
    from csvplus_spark.operators.multimodal import resize_images

    w, h = 20, 12
    px = bytes(min(255, max(0, 40 + x * 9)) for y in range(h)
               for x in range(w))
    df = spark.createDataFrame(
        [(1, bytearray(encode_progressive_jpeg(w, h, 1, px,
                                               quality=95)))],
        "media_id long, data binary")
    out = resize_images(df, 10, 6, real_codec=True).collect()[0]
    w2, h2, c2, small = decode_baseline_jpeg(bytes(out["data"]))
    assert (w2, h2, c2) == (10, 6, 1)
    row = list(small[:10])
    assert row == sorted(row) and row[-1] > row[0]


def test_jpeg_422_subsampling_both_codecs():
    """r10: 4:2:2 (2x1 horizontal chroma) — the decoder supported
    h=2,v=1 frames since r9 but nothing in-tree produced them; the
    encoders now emit '422', and progressive 4:2:2 decodes
    pixel-identical to baseline 4:2:2."""
    import random

    from csvplus_spark.operators.jpegcodec import (
        decode_baseline_jpeg, decode_jpeg, encode_baseline_jpeg,
        encode_progressive_jpeg)

    w, h = 21, 14
    smooth = bytes(min(255, max(0, int(100 + 50 * (x / w) + 40 * (y / h))))
                   for y in range(h) for x in range(w) for _ in range(3))
    blob = encode_baseline_jpeg(w, h, 3, smooth, quality=92,
                                subsampling="422")
    w2, h2, c2, out = decode_baseline_jpeg(blob)
    assert (w2, h2, c2) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(smooth, out)) <= 4

    random.seed(13)
    px = bytes(random.randrange(256) for _ in range(w * h * 3))
    ref = decode_baseline_jpeg(
        encode_baseline_jpeg(w, h, 3, px, quality=90, subsampling="422"))
    prog = encode_progressive_jpeg(w, h, 3, px, quality=90,
                                   subsampling="422", restart_interval=2)
    assert decode_jpeg(prog) == ref

    with pytest.raises(ValueError, match="subsampling"):
        encode_baseline_jpeg(w, h, 3, px, subsampling="411")


def test_pngcodec_palette_and_trns():
    """r10 gate closure: palette (PLTE) images expand to RGB at every
    legal depth, tRNS palette alpha expands to RGBA (with 255 padding
    past the tRNS length), and a missing/short PLTE raises ValueError
    (not NotImplementedError — the gate is gone)."""
    import pytest as _pytest

    from csvplus_spark.operators.pngcodec import decode_png, encode_png_ex

    pal = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51))  # 4 colors
    w, h = 5, 3
    idx = [(x + y) % 4 for y in range(h) for x in range(w)]
    for depth in (2, 4, 8):
        blob = encode_png_ex(w, h, idx, depth, 3, palette=pal)
        got = decode_png(blob)
        exp = b"".join(bytes(pal[3 * i:3 * i + 3]) for i in idx)
        assert got == (w, h, 3, exp), f"depth {depth}"
    # 1-bit palette: indices 0/1 only
    idx1 = [(x ^ y) & 1 for y in range(h) for x in range(w)]
    got = decode_png(encode_png_ex(w, h, idx1, 1, 3, palette=pal))
    assert got[2] == 3 and got[3][:3] == pal[:3]

    # tRNS alpha: entry 0 transparent, entry 1 half, entries 2/3 pad 255
    blob = encode_png_ex(w, h, idx, 8, 3, palette=pal,
                         trns=bytes((0, 128)))
    gw, gh, gch, px = decode_png(blob)
    assert gch == 4
    alpha = {0: 0, 1: 128, 2: 255, 3: 255}
    exp = b"".join(bytes(pal[3 * i:3 * i + 3]) + bytes([alpha[i]])
                   for i in idx)
    assert px == exp

    with _pytest.raises(ValueError, match="PLTE"):
        decode_png(encode_png_ex(w, h, idx, 8, 3, palette=None))
    with _pytest.raises(ValueError, match="palette index"):
        decode_png(encode_png_ex(w, h, [7] * (w * h), 8, 3,
                                 palette=pal[:6]))


def test_pngcodec_bit_depths():
    """r10 gate closure: 16-bit samples downscale by the high byte
    (Pillow's I;16→L convention), sub-byte grey scales exactly by
    255/(2^d−1), and the tRNS color key on grey/RGB appends an alpha
    channel keyed on the RAW (pre-downscale) sample values."""
    from csvplus_spark.operators.pngcodec import decode_png, encode_png_ex

    # 16-bit grey / RGB / RGBA: high byte survives
    w, h = 4, 2
    g16 = [i * 0x1111 for i in range(w * h)]
    assert decode_png(encode_png_ex(w, h, g16, 16, 0)) == (
        w, h, 1, bytes((v >> 8) for v in g16))
    rgb16 = [(i * 257 + c * 1000) & 0xFFFF
             for i in range(w * h) for c in range(3)]
    assert decode_png(encode_png_ex(w, h, rgb16, 16, 2)) == (
        w, h, 3, bytes((v >> 8) for v in rgb16))
    rgba16 = [(i * 4097 + c) & 0xFFFF
              for i in range(w * h) for c in range(4)]
    assert decode_png(encode_png_ex(w, h, rgba16, 16, 6)) == (
        w, h, 4, bytes((v >> 8) for v in rgba16))

    # sub-byte grey: exact full-range scaling
    for depth, scale in ((1, 255), (2, 85), (4, 17)):
        mx = (1 << depth) - 1
        vals = [(x + y) % (mx + 1) for y in range(3) for x in range(7)]
        assert decode_png(encode_png_ex(7, 3, vals, depth, 0)) == (
            7, 3, 1, bytes(v * scale for v in vals))

    # tRNS color key: grey 8-bit (key=42) and RGB 16-bit (raw compare)
    g8 = [10, 42, 99, 42, 0, 7]
    gw, gh, gch, px = decode_png(
        encode_png_ex(3, 2, g8, 8, 0, trns=bytes((0, 42))))
    assert gch == 2
    assert px == b"".join(bytes((v, 0 if v == 42 else 255)) for v in g8)
    key = (0x1234, 0x0000, 0xFFFF)
    pix = [0x1234, 0x0000, 0xFFFF,  0x1234, 0x0000, 0xFFFE]
    import struct as _s
    gw, gh, gch, px = decode_png(
        encode_png_ex(2, 1, pix, 16, 2, trns=_s.pack(">HHH", *key)))
    assert gch == 4
    # pixel 0 matches the raw 16-bit key -> alpha 0; pixel 1 differs
    # only below the high byte -> SAME 8-bit color, alpha 255
    assert px[3] == 0 and px[7] == 255 and px[:3] == px[4:7]


def test_pngcodec_adam7_interlace():
    """r10 gate closure: Adam7 streams decode pixel-identically to the
    sequential encoding of the same samples — including sizes below
    one 8×8 tile (empty passes) and non-multiples of 8, palette and
    16-bit variants, and a Pillow cross-check when available."""
    from csvplus_spark.operators.pngcodec import decode_png, encode_png_ex

    for (w, h) in ((1, 1), (3, 3), (8, 8), (13, 9), (5, 17)):
        rgb = [(x * 37 + c * 91) & 0xFF
               for x in range(w * h) for c in range(3)]
        seq = decode_png(encode_png_ex(w, h, rgb, 8, 2, interlace=0))
        lace = decode_png(encode_png_ex(w, h, rgb, 8, 2, interlace=1))
        assert seq == lace, f"{w}x{h}"
    # palette + interlace + sub-byte packing in one stream
    pal = bytes(range(48))  # 16 colors
    idx = [(x * 7 + 3) % 16 for x in range(13 * 9)]
    seq = decode_png(encode_png_ex(13, 9, idx, 4, 3, palette=pal))
    lace = decode_png(encode_png_ex(13, 9, idx, 4, 3, palette=pal,
                                    interlace=1))
    assert seq == lace
    # 16-bit grey + interlace
    g16 = [(x * 521) & 0xFFFF for x in range(13 * 9)]
    assert decode_png(encode_png_ex(13, 9, g16, 16, 0, interlace=1)) == \
        decode_png(encode_png_ex(13, 9, g16, 16, 0))

    try:
        import io

        from PIL import Image
    except ImportError:
        return
    rgb = [(x * 37 + c * 91) & 0xFF for x in range(13 * 9) for c in range(3)]
    blob = encode_png_ex(13, 9, rgb, 8, 2, interlace=1)
    with Image.open(io.BytesIO(blob)) as im:
        assert im.tobytes() == bytes(rgb)


def test_resize_handles_palette_and_interlaced_png(spark):
    """The real_codec resize path now flows palette/interlaced PNGs
    end-to-end through mapInPandas without Pillow."""
    from csvplus_spark.operators.multimodal import resize_images
    from csvplus_spark.operators.pngcodec import decode_png, encode_png_ex

    pal = bytes((200, 10, 10, 10, 200, 10, 10, 10, 200))
    idx = [(x + y) % 3 for y in range(11) for x in range(17)]
    blob = encode_png_ex(17, 11, idx, 8, 3, palette=pal, interlace=1)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, data binary")
    out = resize_images(df, 6, 4, real_codec=True).collect()[0]
    w, h, ch, px = decode_png(bytes(out["data"]))
    assert (w, h, ch) == (6, 4, 3)
    # nearest-neighbor: the (0,0) pixel is palette entry idx[0]=0
    assert px[:3] == pal[:3]


def test_jpeg_arith_codec_matches_baseline():
    """r10 gate closure: the QM arithmetic codec (SOF9, T.81 Annex
    D/F) is a LOSSLESS entropy coder over the same quantized
    coefficients as the baseline encoder — decoded pixels must be
    bit-identical to the huffman decode across geometries,
    subsampling, restarts, and non-default DAC conditioning."""
    from csvplus_spark.operators.jpegarith import (decode_arith_jpeg,
                                                   encode_arith_jpeg)
    from csvplus_spark.operators.jpegcodec import (decode_baseline_jpeg,
                                                   encode_baseline_jpeg)

    for (w, h, ch, q, ri, sub, L, U, kx) in [
        (19, 13, 3, 90, 0, "444", 0, 1, 5),
        (24, 16, 3, 75, 0, "420", 0, 1, 5),
        (22, 10, 3, 85, 0, "422", 0, 1, 5),
        (17, 9, 1, 50, 2, "444", 0, 1, 5),
        (16, 16, 3, 95, 0, "444", 1, 3, 20),
        (40, 28, 3, 30, 4, "422", 2, 4, 63),
        (1, 1, 1, 90, 0, "444", 0, 1, 5),
    ]:
        px = bytes(((x * 7 + y * 5 + c * 37 + w) % 256)
                   for y in range(h) for x in range(w) for c in range(ch))
        got = decode_arith_jpeg(encode_arith_jpeg(
            w, h, ch, px, quality=q, restart_interval=ri,
            subsampling=sub, dc_L=L, dc_U=U, ac_Kx=kx))
        base = decode_baseline_jpeg(encode_baseline_jpeg(
            w, h, ch, px, quality=q, restart_interval=ri,
            subsampling=sub))
        assert got == base, (w, h, ch, q, ri, sub, L, U, kx)


def test_jpeg_arith_noise_stress_and_size():
    """High-entropy input at high quality drives deep magnitude bins,
    renormalization chains, and output carries; pixels still match the
    huffman decode exactly, and on the smooth fixture the arithmetic
    stream is SMALLER than huffman (the reason SOF9 exists)."""
    from csvplus_spark.operators.jpegarith import (decode_arith_jpeg,
                                                   encode_arith_jpeg)
    from csvplus_spark.operators.jpegcodec import (decode_baseline_jpeg,
                                                   encode_baseline_jpeg)

    w, h = 33, 25
    seed = 123456789
    noise = bytearray()
    for _ in range(w * h * 3):
        seed = (1103515245 * seed + 12345) % (1 << 31)
        noise.append(seed & 0xFF)
    noise = bytes(noise)
    for q in (95, 70):
        got = decode_arith_jpeg(encode_arith_jpeg(w, h, 3, noise, quality=q))
        base = decode_baseline_jpeg(
            encode_baseline_jpeg(w, h, 3, noise, quality=q))
        assert got == base
    smooth = bytes(min(255, 60 + x * 3 + y) for y in range(h)
                   for x in range(w) for _ in range(3))
    assert len(encode_arith_jpeg(w, h, 3, smooth)) < \
        len(encode_baseline_jpeg(w, h, 3, smooth))


def test_jpeg_arith_state_table_and_stream():
    """Structural pins for the T.81 Table D.3 state machine and the
    entropy-coded segment: the documented switch states, terminal
    state 13, the fixed sign bin 113 self-loop; every 0xFF in the
    coded segment is stuffed or a restart; the dispatcher routes SOF9
    and the single-codec decoders reject each other's frames."""
    import pytest as _pytest

    from csvplus_spark.operators.jpegarith import (_QE_TAB,
                                                   decode_arith_jpeg,
                                                   encode_arith_jpeg)
    from csvplus_spark.operators.jpegcodec import (decode_baseline_jpeg,
                                                   decode_jpeg,
                                                   encode_baseline_jpeg)

    assert len(_QE_TAB) == 114
    assert _QE_TAB[0][0] == 0x5A1D
    assert all(qe < 0x8000 for qe, *_ in _QE_TAB)
    assert all(0 <= nm <= 113 and 0 <= nl <= 113
               for _, nm, nl, _sw in _QE_TAB)
    # T.81 Table D.3: SWITCH=1 exactly at the MPS-flip states
    assert [i for i, t in enumerate(_QE_TAB) if t[3]] == \
        [0, 14, 36, 64, 80, 88, 95, 105, 110, 112]
    assert _QE_TAB[13][1] == 13          # terminal estimation state
    assert _QE_TAB[113][1:3] == (113, 113)  # fixed sign bin

    w, h = 26, 18
    px = bytes(((x * 11 + y * 3) % 256) for y in range(h)
               for x in range(w) for _ in range(3))
    blob = encode_arith_jpeg(w, h, 3, px, restart_interval=2)
    # entropy segment: after SOS payload, before EOI
    sos = blob.index(b"\xff\xda")
    seg_len = int.from_bytes(blob[sos + 2:sos + 4], "big")
    data = blob[sos + 2 + seg_len:-2]
    i = 0
    while i < len(data):
        if data[i] == 0xFF:
            nxt = data[i + 1]
            assert nxt == 0x00 or 0xD0 <= nxt <= 0xD7, f"byte {i}: {nxt:#x}"
            i += 2
        else:
            i += 1
    assert decode_jpeg(blob) == decode_arith_jpeg(blob)
    with _pytest.raises(ValueError, match="SOF9"):
        decode_baseline_jpeg(blob)
    with _pytest.raises(ValueError, match="SOF9"):
        decode_arith_jpeg(encode_baseline_jpeg(w, h, 3, px))


def test_jpeg_12bit_extended_codec():
    """r10 gate closure: 12-bit extended sequential (SOF1, P=12,
    16-bit DQT pq=1, optimized huffman with the >10 magnitude
    categories Annex K never covers). Decode downscales /16 to the
    8-bit contract: flat images are EXACT, smooth gradients within
    1 LSB at high quality; 4:2:0 + restarts work; SOF0 with P=12 and
    out-of-range samples are rejected."""
    import pytest as _pytest

    from csvplus_spark.operators.jpegcodec import (decode_baseline_jpeg,
                                                   decode_jpeg,
                                                   encode_extended12_jpeg,
                                                   jpeg_info)

    w, h = 20, 12
    flat = [3000] * (w * h)
    blob = encode_extended12_jpeg(w, h, 1, flat, quality=95)
    assert blob[blob.index(b"\xff\xc1") + 4] == 12  # SOF1 precision
    assert jpeg_info(blob)[:2] == (w, h)
    gw, gh, gc, px = decode_jpeg(blob)
    assert (gw, gh, gc) == (w, h, 1) and set(px) == {188}  # 3000/16

    w, h = 25, 17
    grad = [min(4095, 300 + x * 60 + y * 40 + c * 200)
            for y in range(h) for x in range(w) for c in range(3)]
    exp = [v // 16 for v in grad]
    _, _, _, px = decode_jpeg(
        encode_extended12_jpeg(w, h, 3, grad, quality=97))
    assert max(abs(a - b) for a, b in zip(px, exp)) <= 1
    gw, gh, gc, px = decode_jpeg(encode_extended12_jpeg(
        w, h, 3, grad, quality=90, subsampling="420", restart_interval=2))
    assert (gw, gh, gc) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(px, exp)) <= 3

    # high-entropy stress: deterministic decode, 12-bit magnitudes
    seed = 42
    noise = []
    for _ in range(16 * 16):
        seed = (1103515245 * seed + 12345) % (1 << 31)
        noise.append(seed % 4096)
    b1 = encode_extended12_jpeg(16, 16, 1, noise, quality=95)
    assert decode_jpeg(b1) == decode_jpeg(b1)

    with _pytest.raises(ValueError, match="0-4095"):
        encode_extended12_jpeg(2, 1, 1, [0, 4096])
    # a forged SOF0 with P=12 must be rejected (T.81 B.2: baseline is
    # 8-bit only)
    forged = b1.replace(b"\xff\xc1", b"\xff\xc0", 1)
    with _pytest.raises(ValueError, match="SOF1"):
        decode_baseline_jpeg(forged)


def test_jpeg_progressive_arith_codec():
    """r10 gate closure: PROGRESSIVE ARITHMETIC (SOF10) — the Annex
    G.2 scan structure (spectral selection, successive approximation,
    DC/AC refinement) over the QM coder. The full-script decode must
    be pixel-identical to the baseline huffman decode of the same
    coefficients, across subsampling / restart / spectral-only-script
    / conditioning variants; the dispatcher routes SOF10."""
    from csvplus_spark.operators.jpegarith import (
        decode_arith_progressive_jpeg, encode_arith_progressive_jpeg)
    from csvplus_spark.operators.jpegcodec import (
        _PROG_SCRIPT_SPECTRAL, _PROG_SCRIPT_SPECTRAL_GRAY,
        decode_baseline_jpeg, decode_jpeg, encode_baseline_jpeg)

    for (w, h, ch, q, ri, sub, script, L, U, kx) in [
        (24, 16, 3, 75, 0, "420", None, 0, 1, 5),
        (17, 9, 1, 50, 2, "444", None, 0, 1, 5),
        (16, 16, 3, 95, 0, "444", _PROG_SCRIPT_SPECTRAL, 1, 3, 20),
        (26, 18, 1, 90, 4, "444", _PROG_SCRIPT_SPECTRAL_GRAY, 0, 2, 1),
        (40, 28, 3, 30, 2, "422", None, 2, 4, 63),
        (1, 1, 1, 90, 0, "444", None, 0, 1, 5),
    ]:
        px = bytes(((x * 7 + y * 5 + c * 37 + w) % 256)
                   for y in range(h) for x in range(w) for c in range(ch))
        blob = encode_arith_progressive_jpeg(
            w, h, ch, px, quality=q, restart_interval=ri,
            subsampling=sub, script=script, dc_L=L, dc_U=U, ac_Kx=kx)
        got = decode_arith_progressive_jpeg(blob)
        base = decode_baseline_jpeg(encode_baseline_jpeg(
            w, h, ch, px, quality=q, subsampling=sub))
        assert got == base, (w, h, ch, q, ri, sub, L, U, kx)
        assert decode_jpeg(blob) == got  # dispatcher routes SOF10

    # high-entropy stress (deep refinement scans + carries)
    seed = 777
    noise = bytearray()
    for _ in range(33 * 25 * 3):
        seed = (1103515245 * seed + 12345) % (1 << 31)
        noise.append(seed & 0xFF)
    for q in (95, 60):
        got = decode_arith_progressive_jpeg(
            encode_arith_progressive_jpeg(33, 25, 3, bytes(noise),
                                          quality=q))
        assert got == decode_baseline_jpeg(
            encode_baseline_jpeg(33, 25, 3, bytes(noise), quality=q))


def test_jpeg_lossless_codec_exact_roundtrip():
    """r10 gate closure: LOSSLESS JPEG (SOF3, T.81 Annex H) — the one
    JPEG mode with a bit-exact contract: decode(encode(x)) == x at
    P=8 for every predictor selector, gray and RGB (no color
    transform), with restarts. Point transform re-expands <<Pt; 16-bit
    precision downscales >>8; the dispatcher routes SOF3 and rejects
    non-SOF3 in the single-mode decoder."""
    import pytest as _pytest

    from csvplus_spark.operators.jpegcodec import (decode_jpeg,
                                                   decode_lossless_jpeg,
                                                   encode_baseline_jpeg,
                                                   encode_lossless_jpeg)

    w, h = 23, 11
    px = bytes(((x * 17 + y * 29) % 256) for y in range(h)
               for x in range(w))
    for pred in range(1, 8):
        blob = encode_lossless_jpeg(w, h, 1, list(px), predictor=pred)
        assert decode_lossless_jpeg(blob) == (w, h, 1, px), pred
        assert decode_jpeg(blob) == (w, h, 1, px), pred
    rgb = bytes(((x * 11 + y * 7 + c * 53) % 256) for y in range(h)
                for x in range(w) for c in range(3))
    blob = encode_lossless_jpeg(w, h, 3, list(rgb), predictor=4,
                                restart_interval=3 * w)
    assert decode_lossless_jpeg(blob) == (w, h, 3, rgb)
    # restarts re-enter start-of-scan prediction (T.81 H.2.3): the
    # interval's first row must encode Ra-chain, not cross-restart Rb
    # references — and non-row-aligned intervals are an honest gate
    with _pytest.raises(ValueError, match="multiple of the width"):
        encode_lossless_jpeg(w, h, 3, list(rgb), restart_interval=5)
    # noise is still EXACT (losslessness doesn't depend on smoothness)
    seed = 99
    noise = bytearray()
    for _ in range(w * h):
        seed = (1103515245 * seed + 12345) % (1 << 31)
        noise.append(seed & 0xFF)
    noise = bytes(noise)
    assert decode_lossless_jpeg(
        encode_lossless_jpeg(w, h, 1, list(noise), predictor=7)
    ) == (w, h, 1, noise)
    # point transform: samples pre-shifted >>2, re-expanded <<2
    blob = encode_lossless_jpeg(w, h, 1, list(px), predictor=1, pt=2)
    got = decode_lossless_jpeg(blob)
    assert got == (w, h, 1, bytes((v >> 2) << 2 for v in px))
    # 16-bit precision → high-byte output
    s16 = [(x * 2917 + y * 1031) % 65536 for y in range(h)
           for x in range(w)]
    assert decode_lossless_jpeg(encode_lossless_jpeg(
        w, h, 1, s16, precision=16, predictor=7)) == (
        w, h, 1, bytes(v >> 8 for v in s16))
    with _pytest.raises(ValueError, match="SOF3"):
        decode_lossless_jpeg(encode_baseline_jpeg(4, 4, 1, bytes(16)))


def test_gifcodec_roundtrip_and_variants():
    """r10: pure-Python GIF codec — LZW (variable-width, dict reset),
    interlace, transparency → RGBA, multi-frame walk, 4/16/256-color
    palettes; gif_info counts frames without decompressing; malformed
    streams raise ValueError."""
    import pytest as _pytest

    from csvplus_spark.operators.gifcodec import (decode_gif, encode_gif,
                                                  gif_info, is_gif)

    pal = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 40, 40, 40))
    w, h = 13, 9
    idx = [(x + y) % 4 for y in range(h) for x in range(w)]
    exp = b"".join(bytes(pal[3 * i:3 * i + 3]) for i in idx)
    blob = encode_gif(w, h, pal, idx)
    assert is_gif(blob) and gif_info(blob) == (w, h, 1)
    assert decode_gif(blob) == (w, h, 3, exp)
    assert decode_gif(encode_gif(w, h, pal, idx, interlace=True)) == \
        (w, h, 3, exp)

    gw, gh, gc, px = decode_gif(encode_gif(w, h, pal, idx, transparent=2))
    assert gc == 4
    assert all(px[4 * i + 3] == (0 if idx[i] == 2 else 255)
               for i in range(w * h))

    idx2 = [(x * y) % 4 for y in range(h) for x in range(w)]
    anim = encode_gif(w, h, pal, idx, extra_frames=[idx2, idx])
    assert gif_info(anim)[2] == 3
    assert decode_gif(anim, frame=1)[3] == b"".join(
        bytes(pal[3 * i:3 * i + 3]) for i in idx2)

    # LZW code-width growth + dictionary churn on a 256-color image
    pal256 = bytes(b for i in range(256) for b in (i, 255 - i, i ^ 0x55))
    big = [(x + y * 3) % 256 for y in range(40) for x in range(50)]
    assert decode_gif(encode_gif(50, 40, pal256, big))[3] == b"".join(
        bytes(pal256[3 * i:3 * i + 3]) for i in big)

    with _pytest.raises(ValueError, match="magic"):
        decode_gif(b"NOTGIF" + bytes(20))
    with _pytest.raises(ValueError, match="frame"):
        decode_gif(blob, frame=5)


def test_gif_spark_paths(spark):
    """GIF flows through all three real_codec mapInPandas paths:
    decode_images geometry, resize_images (first frame → PNG out),
    and sample_frames REAL frame fan-out with evenly-spaced picks."""
    from csvplus_spark.operators.gifcodec import encode_gif
    from csvplus_spark.operators.multimodal import (decode_images,
                                                    resize_images,
                                                    sample_frames)
    from csvplus_spark.operators.pngcodec import decode_png

    pal = bytes((200, 10, 10, 10, 200, 10, 10, 10, 200))
    w, h = 17, 11
    frames = [[(x + y + f) % 3 for y in range(h) for x in range(w)]
              for f in range(5)]
    blob = encode_gif(w, h, pal, frames[0], extra_frames=frames[1:])
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, data binary")
    got = decode_images(df, real_codec=True).collect()[0]
    assert (got["width"], got["height"]) == (w, h)

    out = resize_images(df, 6, 4, real_codec=True).collect()[0]
    rw, rh, rc, px = decode_png(bytes(out["data"]))
    assert (rw, rh, rc) == (6, 4, 3) and px[:3] == pal[:3]

    rows = sample_frames(df, n_frames=3, real_codec=True) \
        .orderBy("frame_no").collect()
    assert [r["frame_no"] for r in rows] == [0, 2, 4]  # evenly spaced
    assert len({r["frame_md5"] for r in rows}) == 3  # distinct frames


def test_flaccodec_exact_roundtrip():
    """r10: pure-Python FLAC codec — CONSTANT / VERBATIM / FIXED+Rice
    subframes, mid/side decorrelation, 8/16/24-bit, multi-frame
    streams, CRC-8/16 verification. FLAC is lossless: the roundtrip
    is bit-exact everywhere, including high-entropy residuals."""
    import math

    import pytest as _pytest

    from csvplus_spark.operators.flaccodec import (decode_flac,
                                                   encode_flac,
                                                   flac_info, is_flac)

    n = 1000
    s = [int(8000 * math.sin(i / 7.0)) for i in range(n)]
    blob = encode_flac(44100, 1, 16, s)
    assert is_flac(blob) and flac_info(blob) == (44100, 1, 16, n)
    assert decode_flac(blob) == ((44100, 1, 16, n), s)
    assert len(blob) < 2 * n  # rice beats raw 16-bit on the smooth sine

    st = [v for i in range(n) for v in (s[i], -s[i] // 2)]
    assert decode_flac(encode_flac(22050, 2, 16, st))[1] == st
    assert decode_flac(encode_flac(48000, 2, 16, st, mid_side=True))[1] \
        == st

    s8 = [(i * 37 % 256) - 128 for i in range(300)]
    assert decode_flac(encode_flac(8000, 1, 8, s8, verbatim=True))[1] == s8
    assert decode_flac(encode_flac(16000, 1, 16, [42] * 600))[1] == \
        [42] * 600

    seed, noise = 1, []
    for _ in range(500):
        seed = (1103515245 * seed + 12345) % (1 << 31)
        noise.append((seed % (1 << 24)) - (1 << 23))
    assert decode_flac(encode_flac(96000, 1, 24, noise))[1] == noise

    # corrupt one scan byte: a CRC must catch it
    bad = bytearray(encode_flac(44100, 1, 16, s))
    bad[-10] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_flac(bytes(bad))
    with _pytest.raises(ValueError, match="magic"):
        decode_flac(b"NOTF" + bytes(40))


def test_decode_audio_flac_path(spark):
    """decode_audio(real_codec=True) dispatches WAV and FLAC through
    ONE plan and produces identical stats for identical samples."""
    from csvplus_spark.operators.flaccodec import encode_flac
    from csvplus_spark.operators.multimodal import decode_audio
    from csvplus_spark.operators.wavcodec import encode_wav

    s = [((i * 17) % 4096) - 2048 for i in range(200)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(8000, 1, 16, s))),
         (2, bytearray(encode_flac(8000, 1, 16, s)))],
        "media_id long, data binary")
    rows = {r["media_id"]: r for r in
            decode_audio(df, real_codec=True).collect()}
    for col in ("sample_rate", "channels", "n_frames", "duration_us",
                "peak", "rms"):
        assert rows[1][col] == rows[2][col], col


def test_tiffcodec_roundtrip_and_variants():
    """r10: pure-Python baseline TIFF codec — none/TIFF-LZW (MSB-first
    EarlyChange, not GIF's)/PackBits compression, predictor 2,
    multi-strip, multi-page IFD chain, gray/RGB/RGBA, 1-bit bilevel
    expansion, both byte orders rejected... II written, MM parsed."""
    import struct as _s

    import pytest as _pytest

    from csvplus_spark.operators.tiffcodec import (decode_tiff,
                                                   encode_tiff,
                                                   is_tiff, tiff_info)

    w, h = 19, 13
    gray = bytes(((x * 17 + y * 29) % 256) for y in range(h)
                 for x in range(w))
    rgb = bytes(((x * 11 + y * 7 + c * 53) % 256) for y in range(h)
                for x in range(w) for c in range(3))
    for comp in (1, 5, 32773):
        for predictor in (1, 2):
            blob = encode_tiff([(w, h, 1, gray)], compression=comp,
                               predictor=predictor)
            assert is_tiff(blob)
            assert decode_tiff(blob) == (w, h, 1, gray), (comp, predictor)
            blob = encode_tiff([(w, h, 3, rgb)], compression=comp,
                               predictor=predictor, rows_per_strip=4)
            assert decode_tiff(blob) == (w, h, 3, rgb), (comp, predictor)

    blob = encode_tiff([(w, h, 1, gray), (w, h, 3, rgb)], compression=5)
    assert tiff_info(blob) == (w, h, 2)
    assert decode_tiff(blob, page=1) == (w, h, 3, rgb)

    rgba = bytes(((x + y + c * 19) % 256) for y in range(h)
                 for x in range(w) for c in range(4))
    assert decode_tiff(encode_tiff([(w, h, 4, rgba)],
                                   compression=32773)) == (w, h, 4, rgba)

    # hand-built MM (big-endian) 1-bit bilevel 10x2, WhiteIsZero
    rowb = (10 + 7) // 8
    bits = bytes([0b10110010, 0b01000000, 0b01001101, 0b10000000])
    entries = [
        (256, 3, 1, 10), (257, 3, 1, 2), (258, 3, 1, 1), (259, 3, 1, 1),
        (262, 3, 1, 0), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 2),
        (279, 4, 1, 2 * rowb),
    ]
    ifd_off = 8 + len(bits)
    mm = bytearray(b"MM\x00*" + _s.pack(">I", ifd_off) + bits)
    mm += _s.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        payload = _s.pack(">H", val) + b"\x00\x00" if typ == 3 \
            else _s.pack(">I", val)
        mm += _s.pack(">HHI", tag, typ, cnt) + payload
    mm += b"\x00\x00\x00\x00"
    gw, gh, gc, px = decode_tiff(bytes(mm))
    assert (gw, gh, gc) == (10, 2, 1)
    # WhiteIsZero: bit 1 -> black=0? photometric 0 means 0=white, so
    # bit 1 inverts to 0
    assert px[0] == 0 and px[2] == 0 and px[1] == 255

    with _pytest.raises(ValueError, match="magic"):
        decode_tiff(b"XXXX" + bytes(20))
    with _pytest.raises(ValueError, match="compression"):
        decode_tiff(encode_tiff([(4, 4, 1, bytes(16))]).replace(
            _s.pack("<HHI", 259, 3, 1) + _s.pack("<H", 1) + b"\x00\x00",
            _s.pack("<HHI", 259, 3, 1) + _s.pack("<H", 7) + b"\x00\x00"))


def test_tiff_spark_paths(spark):
    """TIFF flows through decode_images geometry and the resize path
    (first page → PNG out) via mapInPandas."""
    from csvplus_spark.operators.multimodal import (decode_images,
                                                    resize_images)
    from csvplus_spark.operators.pngcodec import decode_png
    from csvplus_spark.operators.tiffcodec import encode_tiff

    w, h = 17, 11
    rgb = bytes(((x * 3 + y * 5 + c) % 256) for y in range(h)
                for x in range(w) for c in range(3))
    blob = encode_tiff([(w, h, 3, rgb)], compression=5, predictor=2)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, data binary")
    got = decode_images(df, real_codec=True).collect()[0]
    assert (got["width"], got["height"]) == (w, h)
    out = resize_images(df, 6, 4, real_codec=True).collect()[0]
    rw, rh, rc, px = decode_png(bytes(out["data"]))
    assert (rw, rh, rc) == (6, 4, 3) and px[:3] == rgb[:3]


def test_bmpcodec_and_spark_paths(spark):
    """r10: BMP codec — 24-bit both row orders, 32-bit BGRA, 8-bit
    palettized, 4-byte row padding; flows through decode_images
    geometry and the resize path (stays BMP out)."""
    import struct as _s

    import pytest as _pytest

    from csvplus_spark.operators.bmpcodec import (bmp_info, decode_bmp,
                                                  encode_bmp, is_bmp)
    from csvplus_spark.operators.multimodal import (decode_images,
                                                    resize_images)

    w, h = 13, 7
    rgb = bytes(((x * 11 + y * 29 + c * 3) % 256) for y in range(h)
                for x in range(w) for c in range(3))
    for td in (False, True):
        blob = encode_bmp(w, h, rgb, top_down=td)
        assert is_bmp(blob) and bmp_info(blob) == (w, h, 24)
        assert decode_bmp(blob) == (w, h, 3, rgb), td

    # hand-built 8-bit palettized (bottom-up) — palette is BGRX
    pal = b"".join(bytes((i, 255 - i, i ^ 0x33, 0)) for i in range(16))
    idx = bytes(((x + y) % 16) for y in range(4) for x in range(5))
    rb = (5 + 3) & ~3
    body = b"".join(bytes(idx[(3 - y) * 5:(3 - y) * 5 + 5])
                    + bytes(rb - 5) for y in range(4))
    hdr = b"BM" + _s.pack("<IHHI", 54 + 64 + len(body), 0, 0, 54 + 64)
    info = _s.pack("<IiiHHIIiiII", 40, 5, 4, 1, 8, 0, len(body),
                   0, 0, 16, 0)
    gw, gh, gc, px = decode_bmp(hdr + info + pal + body)
    exp = b"".join(bytes((pal[4 * i + 2], pal[4 * i + 1], pal[4 * i]))
                   for i in idx)
    assert (gw, gh, gc, px) == (5, 4, 3, exp)

    with _pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + bytes(60))

    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(w, h, rgb)))],
        "media_id long, data binary")
    got = decode_images(df, real_codec=True).collect()[0]
    assert (got["width"], got["height"]) == (w, h)
    out = resize_images(df, 6, 4, real_codec=True).collect()[0]
    rw, rh, rc, px = decode_bmp(bytes(out["data"]))
    assert (rw, rh, rc) == (6, 4, 3) and px[:3] == rgb[:3]


def test_apng_frames(spark):
    """r10: APNG (acTL/fcTL/fdAT) — frame walk without decompressing,
    per-frame decode (full-canvas and sub-rectangle with transparent
    off-frame), plain-PNG = 1-frame contract, and the real
    sample_frames path dispatching GIF AND APNG in one plan."""
    import hashlib

    from csvplus_spark.operators.gifcodec import encode_gif
    from csvplus_spark.operators.multimodal import sample_frames
    from csvplus_spark.operators.pngcodec import (apng_info,
                                                  decode_apng_frame,
                                                  encode_apng,
                                                  encode_png)

    w, h = 14, 9
    f0 = bytes(((x + y) % 256) for y in range(h) for x in range(w)
               for _ in range(3))
    f1 = bytes(((x * y + 7) % 256) for y in range(h) for x in range(w)
               for _ in range(3))
    blob = encode_apng(w, h, 3, [f0, f1])
    assert apng_info(blob) == (w, h, 2)
    assert decode_apng_frame(blob, 0) == (w, h, 3, f0)
    assert decode_apng_frame(blob, 1) == (w, h, 3, f1)

    sub = bytes(((x * 3) % 256) for _ in range(4) for x in range(6)
                for _ in range(3))
    blob2 = encode_apng(w, h, 3, [f0, sub],
                        rects=[(0, 0, w, h), (2, 3, 6, 4)])
    gw, gh, gc, px = decode_apng_frame(blob2, 1)
    assert gc == 4 and px[3] == 0  # off-frame transparent
    o = ((3 * w) + 2) * 4
    assert px[o:o + 3] == sub[:3] and px[o + 3] == 255

    plain = encode_png(w, h, 3, f0)
    assert apng_info(plain) == (w, h, 1)
    assert decode_apng_frame(plain, 0) == (w, h, 3, f0)

    # one sample_frames plan over a GIF and an APNG
    pal = bytes((10, 20, 30, 200, 100, 50, 0, 0, 0))
    gif = encode_gif(5, 4, pal, [0, 1, 2] * 6 + [0, 1],
                     extra_frames=[[1, 2, 0] * 6 + [1, 2]])
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(gif))],
        "media_id long, data binary")
    rows = sample_frames(df, n_frames=3, real_codec=True).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 2 and len(by_id[2]) == 2
    assert {r["frame_no"] for r in by_id[1]} == {0, 1}
    exp0 = hashlib.md5(f0).hexdigest()
    assert any(r["frame_md5"] == exp0 for r in by_id[1])


def test_bmp_bitfields_mask_validation():
    """r11 ADVICE: BI_BITFIELDS (comp=3, 32-bit) must READ the mask
    dwords — standard BGRA masks decode, anything else raises instead
    of silently swapping channels."""
    import struct as _s

    import pytest as _pytest

    from csvplus_spark.operators.bmpcodec import decode_bmp

    w, h = 2, 2
    # bottom-up BGRA rows: pixel (x, y) = (b, g, r, a) distinct bytes
    def px(x, y):
        return bytes((10 + x, 20 + y, 30 + x + y, 255))

    body = b"".join(b"".join(px(x, y) for x in range(w))
                    for y in (1, 0))

    def bmp40(rm, gm, bm):
        # BITMAPINFOHEADER + 3 extra mask dwords, data at 66
        hdr = b"BM" + _s.pack("<IHHI", 66 + len(body), 0, 0, 66)
        info = _s.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3,
                       len(body), 0, 0, 0, 0)
        return hdr + info + _s.pack("<III", rm, gm, bm) + body

    def bmp108(rm, gm, bm, am):
        # BITMAPV4HEADER: masks in-header at the same absolute offsets
        hdr = b"BM" + _s.pack("<IHHI", 122 + len(body), 0, 0, 122)
        info = _s.pack("<IiiHHIIiiII", 108, w, h, 1, 32, 3,
                       len(body), 0, 0, 0, 0)
        info += _s.pack("<IIII", rm, gm, bm, am)
        info += bytes(108 - len(info))
        return hdr + info + body

    # standard masks → decodes as BGRA
    gw, gh, gc, out = decode_bmp(
        bmp40(0x00FF0000, 0x0000FF00, 0x000000FF))
    assert (gw, gh, gc) == (w, h, 4)
    assert out[:4] == bytes((30, 20, 10, 255))  # (r, g, b, a) of (0,0)
    gw, gh, gc, out4 = decode_bmp(
        bmp108(0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000))
    assert (gw, gh, gc) == (w, h, 4) and out4 == out

    # nonstandard (RGBA-order / 565-style) masks → explicit error
    for masks in ((0x000000FF, 0x0000FF00, 0x00FF0000),
                  (0xF800, 0x07E0, 0x001F)):
        with _pytest.raises(ValueError, match="nonstandard masks"):
            decode_bmp(bmp40(*masks))
    with _pytest.raises(ValueError, match="nonstandard masks"):
        decode_bmp(bmp108(0x000000FF, 0x0000FF00, 0x00FF0000,
                          0xFF000000))


def test_apng_interlaced_fdat_frames():
    """r11 ADVICE: fdAT sub-frames share the parent IHDR's interlace
    method — an Adam7 APNG's frame 1 must decode through the Adam7
    scanline layout, not a hardcoded interlace=0 header."""
    import struct as _s
    import zlib as _z

    from csvplus_spark.operators.pngcodec import (PNG_MAGIC, _chunk,
                                                  _chunks,
                                                  decode_apng_frame,
                                                  encode_png_ex)

    w, h = 10, 6
    f0 = bytes(((x * 7 + y * 13) % 256) for y in range(h)
               for x in range(w) for _ in range(3))
    f1 = bytes(((x * 3 + y * 5 + 9) % 256) for y in range(h)
               for x in range(w) for _ in range(3))

    def adam7_idat(px):
        # reuse the encoder's interlaced pass layout, grab its IDAT
        z = bytearray()
        blob = encode_png_ex(w, h, list(px), 8, 2, interlace=1)
        for t, data in _chunks(blob):
            if t == b"IDAT":
                z += data
        return bytes(z)

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    out = bytearray(PNG_MAGIC + _chunk(b"IHDR", ihdr))
    out += _chunk(b"acTL", _s.pack(">II", 2, 0))
    out += _chunk(b"fcTL", _s.pack(">IIIIIHHBB", 0, w, h, 0, 0,
                                   1, 10, 0, 0))
    out += _chunk(b"IDAT", adam7_idat(f0))
    out += _chunk(b"fcTL", _s.pack(">IIIIIHHBB", 1, w, h, 0, 0,
                                   1, 10, 0, 0))
    out += _chunk(b"fdAT", _s.pack(">I", 2) + adam7_idat(f1))
    out += _chunk(b"IEND", b"")
    blob = bytes(out)

    assert decode_apng_frame(blob, 0) == (w, h, 3, f0)
    assert decode_apng_frame(blob, 1) == (w, h, 3, f1)


def test_frame_sample_zero_frame_stream(spark):
    """r11 ADVICE: a structurally valid GIF with NO image descriptors
    must surface an error from the real_codec sampling path, not
    silently vanish from the one-to-many fan-out."""
    import pytest as _pytest

    from csvplus_spark.operators.gifcodec import gif_info
    from csvplus_spark.operators.multimodal import sample_frames

    # GIF89a header + logical screen descriptor + trailer: 0 frames
    frameless = b"GIF89a" + bytes((5, 0, 4, 0, 0x00, 0, 0)) + b"\x3b"
    assert gif_info(frameless) == (5, 4, 0)
    df = spark.createDataFrame([(1, bytearray(frameless))],
                               "media_id long, data binary")
    with _pytest.raises(Exception, match="no frames"):
        sample_frames(df, n_frames=2, real_codec=True).collect()


def test_png_interlace_byte_validated():
    """r11 ADVICE: an invalid IHDR interlace byte (e.g. 2) must raise
    on BOTH the decode paths and the fixture encoder, never be
    silently coerced by `& 1` into the wrong scanline layout."""
    import pytest as _pytest

    from csvplus_spark.operators.pngcodec import (decode_apng_frame,
                                                  decode_png,
                                                  encode_apng,
                                                  encode_png,
                                                  encode_png_ex)

    w, h = 6, 4
    f0 = bytes(((x + y) % 256) for y in range(h) for x in range(w)
               for _ in range(3))
    plain = bytearray(encode_png(w, h, 3, f0))
    assert plain[28] == 0
    plain[28] = 2  # CRCs are not verified, so the byte patch lands
    with _pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(plain))

    # the fdAT sub-image rebuild path reads the PARENT interlace byte
    sub = bytes(((x * 3) % 256) for _ in range(2) for x in range(3)
                for _ in range(3))
    apng = bytearray(encode_apng(w, h, 3, [f0, sub],
                                 rects=[(0, 0, w, h), (1, 1, 3, 2)]))
    assert apng[28] == 0
    apng[28] = 2
    with _pytest.raises(ValueError, match="interlace"):
        decode_apng_frame(bytes(apng), 1)

    with _pytest.raises(ValueError, match="interlace"):
        encode_png_ex(2, 2, list(range(4)), 8, 0, interlace=2)


def test_frame_sample_quarantine(spark):
    """r11 ADVICE: on_error='quarantine' routes per-blob decode
    failures to error rows (frame_no=-1, error text) instead of
    aborting the whole mapInPandas stage — one corrupt blob in a
    corpus-scale fan-out must not kill the job. Default 'raise'
    posture unchanged."""
    import pytest as _pytest

    from csvplus_spark.operators.gifcodec import encode_gif
    from csvplus_spark.operators.multimodal import sample_frames

    pal = bytes((10, 20, 30, 200, 100, 50, 0, 0, 0))
    good = encode_gif(5, 4, pal, [0, 1, 2] * 6 + [0, 1],
                      extra_frames=[[1, 2, 0] * 6 + [1, 2]])
    frameless = b"GIF89a" + bytes((5, 0, 4, 0, 0x00, 0, 0)) + b"\x3b"
    unknown = b"\x00not-a-media-container"
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(frameless)),
         (3, bytearray(unknown))],
        "media_id long, data binary")

    rows = sample_frames(df, n_frames=3, real_codec=True,
                         on_error="quarantine").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # good blob: both frames decoded, error NULL
    assert len(by_id[1]) == 2
    assert all(r["error"] is None and r["frame_no"] >= 0
               for r in by_id[1])
    # quarantined blobs: exactly one row each, frame_no=-1, message set
    assert [r["frame_no"] for r in by_id[2]] == [-1]
    assert "no frames" in by_id[2][0]["error"]
    assert by_id[2][0]["frame_md5"] is None
    assert [r["frame_no"] for r in by_id[3]] == [-1]
    assert "no video codec" in by_id[3][0]["error"]

    # the default posture still aborts the stage (whichever bad blob
    # a partition hits first raises)
    with _pytest.raises(Exception, match="no frames|no video codec"):
        sample_frames(df, n_frames=3, real_codec=True).collect()
    # and a bad mode is rejected eagerly
    from csvplus_spark.operators.multimodal import frame_sample_stub
    with _pytest.raises(ValueError, match="on_error"):
        frame_sample_stub(3, True, on_error="ignore")


# ---------------------------------------------------------------------------
# r13: quarantine channel on every decode fan-out + broad exception catch
# (r12 verdict item 1 + r12 ADVICE), and the fake-PIL dispatch contract
# (r12 verdict item 2).
# ---------------------------------------------------------------------------

def _corrupt_idat(png: bytes) -> bytes:
    """Flip every IDAT payload byte: still structurally a PNG (header
    walks succeed) but the deflate stream is garbage -> zlib.error."""
    import struct

    ba = bytearray(png)
    pos = 8
    while pos < len(ba):
        ln = struct.unpack_from(">I", ba, pos)[0]
        if bytes(ba[pos + 4:pos + 8]) == b"IDAT":
            for i in range(pos + 8, pos + 8 + ln):
                ba[i] ^= 0xFF
            break
        pos += 12 + ln
    return bytes(ba)


def _png_fixture():
    from csvplus_spark.operators.pngcodec import encode_png

    return encode_png(4, 3, 3, bytes(range(36)))


def test_frame_sample_quarantine_broad_exceptions(spark):
    """r12 ADVICE: corrupt blobs raise more than ValueError/
    NotImplementedError — a truncated PNG header raises struct.error,
    a corrupt IDAT raises zlib.error on inflate. Quarantine must route
    BOTH to error rows instead of aborting the mapInPandas stage."""
    from csvplus_spark.operators.multimodal import sample_frames

    good = _png_fixture()
    trunc = good[:18]             # PNG magic, header cut -> struct.error
    corrupt = _corrupt_idat(good)  # header walks fine -> zlib.error
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(trunc)),
         (3, bytearray(corrupt))],
        "media_id long, data binary")
    rows = sample_frames(df, n_frames=1, real_codec=True,
                         on_error="quarantine").collect()
    by_id = {r["media_id"]: r for r in rows}
    assert len(rows) == 3
    assert by_id[1]["error"] is None and by_id[1]["frame_no"] == 0
    assert by_id[2]["frame_no"] == -1
    assert "unpack requires" in by_id[2]["error"]
    assert by_id[3]["frame_no"] == -1
    assert "decompressing" in by_id[3]["error"]
    # default posture: the stage still aborts on the first bad blob
    with pytest.raises(Exception):
        sample_frames(df, n_frames=1, real_codec=True).collect()


def test_decode_images_quarantine(spark):
    """r12 verdict item 1: decode_images gains the same per-blob error
    channel sample_frames got in r12 — geometry columns NULL, error
    set, good rows untouched (error NULL)."""
    from csvplus_spark.operators.multimodal import decode_image_stub, decode_images

    good = _png_fixture()
    trunc = good[:18]
    unknown = b"\x00not-an-image"
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(trunc)),
         (3, bytearray(unknown))],
        "media_id long, data binary")
    rows = {r["media_id"]: r
            for r in decode_images(df, real_codec=True,
                                   on_error="quarantine").collect()}
    assert (rows[1]["width"], rows[1]["height"],
            rows[1]["n_pixels"], rows[1]["orientation"],
            rows[1]["error"]) == (4, 3, 12, 1, None)
    assert rows[2]["width"] is None and "unpack requires" in rows[2]["error"]
    assert rows[3]["width"] is None and "pure-Python codecs" in rows[3]["error"]
    # default posture unchanged: raise aborts the stage
    with pytest.raises(Exception):
        decode_images(df, real_codec=True).collect()
    with pytest.raises(ValueError, match="on_error"):
        decode_image_stub(True, on_error="ignore")


def test_resize_images_quarantine(spark):
    """Corrupt-IDAT (zlib.error) and undecodable blobs quarantine;
    the good blob still resizes to a real PNG."""
    from csvplus_spark.operators.pngcodec import is_png, png_info
    from csvplus_spark.operators.multimodal import resize_images

    good = _png_fixture()
    corrupt = _corrupt_idat(good)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt)),
         (3, bytearray(b"\x00junk"))],
        "media_id long, data binary")
    rows = {r["media_id"]: r
            for r in resize_images(df, width=8, height=6, real_codec=True,
                                   on_error="quarantine").collect()}
    assert rows[1]["error"] is None and is_png(bytes(rows[1]["data"]))
    assert png_info(bytes(rows[1]["data"]))[:2] == (8, 6)
    assert (rows[1]["width"], rows[1]["height"]) == (8, 6)
    assert rows[2]["data"] is None and "decompressing" in rows[2]["error"]
    assert rows[3]["data"] is None and rows[3]["width"] is None
    with pytest.raises(Exception):
        resize_images(df, width=8, height=6, real_codec=True).collect()


def test_decode_audio_quarantine(spark):
    """Truncated WAV and non-audio blobs quarantine; the good WAV's
    stats are identical to the raise-mode row."""
    from csvplus_spark.operators.wavcodec import encode_wav
    from csvplus_spark.operators.multimodal import decode_audio

    wav = encode_wav(8000, 1, 16, [0, 100, -100, 3000])
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(wav[:20])),
         (3, bytearray(b"\x00noise"))],
        "media_id long, data binary")
    rows = {r["media_id"]: r
            for r in decode_audio(df, real_codec=True,
                                  on_error="quarantine").collect()}
    ok = decode_audio(
        spark.createDataFrame([(1, bytearray(wav))],
                              "media_id long, data binary"),
        real_codec=True).collect()[0]
    assert rows[1]["error"] is None
    assert (rows[1]["sample_rate"], rows[1]["n_frames"], rows[1]["peak"],
            rows[1]["rms"]) == (ok["sample_rate"], ok["n_frames"],
                                ok["peak"], ok["rms"])
    assert rows[2]["sample_rate"] is None and "fmt/data" in rows[2]["error"]
    assert rows[3]["sample_rate"] is None and "mp3/ogg" in rows[3]["error"]
    with pytest.raises(Exception):
        decode_audio(df, real_codec=True).collect()


def test_extract_features_quarantine(spark):
    """real_model=True raises PER BLOB, so quarantine yields one
    feat_idx=-1 error row per blob; the stub path under quarantine
    matches the plain path value-for-value with error all NULL."""
    from csvplus_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(1, bytearray(b"aa")), (2, bytearray(b"bb"))],
        "media_id long, data binary")
    qrows = extract_features(df, dim=4, real_model=True,
                             on_error="quarantine").collect()
    assert sorted(r["media_id"] for r in qrows) == [1, 2]
    assert all(r["feat_idx"] == -1 and r["feature"] is None
               and "embedding model" in r["error"] for r in qrows)
    plain = {(r["media_id"], r["feat_idx"]): r["feature"]
             for r in extract_features(df, dim=4).collect()}
    quar = {(r["media_id"], r["feat_idx"]): (r["feature"], r["error"])
            for r in extract_features(df, dim=4,
                                      on_error="quarantine").collect()}
    assert len(plain) == len(quar) == 8
    for k, v in plain.items():
        assert quar[k] == (v, None)
    with pytest.raises(Exception, match="embedding model"):
        extract_features(df, dim=4, real_model=True).collect()


# --- fake-PIL dispatch contract (r12 verdict item 2) ----------------------
# The production hot path is Pillow-first (COVERAGE.md); PIL is absent in
# this container, so these tests monkeypatch a fake PIL into sys.modules
# and call the stub generators DIRECTLY (in-process — mapInPandas workers
# would not see a driver-side monkeypatch), which executes the exact
# dispatch branch a Pillow-equipped executor runs.

def _fake_pil(open_fn):
    """(PIL, PIL.Image, PIL.ImageOps) module objects with Image.open =
    open_fn and ImageOps.exif_transpose = identity."""
    import types

    class FakeIm:
        format = "PNG"

        def __init__(self, w, h, trace):
            self.width, self.height, self._trace = w, h, trace

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            return self

        def resize(self, wh):
            return FakeIm(wh[0], wh[1], self._trace)

        def save(self, buf, format=None):
            buf.write(b"FAKEPIL" + bytes([self.width, self.height]))

    pil = types.ModuleType("PIL")
    image = types.ModuleType("PIL.Image")
    imageops = types.ModuleType("PIL.ImageOps")
    image.open = open_fn
    imageops.exif_transpose = lambda im: im
    pil.Image, pil.ImageOps = image, imageops
    pil._FakeIm = FakeIm
    return pil, image, imageops


def _install_fake_pil(monkeypatch, open_fn):
    import sys as _sys

    pil, image, imageops = _fake_pil(open_fn)
    monkeypatch.setitem(_sys.modules, "PIL", pil)
    monkeypatch.setitem(_sys.modules, "PIL.Image", image)
    monkeypatch.setitem(_sys.modules, "PIL.ImageOps", imageops)
    return pil


def _one_batch(blobs):
    import pandas as pd

    return [pd.DataFrame({"media_id": list(range(1, len(blobs) + 1)),
                          "data": blobs})]


def test_decode_dispatch_prefers_pil(monkeypatch):
    """(a) the dispatcher selects Pillow when importable: the fake
    reports 123x45 for a PNG whose real header says 4x3 — the output
    carrying 123x45 proves the PIL branch ran, with the schema
    identical to the codec-only run."""
    from csvplus_spark.operators.multimodal import decode_image_stub

    calls = []
    pil = _install_fake_pil(
        monkeypatch,
        lambda fp: (calls.append(1) or pil._FakeIm(123, 45, calls)))
    out = list(decode_image_stub(real_codec=True)(_one_batch([_png_fixture()])))
    assert len(out) == 1 and calls  # Image.open was invoked
    row = out[0].iloc[0]
    assert (row["width"], row["height"], row["n_pixels"]) == (123, 45, 123 * 45)
    assert list(out[0].columns) == ["media_id", "width", "height",
                                    "n_pixels", "orientation"]


def test_decode_dispatch_falls_back_per_blob(monkeypatch):
    """(b) a blob PIL rejects falls back PER BLOB to the built-in
    codecs — (c) with output schema and values identical to the
    no-PIL run (the r8 invariant: installing Pillow must never fail a
    query that succeeds without it)."""
    from csvplus_spark.operators.multimodal import decode_image_stub

    def flaky_open(fp):
        raise OSError("cannot identify image file")

    _install_fake_pil(monkeypatch, flaky_open)
    png = _png_fixture()
    with_pil = list(decode_image_stub(real_codec=True)(_one_batch([png])))[0]
    monkeypatch.undo()  # PIL gone again -> pure-codec branch
    without = list(decode_image_stub(real_codec=True)(_one_batch([png])))[0]
    assert list(with_pil.columns) == list(without.columns)
    assert with_pil.iloc[0].tolist() == without.iloc[0].tolist()
    assert (with_pil.iloc[0]["width"], with_pil.iloc[0]["height"]) == (4, 3)


def test_resize_dispatch_prefers_pil_and_falls_back(monkeypatch):
    """Same dispatch contract for the binary-out resize path: the fake
    PIL's marker bytes prove selection; a PIL failure falls back to the
    pure-Python re-encode; schemas identical."""
    from csvplus_spark.operators.multimodal import resize_stub
    from csvplus_spark.operators.pngcodec import is_png, png_info

    png = _png_fixture()
    pil = _install_fake_pil(monkeypatch, lambda fp: pil._FakeIm(4, 3, None))
    picked = list(resize_stub(8, 6, real_codec=True)(_one_batch([png])))[0]
    assert bytes(picked.iloc[0]["data"]).startswith(b"FAKEPIL")

    _install_fake_pil(monkeypatch, lambda fp: (_ for _ in ()).throw(
        OSError("cannot identify image file")))
    fell_back = list(resize_stub(8, 6, real_codec=True)(_one_batch([png])))[0]
    blob = bytes(fell_back.iloc[0]["data"])
    assert is_png(blob) and png_info(blob)[:2] == (8, 6)
    assert list(picked.columns) == list(fell_back.columns)
