"""Pure-Python JPEG segment-marker walker (dimensions + metadata).

The pngcodec / mp4-box-walker pattern applied to the most common real
image format (r7 verdict item 5): JPEG is a sequence of marker
segments (ITU-T T.81 §B) — ``FF xx`` markers, most followed by a
2-byte big-endian length that includes itself. The frame header
(SOF0–SOF15, minus the non-frame DHT/JPG/DAC codes) carries sample
precision, height, width, and component count, and appears BEFORE any
entropy-coded scan data, so a straight segment walk recovers the
geometry without any DCT work. Full pixel decode (huffman + IDCT)
stays honestly env-gated behind Pillow — this module makes
``multimodal_meta`` / dimension extraction work on real JPEG bytes in
codec-less containers.

Reference parity note: csvplus (csvplus.go) has no multimodal surface;
this is north-star extension code for binary-column pipelines.
"""

from __future__ import annotations

import struct

#: SOFn marker codes that ARE frame headers (T.81 table B.1):
#: C0–C3, C5–C7, C9–CB, CD–CF — excluding C4 (DHT), C8 (JPG), CC (DAC)
_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC))

#: progressive-DCT frame markers (T.81 table B.1): SOF2 (huffman),
#: SOF6 (differential huffman), SOF10 (arithmetic), SOF14
#: (differential arithmetic) — the ADVICE r8 fix: deriving the flag
#: from ==0xC2 alone mislabeled the three rarer progressive encodings
_PROGRESSIVE_SOF = frozenset({0xC2, 0xC6, 0xCA, 0xCE})

#: standalone markers with NO length field (T.81 §B.1.1.3)
_STANDALONE = frozenset({0x01, *range(0xD0, 0xD8)})  # TEM, RST0–RST7


def is_jpeg(blob: bytes) -> bool:
    return len(blob) >= 3 and blob[:2] == b"\xff\xd8" and blob[2] == 0xFF


def jpeg_info(blob: bytes) -> tuple[int, int, int, bool]:
    """(width, height, n_components, progressive) from the first frame
    header. Raises ValueError on a non-JPEG or truncated/malformed
    stream — never a silent wrong answer."""
    if not is_jpeg(blob):
        raise ValueError("not a JPEG stream (missing SOI)")
    i = 2
    n = len(blob)
    while i < n:
        # fill bytes: any number of FFs may pad before a marker code
        if blob[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i < n and blob[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = blob[i]
        i += 1
        if marker == 0xD9:  # EOI
            break
        if marker in _STANDALONE:
            continue
        if i + 2 > n:
            raise ValueError("truncated segment length")
        seg_len = struct.unpack(">H", blob[i:i + 2])[0]
        if seg_len < 2 or i + seg_len > n:
            raise ValueError("bad segment length")
        if marker in _SOF_MARKERS:
            if seg_len < 8:
                raise ValueError("SOF segment too short")
            _prec, height, width, ncomp = struct.unpack(
                ">BHHB", blob[i + 2:i + 8])
            return width, height, ncomp, marker in _PROGRESSIVE_SOF
        if marker == 0xDA:
            # start of scan — entropy-coded data follows; a stream with
            # SOS before SOF is malformed
            raise ValueError("SOS before SOF (no frame header)")
        i += seg_len
    raise ValueError("no SOF frame header found")


def jpeg_orientation(blob: bytes) -> int:
    """EXIF orientation (1–8) from the APP1 segment's TIFF IFD0, or 1
    (the "upright" default) when the stream carries no EXIF block or
    no orientation tag — real image pipelines mis-crop without this
    (the camera stores sensor-native pixels + this tag instead of
    rotating). Walks segments the same way as :func:`jpeg_info`;
    malformed EXIF inside an otherwise valid JPEG degrades to 1 rather
    than failing the decode (orientation is advisory metadata; the
    frame geometry contract stays strict in jpeg_info).

    EXIF layout (CIPA DC-008 / TIFF 6.0): APP1 payload is
    ``Exif\\0\\0`` + a TIFF file — byte-order mark ``II``/``MM``,
    magic 42, IFD0 offset; IFD0 is a 2-byte entry count then 12-byte
    entries ``tag(2) type(2) count(4) value(4)``; orientation is tag
    0x0112, a count-1 SHORT whose value sits inline in the value
    field's first two bytes (endian-sensitive).
    """
    if not is_jpeg(blob):
        raise ValueError("not a JPEG stream (missing SOI)")
    i, n = 2, len(blob)
    while i < n:
        if blob[i] != 0xFF:
            break
        while i < n and blob[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = blob[i]
        i += 1
        if marker == 0xD9 or marker == 0xDA:  # EOI / scan data: EXIF
            break                             # must precede both
        if marker in _STANDALONE:
            continue
        if i + 2 > n:
            break
        seg_len = struct.unpack(">H", blob[i:i + 2])[0]
        if seg_len < 2 or i + seg_len > n:
            break
        if marker == 0xE1 and blob[i + 2:i + 8] == b"Exif\x00\x00":
            tiff = blob[i + 8:i + seg_len]
            o = _tiff_orientation(tiff)
            if o is not None:
                return o
        i += seg_len
    return 1


def _tiff_orientation(tiff: bytes) -> int | None:
    if len(tiff) < 8:
        return None
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        return None
    magic, ifd0 = struct.unpack(endian + "HI", tiff[2:8])
    if magic != 42 or ifd0 + 2 > len(tiff):
        return None
    n_entries = struct.unpack(endian + "H", tiff[ifd0:ifd0 + 2])[0]
    pos = ifd0 + 2
    for _ in range(n_entries):
        if pos + 12 > len(tiff):
            return None
        tag, typ, cnt = struct.unpack(endian + "HHI", tiff[pos:pos + 8])
        if tag == 0x0112 and typ == 3 and cnt == 1:  # SHORT orientation
            val = struct.unpack(endian + "H", tiff[pos + 8:pos + 10])[0]
            return val if 1 <= val <= 8 else None
        pos += 12
    return None


def _exif_app1(orientation: int) -> bytes:
    """Minimal APP1 EXIF segment (little-endian TIFF, one-IFD0-entry)
    carrying just the orientation tag — fixture twin of
    :func:`jpeg_orientation`."""
    if not 1 <= orientation <= 8:
        raise ValueError("EXIF orientation must be 1-8")
    ifd = (struct.pack("<H", 1)
           + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
           + struct.pack("<I", 0))  # no next IFD
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def encode_minimal_jpeg(width: int, height: int, n_components: int = 3,
                        progressive: bool = False,
                        orientation: int | None = None) -> bytes:
    """A structurally valid JPEG header stream (SOI + JFIF APP0 + SOF +
    EOI) for the given geometry — deterministic fixture bytes for
    plumbing tests and oracle-replayable queries, the
    encode_minimal_mp4 pattern. Not a displayable image (no scan
    data); jpeg_info() round-trips it exactly."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("width/height out of JPEG range")
    if not (1 <= n_components <= 4):
        raise ValueError("1-4 components")
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out = [b"\xff\xd8",
           b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0]
    if orientation is not None:
        out.append(_exif_app1(orientation))
    comps = b"".join(bytes([c + 1, 0x11, 0]) for c in range(n_components))
    sof = struct.pack(">BHHB", 8, height, width, n_components) + comps
    out.append((b"\xff\xc2" if progressive else b"\xff\xc0")
               + struct.pack(">H", len(sof) + 2) + sof)
    out.append(b"\xff\xd9")
    return b"".join(out)
