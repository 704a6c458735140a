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
            return width, height, ncomp, marker == 0xC2
        if marker == 0xDA:
            # start of scan — entropy-coded data follows; a stream with
            # SOS before SOF is malformed
            raise ValueError("SOS before SOF (no frame header)")
        i += seg_len
    raise ValueError("no SOF frame header found")


def encode_minimal_jpeg(width: int, height: int, n_components: int = 3,
                        progressive: bool = False) -> bytes:
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
    comps = b"".join(bytes([c + 1, 0x11, 0]) for c in range(n_components))
    sof = struct.pack(">BHHB", 8, height, width, n_components) + comps
    out.append((b"\xff\xc2" if progressive else b"\xff\xc0")
               + struct.pack(">H", len(sof) + 2) + sof)
    out.append(b"\xff\xd9")
    return b"".join(out)
