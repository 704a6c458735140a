"""Pure-Python BMP codec (r10) — the uncompressed Windows bitmap
format: BITMAPINFOHEADER (and the V4/V5 supersets), bottom-up and
top-down rows, 24-bit BGR, 32-bit BGRA, and 8-bit palettized, with
the 4-byte row padding. RLE stays an honest ValueError. Fixture-grade
``encode_bmp`` writes 24-bit streams.
"""

from __future__ import annotations

import struct


def is_bmp(blob: bytes) -> bool:
    return bytes(blob[:2]) == b"BM"


def bmp_info(blob: bytes) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel) — header only."""
    blob = bytes(blob)
    if not is_bmp(blob) or len(blob) < 30:
        raise ValueError("bmp: bad magic or truncated header")
    hsz = struct.unpack("<I", blob[14:18])[0]
    if hsz < 40:
        raise ValueError("bmp: BITMAPCOREHEADER unsupported")
    w, h_raw = struct.unpack("<ii", blob[18:26])
    bpp = struct.unpack("<H", blob[28:30])[0]
    return w, abs(h_raw), bpp


def decode_bmp(blob: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — 8-bit interleaved RGB (or
    RGBA for 32-bit sources), rows normalized top-down."""
    blob = bytes(blob)
    if not is_bmp(blob) or len(blob) < 34:
        raise ValueError("bmp: bad magic or truncated header")
    data_off = struct.unpack("<I", blob[10:14])[0]
    hsz = struct.unpack("<I", blob[14:18])[0]
    if hsz < 40:
        raise ValueError("bmp: BITMAPCOREHEADER unsupported")
    w, h_raw = struct.unpack("<ii", blob[18:26])
    planes, bpp = struct.unpack("<HH", blob[26:30])
    comp = struct.unpack("<I", blob[30:34])[0]
    if comp == 3 and bpp == 32:
        # BI_BITFIELDS is only BGRA-equivalent when the masks SAY so:
        # read the actual mask dwords (at 14+40 for BITMAPINFOHEADER
        # extra masks and identically-placed bV4/bV5 header fields) and
        # downgrade to comp=0 only for the standard
        # 0x00FF0000/0x0000FF00/0x000000FF layout (alpha 0xFF000000, or
        # 0/absent for XRGB). Nonstandard masks (RGBA, RGB565-style)
        # would silently decode with swapped channels otherwise.
        if len(blob) < 66:
            raise ValueError("bmp: BI_BITFIELDS header truncated")
        rm, gm, bm = struct.unpack("<III", blob[54:66])
        am = struct.unpack("<I", blob[66:70])[0] if len(blob) >= 70 \
            and hsz >= 56 else 0
        if (rm, gm, bm) == (0x00FF0000, 0x0000FF00, 0x000000FF) \
                and am in (0xFF000000, 0):
            comp = 0
        else:
            raise ValueError(
                "bmp: BI_BITFIELDS with nonstandard masks "
                f"(r={rm:#010x} g={gm:#010x} b={bm:#010x} a={am:#010x})"
                " unsupported")
    if comp != 0:
        raise ValueError(f"bmp: compression {comp} unsupported (RLE/"
                         "bitfields need a real imaging lib)")
    if bpp not in (8, 24, 32):
        raise ValueError("bmp: only 8/24/32-bit supported")
    top_down = h_raw < 0
    h = abs(h_raw)
    pal = None
    if bpp == 8:
        ncol = struct.unpack("<I", blob[46:50])[0] or 256
        pstart = 14 + hsz
        pal = blob[pstart:pstart + 4 * ncol]
        if len(pal) < 4 * ncol:
            raise ValueError("bmp: truncated palette")
    row_bytes = (w * bpp // 8 + 3) & ~3
    ch = 4 if bpp == 32 else 3
    out = bytearray(w * h * ch)
    for y in range(h):
        sy = y if top_down else h - 1 - y
        base = data_off + sy * row_bytes
        row = blob[base:base + row_bytes]
        if len(row) < w * bpp // 8:
            raise ValueError("bmp: truncated pixel data")
        o = y * w * ch
        if bpp == 8:
            for x in range(w):
                b, g, r = pal[4 * row[x]:4 * row[x] + 3]
                out[o + 3 * x:o + 3 * x + 3] = bytes((r, g, b))
        elif bpp == 24:
            for x in range(w):
                b, g, r = row[3 * x:3 * x + 3]
                out[o + 3 * x:o + 3 * x + 3] = bytes((r, g, b))
        else:
            for x in range(w):
                b, g, r, a = row[4 * x:4 * x + 4]
                out[o + 4 * x:o + 4 * x + 4] = bytes((r, g, b, a))
    return w, h, ch, bytes(out)


def encode_bmp(width: int, height: int, pixels: bytes,
               top_down: bool = False) -> bytes:
    """24-bit BITMAPINFOHEADER writer (RGB input, BGR on disk,
    4-byte-padded rows; bottom-up by default like real encoders)."""
    if len(pixels) != width * height * 3:
        raise ValueError("bmp: pixel buffer size mismatch")
    row_bytes = (width * 3 + 3) & ~3
    body = bytearray()
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[(y * width + x) * 3:(y * width + x) * 3 + 3]
            row += bytes((b, g, r))
        row += bytes(row_bytes - len(row))
        body += row
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width,
                       -height if top_down else height, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    return hdr + info + bytes(body)
