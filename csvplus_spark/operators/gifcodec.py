"""Pure-Python GIF codec — no native imaging lib (r10: the web-corpus
format the multimodal surface was still missing).

Implements GIF87a/GIF89a decode per the published specification:
logical screen descriptor, global/local color tables, variable-width
LSB-first LZW with dictionary reset, interlaced row ordering, the
graphic-control extension (transparency index → alpha channel), and
multi-frame streams (``gif_info`` counts frames without decompressing;
``decode_gif`` renders frame N composited onto the logical screen).
A fixture-grade ``encode_gif`` writes real GIF89a streams (proper
variable-width LZW, optional interlace / transparency / extra frames)
so tests and oracle queries can exercise every path without Pillow.

Like the PNG/JPEG codecs this runs per Arrow batch inside mapInPandas;
pure-Python LZW is O(pixels) with small constants.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")

#: interlace pass (start row, step) per the GIF spec
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(blob: bytes) -> bool:
    return bytes(blob[:6]) in GIF_MAGICS


def _skip_subblocks(blob: bytes, pos: int) -> int:
    """Skip a sub-block chain; returns position after the terminator."""
    n = len(blob)
    while pos < n:
        size = blob[pos]
        pos += 1 + size
        if size == 0:
            return pos
    raise ValueError("gif: truncated sub-block chain")


def _walk(blob: bytes):
    """Yield (kind, payload) per stream element after the screen
    descriptor + GCT: ('gce', (transparent_idx|None,)), ('image',
    (left, top, w, h, interlaced, lct|None, lzw_pos)), 'trailer'."""
    blob = bytes(blob)
    if not is_gif(blob):
        raise ValueError("gif: bad magic")
    if len(blob) < 13:
        raise ValueError("gif: truncated header")
    packed = blob[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))  # global color table
    transparent = None
    n = len(blob)
    while pos < n:
        b = blob[pos]
        if b == 0x3B:  # trailer
            yield "trailer", None
            return
        if b == 0x21:  # extension
            if pos + 2 > n:
                raise ValueError("gif: truncated extension")
            label = blob[pos + 1]
            if label == 0xF9 and pos + 8 <= n and blob[pos + 2] == 4:
                flags = blob[pos + 3]
                transparent = blob[pos + 6] if flags & 1 else None
            pos = _skip_subblocks(blob, pos + 2)
            continue
        if b == 0x2C:  # image descriptor
            if pos + 10 > n:
                raise ValueError("gif: truncated image descriptor")
            left, top, w, h = struct.unpack("<HHHH", blob[pos + 1:pos + 9])
            ipacked = blob[pos + 9]
            pos += 10
            lct = None
            if ipacked & 0x80:
                sz = 3 * (2 << (ipacked & 0x07))
                lct = blob[pos:pos + sz]
                pos += sz
            yield "image", (left, top, w, h, bool(ipacked & 0x40), lct,
                            pos, transparent)
            transparent = None
            pos = _skip_subblocks(blob, pos + 1)  # skip LZW min + data
            continue
        raise ValueError(f"gif: unknown block {b:#x} at {pos}")
    raise ValueError("gif: missing trailer")


def gif_info(blob: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) — header walk only, no LZW decode."""
    blob = bytes(blob)
    if not is_gif(blob) or len(blob) < 13:
        raise ValueError("gif: bad magic or truncated header")
    w, h = struct.unpack("<HH", blob[6:10])
    frames = 0
    for kind, _ in _walk(blob):
        if kind == "image":
            frames += 1
    return w, h, frames


def _lzw_decode(blob: bytes, pos: int, expected: int) -> list[int]:
    """Variable-width LSB-first GIF LZW: ``pos`` points at the minimum
    code size byte; decodes exactly ``expected`` indices."""
    min_code = blob[pos]
    if not 2 <= min_code <= 11:
        raise ValueError("gif: bad LZW minimum code size")
    pos += 1
    data = bytearray()
    n = len(blob)
    while pos < n:
        size = blob[pos]
        pos += 1
        if size == 0:
            break
        data += blob[pos:pos + size]
        pos += size
    clear = 1 << min_code
    end = clear + 1

    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code + 1

    width = min_code + 1
    reset()
    acc = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                if len(out) != expected:
                    raise ValueError("gif: pixel count mismatch")
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("gif: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError("gif: LZW code out of range")
            out.extend(entry)
            if len(out) > expected:
                raise ValueError("gif: pixel overrun")
            if prev is not None and len(table) < 4096:
                table.append(prev + [entry[0]])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    raise ValueError("gif: missing LZW end code")


def decode_gif(blob: bytes, frame: int = 0) -> tuple[int, int, int, bytes]:
    """Decode frame ``frame`` composited onto the logical screen →
    (width, height, channels, pixels). Channels is 4 (RGBA) when the
    frame has a transparency index or doesn't cover the screen, else
    3. No inter-frame disposal compositing: each frame renders alone
    (the frame-sampling contract — samples are independent)."""
    blob = bytes(blob)
    if not is_gif(blob) or len(blob) < 13:
        raise ValueError("gif: bad magic or truncated header")
    w, h = struct.unpack("<HH", blob[6:10])
    packed = blob[10]
    gct = blob[13:13 + 3 * (2 << (packed & 0x07))] if packed & 0x80 else None
    idx = 0
    for kind, payload in _walk(blob):
        if kind != "image":
            continue
        if idx != frame:
            idx += 1
            continue
        left, top, fw, fh, interlaced, lct, lzw_pos, transparent = payload
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("gif: no color table for frame")
        ncol = len(pal) // 3
        indices = _lzw_decode(blob, lzw_pos, fw * fh)
        if interlaced:
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, fh, step))
            de = [0] * (fw * fh)
            for src_row, dst_row in enumerate(rows):
                de[dst_row * fw:(dst_row + 1) * fw] = \
                    indices[src_row * fw:(src_row + 1) * fw]
            indices = de
        full_cover = left == 0 and top == 0 and fw == w and fh == h
        ch = 3 if transparent is None and full_cover else 4
        out = bytearray(w * h * ch)  # off-frame screen = transparent
        for y in range(fh):
            sy = top + y
            if sy >= h:
                continue
            for x in range(fw):
                sx = left + x
                if sx >= w:
                    continue
                ci = indices[y * fw + x]
                if ci >= ncol:
                    raise ValueError("gif: palette index out of range")
                o = (sy * w + sx) * ch
                out[o:o + 3] = pal[3 * ci:3 * ci + 3]
                if ch == 4:
                    out[o + 3] = 0 if ci == transparent else 255
        return w, h, ch, bytes(out)
    raise ValueError(f"gif: frame {frame} not in stream")


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    """Variable-width LSB-first GIF LZW encoder (dictionary to 4096,
    emits CLEAR at start and on overflow, END at the end)."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    emit(clear, width)
    run: tuple = ()
    for ci in indices:
        cand = run + (ci,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4096 - 1:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        run = (ci,)
    if run:
        emit(table[run], width)
        # the decoder appends one more table entry for this final code
        # BEFORE reading END, and widens at len(table) == 2^width —
        # mirror it, or END is written at the stale width (review fuzz
        # finding: 'missing LZW end code' on boundary-landing streams)
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width: int, height: int, palette: bytes,
               indices: list[int], interlace: bool = False,
               transparent: int | None = None,
               extra_frames: list[list[int]] | None = None) -> bytes:
    """Fixture-grade GIF89a encoder: one global color table (padded to
    a power of two), frame(s) of palette indices at full screen size,
    optional interlace / transparency / extra frames — real streams
    for everything ``decode_gif`` claims to handle."""
    if len(palette) % 3 or not 3 <= len(palette) <= 768:
        raise ValueError("gif: palette must be 1-256 RGB triples")
    ncol = len(palette) // 3
    bits = max(2, (ncol - 1).bit_length())
    pal = palette + bytes(3 * ((1 << bits) - ncol))
    frames = [indices] + list(extra_frames or [])
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("gif: index buffer size mismatch")
        if any(not 0 <= i < ncol for i in fr):
            raise ValueError("gif: palette index out of range")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += pal
    for fi, fr in enumerate(frames):
        if transparent is not None and fi == 0:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x40 if (interlace and fi == 0) else 0x00])
        fr2 = fr
        if interlace and fi == 0:
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, height, step))
            fr2 = []
            for r in rows:
                fr2.extend(fr[r * width:(r + 1) * width])
        min_code = max(2, bits)
        out += bytes([min_code])
        lzw = _lzw_encode(list(fr2), min_code)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
