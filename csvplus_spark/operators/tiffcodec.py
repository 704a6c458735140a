"""Pure-Python baseline TIFF codec — no native imaging lib (r10: the
document-scan format; multi-page TIFFs are what OCR corpora carry).

Implements the published TIFF 6.0 baseline decode surface: both byte
orders (II/MM), the IFD chain (``tiff_info`` counts pages without
decompressing; ``decode_tiff`` renders page N), strips, grayscale /
RGB / RGBA at 8 bits per sample (1-bit bilevel expands to 0/255),
compressions 1 (none), 5 (TIFF-LZW — MSB-first, EarlyChange code
widths, the variant that is NOT GIF's), 32773 (PackBits), and the
horizontal-differencing predictor (tag 317). A fixture-grade
``encode_tiff`` writes real single- and multi-page streams with every
supported compression so tests and oracle queries exercise each path.

Like the other codecs this runs per Arrow batch inside mapInPandas.
"""

from __future__ import annotations

import struct


def is_tiff(blob: bytes) -> bool:
    return bytes(blob[:4]) in (b"II*\x00", b"MM\x00*")


def _ifds(blob: bytes):
    """Yield dict(tag -> (type, values)) per IFD in chain order."""
    blob = bytes(blob)
    if not is_tiff(blob):
        raise ValueError("tiff: bad magic")
    e = "<" if blob[:2] == b"II" else ">"
    (off,) = struct.unpack(e + "I", blob[4:8])
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    fmt = {1: "B", 3: "H", 4: "I"}
    seen = set()
    while off:
        if off in seen:
            raise ValueError("tiff: IFD cycle")
        seen.add(off)
        if off + 2 > len(blob):
            raise ValueError("tiff: truncated IFD")
        (n,) = struct.unpack(e + "H", blob[off:off + 2])
        tags = {}
        p = off + 2
        for _ in range(n):
            if p + 12 > len(blob):
                raise ValueError("tiff: truncated IFD entry")
            tag, typ, cnt = struct.unpack(e + "HHI", blob[p:p + 8])
            size = sizes.get(typ, 1) * cnt
            if size <= 4:
                data = blob[p + 8:p + 8 + size]
            else:
                (doff,) = struct.unpack(e + "I", blob[p + 8:p + 12])
                data = blob[doff:doff + size]
            if typ in fmt:
                if len(data) < size:
                    # never substitute zeros: a truncated offsets/
                    # counts block would silently decode garbage
                    # (review finding)
                    raise ValueError(
                        f"tiff: tag {tag} value block truncated")
                vals = list(struct.unpack(
                    e + fmt[typ] * cnt, data[:size]))
            else:
                vals = [0] * cnt  # unknown value type: tag is unusable
            tags[tag] = (typ, vals)
            p += 12
        (off,) = struct.unpack(e + "I", blob[p:p + 4])
        yield tags


def tiff_info(blob: bytes) -> tuple[int, int, int]:
    """(width, height, n_pages) — first page's geometry, full chain
    count; header walk only."""
    w = h = 0
    pages = 0
    for tags in _ifds(blob):
        if pages == 0:
            w = tags.get(256, (0, [0]))[1][0]
            h = tags.get(257, (0, [0]))[1][0]
        pages += 1
    if pages == 0:
        raise ValueError("tiff: no IFD")
    return w, h, pages


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("tiff: truncated PackBits data")
        c = data[i]
        i += 1
        if c < 128:
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("tiff: truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # 128 = no-op
    return bytes(out[:expected])


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-LZW: MSB-first bit order, clear=256/eoi=257, 9-bit start,
    EarlyChange width bump (one code early) — NOT the GIF variant."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                if len(out) != expected:
                    raise ValueError("tiff: LZW byte count mismatch")
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("tiff: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("tiff: LZW code out of range")
            out += entry
            if len(out) > expected:
                raise ValueError("tiff: LZW overrun")
            if prev is not None:
                table.append(prev + entry[:1])
            # EarlyChange: widen when the NEXT code would overflow
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            prev = entry
    raise ValueError("tiff: missing LZW EOI code")


def decode_tiff(blob: bytes, page: int = 0) -> tuple[int, int, int, bytes]:
    """Decode page ``page`` → (width, height, channels, pixels) 8-bit
    interleaved (1-bit bilevel expands to 0/255 grayscale)."""
    blob = bytes(blob)
    idx = 0
    for tags in _ifds(blob):
        if idx != page:
            idx += 1
            continue

        def tag(t, default=None):
            if t in tags:
                return tags[t][1]
            if default is None:
                raise ValueError(f"tiff: missing required tag {t}")
            return default

        w = tag(256)[0]
        h = tag(257)[0]
        spp = tag(277, [1])[0]
        bits = tag(258, [1] * spp)
        comp = tag(259, [1])[0]
        photometric = tag(262, [1])[0]
        offsets = tag(273)
        counts = tag(279)
        rps = tag(278, [h])[0] or h
        planar = tag(284, [1])[0]
        predictor = tag(317, [1])[0]
        if planar != 1:
            raise ValueError("tiff: planar configuration 2 unsupported")
        if spp not in (1, 3, 4):
            raise ValueError("tiff: samples per pixel must be 1/3/4")
        onebit = spp == 1 and bits[0] == 1
        if not onebit and any(b != 8 for b in bits):
            raise ValueError("tiff: only 8-bit samples (or 1-bit "
                             "bilevel) supported")
        if len(offsets) != len(counts):
            raise ValueError("tiff: strip offsets/counts mismatch")
        row_bytes = (w + 7) // 8 if onebit else w * spp
        raw = bytearray()
        for si, (o, c) in enumerate(zip(offsets, counts)):
            nrows = min(rps, h - si * rps)
            if nrows <= 0:
                raise ValueError("tiff: too many strips")
            expected = row_bytes * nrows
            strip = blob[o:o + c]
            if len(strip) < c:
                raise ValueError("tiff: truncated strip")
            if comp == 1:
                if len(strip) < expected:
                    raise ValueError("tiff: short uncompressed strip")
                raw += strip[:expected]
            elif comp == 5:
                raw += _tiff_lzw_decode(strip, expected)
            elif comp == 32773:
                raw += _unpackbits(strip, expected)
            else:
                raise ValueError(
                    f"tiff: compression {comp} unsupported (baseline "
                    "none/LZW/PackBits only — plug Pillow for "
                    "JPEG-in-TIFF/CCITT)")
        if onebit:
            # photometric 0 = WhiteIsZero, 1 = BlackIsZero
            inv = photometric == 0
            px = bytearray(w * h)
            for y in range(h):
                base = y * row_bytes
                for x in range(w):
                    bit = (raw[base + x // 8] >> (7 - x % 8)) & 1
                    px[y * w + x] = 255 * (bit ^ (1 if inv else 0))
            return w, h, 1, bytes(px)
        if predictor == 2:  # horizontal differencing, per row/sample
            for y in range(h):
                base = y * row_bytes
                for x in range(spp, row_bytes):
                    raw[base + x] = (raw[base + x]
                                     + raw[base + x - spp]) & 0xFF
        elif predictor != 1:
            raise ValueError("tiff: unsupported predictor")
        return w, h, spp, bytes(raw[:w * h * spp])
    raise ValueError(f"tiff: page {page} not in file")


# ------------------------------------------------------------------
# fixture-grade encoder

def _packbits(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 1 < n and row[i + 1] == row[i])):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code + 1 > (1 << width) and width < 12:
            width += 1  # EarlyChange: encoder widens one code early
        if next_code > 4093:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        emit(table[run], width)
        # the decoder appends one more table entry for this final code
        # BEFORE reading EOI, and may widen (EarlyChange) — mirror it,
        # or EOI is written at the stale width and misreads (review
        # fuzz finding: ~0.25% of random streams failed to decode)
        next_code += 1
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(pages: list[tuple[int, int, int, bytes]],
                compression: int = 1, predictor: int = 1,
                rows_per_strip: int = 0) -> bytes:
    """Fixture-grade little-endian TIFF writer: ``pages`` is a list of
    (width, height, channels, 8-bit pixels); every page shares the
    given compression (1/5/32773), optional predictor 2, optional
    stripping."""
    if compression not in (1, 5, 32773):
        raise ValueError("tiff: compression must be 1, 5, or 32773")
    if predictor not in (1, 2):
        raise ValueError("tiff: predictor must be 1 or 2")
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_ptr_at = 4
    for (w, h, ch, px) in pages:
        if ch not in (1, 3, 4) or len(px) != w * h * ch:
            raise ValueError("tiff: bad page buffer")
        rps = rows_per_strip or h
        row_bytes = w * ch
        data = bytearray(px)
        if predictor == 2:
            for y in range(h):
                base = y * row_bytes
                for x in range(row_bytes - 1, ch - 1, -1):
                    data[base + x] = (data[base + x]
                                      - data[base + x - ch]) & 0xFF
        strips = []
        for y0 in range(0, h, rps):
            chunk = bytes(data[y0 * row_bytes:(y0 + min(rps, h - y0))
                               * row_bytes])
            if compression == 5:
                chunk = _tiff_lzw_encode(chunk)
            elif compression == 32773:
                chunk = _packbits(chunk)
            strips.append(chunk)
        offs = []
        for sdata in strips:
            offs.append(len(out))
            out += sdata
        if len(out) % 2:
            out += b"\x00"
        extra = bytearray()
        entries = []

        def entry(tag, typ, vals):
            cnt = len(vals)
            fmt = {3: "H", 4: "I"}[typ]
            size = {3: 2, 4: 4}[typ] * cnt
            payload = struct.pack("<" + fmt * cnt, *vals)
            if size <= 4:
                entries.append(struct.pack("<HHI", tag, typ, cnt)
                               + payload.ljust(4, b"\x00"))
            else:
                entries.append(None)  # placeholder; fix below
                entries[-1] = (tag, typ, cnt, bytes(payload))

        entry(256, 4, [w])
        entry(257, 4, [h])
        entry(258, 3, [8] * ch)
        entry(259, 3, [compression])
        entry(262, 3, [1 if ch == 1 else 2])
        entry(273, 4, offs)
        entry(277, 3, [ch])
        entry(278, 4, [rps])
        entry(279, 4, [len(s) for s in strips])
        if predictor == 2:
            entry(317, 3, [2])
        # resolve deferred (oversized) entries
        ifd_off = len(out)
        n = len(entries)
        fixed = []
        ext_base = ifd_off + 2 + 12 * n + 4
        for e in entries:
            if isinstance(e, tuple):
                tag, typ, cnt, payload = e
                fixed.append(struct.pack("<HHII", tag, typ, cnt,
                                         ext_base + len(extra)))
                extra += payload
                if len(extra) % 2:
                    extra += b"\x00"
            else:
                fixed.append(e)
        struct.pack_into("<I", out, ifd_ptr_at, ifd_off)
        out += struct.pack("<H", n) + b"".join(fixed)
        ifd_ptr_at = len(out)
        out += b"\x00\x00\x00\x00" + extra
    return bytes(out)
