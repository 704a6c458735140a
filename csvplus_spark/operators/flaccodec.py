"""Pure-Python FLAC codec — no native audio lib (r10: the lossless
audio format crawl corpora actually carry; closes half of the
"mp3/ogg/flac need a real decoder" audio gate next to wavcodec.py).

Implements the published FLAC format (RFC 9639 / xiph spec) decode
surface: STREAMINFO, frame sync + header (all block-size/sample-rate/
sample-size codes, UTF-8-style coded numbers, CRC-8 verification),
subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) with
wasted bits, Rice-coded residuals (both 4- and 5-bit parameter
methods, partitioned, escape-to-raw), stereo decorrelation
(left/side, right/side, mid/side), and the frame CRC-16. Returns the
same ``((rate, channels, bits, n_frames), samples)`` contract as
``wavcodec.decode_wav`` so the audio operators treat both formats
identically.

A fixture-grade ``encode_flac`` writes real streams (CONSTANT /
FIXED-order-2 + Rice / VERBATIM subframes, optional mid/side, proper
CRCs) so every decode path is exercised without ffmpeg; losslessness
makes the roundtrip contract EXACT, like the WAV codec.
"""

from __future__ import annotations

import struct

FLAC_MAGIC = b"fLaC"

#: frame-header sample-rate code table (Hz); None = needs streaminfo
#: or an end-of-header field
_RATES = (None, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
          32000, 44100, 48000, 96000, None, None, None, None)

_SIZES = (None, 8, 12, None, 16, 20, 24, 32)


def is_flac(blob: bytes) -> bool:
    return bytes(blob[:4]) == FLAC_MAGIC


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes, byte-position aware (frame
    CRCs cover whole bytes)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos  # byte position of the NEXT unread byte
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("flac: truncated stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def flac_info(blob: bytes) -> tuple[int, int, int, int]:
    """(rate, channels, bits, total_samples) from STREAMINFO."""
    blob = bytes(blob)
    if not is_flac(blob):
        raise ValueError("flac: bad magic")
    pos = 4
    while True:
        if pos + 4 > len(blob):
            raise ValueError("flac: truncated metadata")
        hdr = blob[pos]
        length = int.from_bytes(blob[pos + 1:pos + 4], "big")
        if hdr & 0x7F == 0:  # STREAMINFO
            si = blob[pos + 4:pos + 4 + length]
            if len(si) < 18:
                raise ValueError("flac: short STREAMINFO")
            v = int.from_bytes(si[10:18], "big")
            rate = v >> 44
            channels = ((v >> 41) & 0x7) + 1
            bits = ((v >> 36) & 0x1F) + 1
            total = v & ((1 << 36) - 1)
            return rate, channels, bits, total
        pos += 4 + length
        if hdr & 0x80:
            raise ValueError("flac: no STREAMINFO block")


def _first_frame_pos(blob: bytes) -> int:
    pos = 4
    while True:
        hdr = blob[pos]
        length = int.from_bytes(blob[pos + 1:pos + 4], "big")
        pos += 4 + length
        if hdr & 0x80:
            return pos


def _coded_number(r: _Bits) -> int:
    """The UTF-8-style frame/sample number (up to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x40
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        raise ValueError("flac: bad coded number")
    v = b0 & (mask - 1)
    for _ in range(nbytes):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _residual(r: _Bits, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = r.read(4)
    if block_size % (1 << po):
        raise ValueError("flac: partition order does not divide block")
    out: list[int] = []
    for p in range(1 << po):
        n = (block_size >> po) - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.unary()
                v = (q << param) | r.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


_FIXED_COEF = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _subframe(r: _Bits, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("flac: bad subframe padding bit")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    bps -= wasted
    if t == 0:  # CONSTANT
        out = [r.signed(bps)] * block_size
    elif t == 1:  # VERBATIM
        out = [r.signed(bps) for _ in range(block_size)]
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        out = [r.signed(bps) for _ in range(order)]
        res = _residual(r, block_size, order)
        coef = _FIXED_COEF[order]
        for i, e in enumerate(res):
            n = order + i
            out.append(e + sum(c * out[n - 1 - j]
                               for j, c in enumerate(coef)))
    elif t & 0x20:  # LPC, order (t & 0x1F) + 1
        order = (t & 0x1F) + 1
        out = [r.signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coef = [r.signed(prec) for _ in range(order)]
        res = _residual(r, block_size, order)
        for i, e in enumerate(res):
            n = order + i
            acc = sum(c * out[n - 1 - j] for j, c in enumerate(coef))
            out.append(e + (acc >> shift))
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(blob: bytes) -> tuple[tuple[int, int, int, int],
                                      list[int]]:
    """((rate, channels, bits, n_frames), samples) — interleaved
    signed ints, the ``wavcodec.decode_wav`` contract. Verifies frame
    CRC-8/CRC-16 and decodes every subframe type + stereo
    decorrelation mode."""
    blob = bytes(blob)
    rate, channels, bits, total = flac_info(blob)
    pos = _first_frame_pos(blob)
    chans: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    while got < total:
        frame_start = pos
        r = _Bits(blob, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _coded_number(r)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        hdr_end = r.pos  # CRC-8 byte follows (headers are byte-aligned
        crc8 = r.read(8)
        if _crc8(blob[frame_start:hdr_end]) != crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")
        bps = _SIZES[ss_code] if ss_code else bits
        if bps is None:
            raise ValueError("flac: reserved sample size code")
        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError("flac: channel count mismatch")
            subs = [_subframe(r, block_size, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("flac: stereo decorrelation needs 2ch")
            # the SIDE subframe carries one extra bit
            if ch_code == 8:    # left/side
                left = _subframe(r, block_size, bps)
                side = _subframe(r, block_size, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _subframe(r, block_size, bps + 1)
                right = _subframe(r, block_size, bps)
                subs = [[rr + s for rr, s in zip(right, side)], right]
            else:               # mid/side
                mid = _subframe(r, block_size, bps)
                side = _subframe(r, block_size, bps + 1)
                lr = []
                rr = []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    lr.append((m + s) >> 1)
                    rr.append((m - s) >> 1)
                subs = [lr, rr]
        else:
            raise ValueError("flac: reserved channel assignment")
        r.align()
        crc16 = r.read(16)
        if _crc16(blob[frame_start:r.pos - 2]) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        take = min(block_size, total - got)
        for ci in range(channels):
            chans[ci].extend(subs[ci][:take])
        got += take
        pos = r.pos
    samples = [0] * (total * channels)
    for ci in range(channels):
        samples[ci::channels] = chans[ci]
    return (rate, channels, bits, total), samples


# ------------------------------------------------------------------
# fixture-grade encoder

class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int):
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def _rice_write(w: _BitW, res: list[int], param: int):
    for e in res:
        v = (e << 1) if e >= 0 else (((-e) << 1) - 1)  # zigzag
        w.write(0, v >> param)  # q zeros
        w.write(1, 1)
        w.write(v & ((1 << param) - 1), param)


def encode_flac(rate: int, channels: int, bits: int, samples: list[int],
                block_size: int = 256, mid_side: bool = False,
                verbatim: bool = False) -> bytes:
    """Encode interleaved signed samples as a REAL FLAC stream:
    CONSTANT subframes for flat blocks, else FIXED-order-2 + Rice
    residual (or VERBATIM with ``verbatim=True``); optional mid/side
    decorrelation for stereo. Exact-lossless: ``decode_flac`` must
    return the input bit-for-bit."""
    if channels not in (1, 2):
        raise ValueError("flac: fixture encoder handles 1-2 channels")
    if not 4 <= bits <= 32:
        raise ValueError("flac: bits out of range")
    if not 16 <= block_size <= 256:
        raise ValueError("flac: fixture block size is 16-256")
    if len(samples) % channels:
        raise ValueError("flac: sample count not divisible by channels")
    if mid_side and channels != 2:
        raise ValueError("flac: mid_side needs stereo")
    total = len(samples) // channels
    full = 1 << (bits - 1)
    if any(not -full <= s < full for s in samples):
        raise ValueError("flac: sample out of range for bit depth")

    out = bytearray(FLAC_MAGIC)
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    v = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | total
    si += v.to_bytes(8, "big")
    si += bytes(16)  # md5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    def write_sub(w: _BitW, ch: list[int], bps: int):
        if not verbatim and all(s == ch[0] for s in ch):
            w.write(0, 1)
            w.write(0, 6)  # CONSTANT
            w.write(0, 1)
            w.write(ch[0], bps)
            return
        over = (len(ch) > 2 and max(
            (abs(ch[i] - 2 * ch[i - 1] + ch[i - 2])
             for i in range(2, len(ch))), default=0).bit_length() >= 31)
        if verbatim or len(ch) <= 2 or over:
            # 32-bit noise can push order-2 residuals past the 31-bit
            # raw-escape ceiling — VERBATIM is always representable
            w.write(0, 1)
            w.write(1, 6)  # VERBATIM
            w.write(0, 1)
            for s in ch:
                w.write(s, bps)
            return
        order = 2
        w.write(0, 1)
        w.write(8 + order, 6)  # FIXED order 2
        w.write(0, 1)
        for s in ch[:order]:
            w.write(s, bps)
        res = [ch[i] - 2 * ch[i - 1] + ch[i - 2]
               for i in range(order, len(ch))]
        mx = max((abs(e) for e in res), default=0)
        param = max(0, (2 * mx + 1).bit_length() - 1)
        w.write(0, 2)  # 4-bit rice method
        w.write(0, 4)  # partition order 0
        if param > 14:
            # escape-to-raw: order-2 residuals of high-bit-depth noise
            # can reach ~2^33; a capped Rice parameter would emit
            # v>>14 unary ZEROS per sample — multi-MB blocks (review
            # finding). Raw width covers the signed residual range
            # (the >=31-bit case already fell through to VERBATIM).
            raw = max(1, (2 * mx).bit_length())
            w.write(0xF, 4)  # escape code
            w.write(raw, 5)
            for e in res:
                w.write(e, raw)
        else:
            w.write(param, 4)
            _rice_write(w, res, param)

    frame_no = 0
    done = 0
    while done < total:
        n = min(block_size, total - done)
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(6, 4)  # 8-bit block size at end of header
        w.write(0, 4)  # rate from streaminfo
        w.write(10 if mid_side else channels - 1, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits, 0),
                3)
        w.write(0, 1)
        # coded frame number (fits 7 bits for fixtures up to 127)
        if frame_no < 0x80:
            w.write(frame_no, 8)
        else:
            w.write(0xC0 | (frame_no >> 6), 8)
            w.write(0x80 | (frame_no & 0x3F), 8)
        w.write(n - 1, 8)
        hdr = bytes(w.buf)
        if w.n:
            raise AssertionError("flac: header not byte-aligned")
        w.write(_crc8(hdr), 8)
        chs = [samples[done * channels + ci::channels][:n]
               for ci in range(channels)]
        if mid_side:
            mid = [(l + r0) >> 1 for l, r0 in zip(chs[0], chs[1])]
            side = [l - r0 for l, r0 in zip(chs[0], chs[1])]
            write_sub(w, mid, bits)
            write_sub(w, side, bits + 1)
        else:
            for ch in chs:
                write_sub(w, ch, bits)
        w.align()
        body = bytes(w.buf)
        w.write(_crc16(body), 16)
        out += bytes(w.buf)
        frame_no += 1
        done += n
    return bytes(out)
