"""Arithmetic-coded JPEG — pure Python, no native lib (r10: closes
the `arithmetic` branch of the multimodal decode gate; huffman
baseline r9 / progressive r10 live in jpegcodec.py). Both arithmetic
frame types ship, both directions: sequential SOF9
(encode_arith_jpeg/decode_arith_jpeg) and progressive SOF10
(encode_arith_progressive_jpeg/decode_arith_progressive_jpeg, Annex
G.2 scan structure over the QM coder).

Implements ITU-T T.81 Annex D (the QM arithmetic entropy coder: the
113-state probability-estimation machine of Table D.3 plus the fixed
equiprobable state 113, conditional MPS/LPS exchange, renormalization
with byte stuffing and carry resolution) and Annex F.1.4/F.2 (the DCT
statistical models: 64-bin DC conditioning with the L/U diff
classification, 256-bin AC conditioning with the Kx split at
X2-and-up, the non-adaptive sign bin), plus the DAC marker segment
(Tc/Tb + Cs conditioning values, T.81 B.2.4.3).

Both directions ship: ``encode_arith_jpeg`` exists primarily to make
REAL SOF9 fixtures (this container has no arithmetic-capable encoder
— Pillow/libjpeg-turbo don't encode arithmetic), ``decode_arith_jpeg``
is the corpus-facing path, dispatched from ``jpegcodec.decode_jpeg``.
Validation: encoder and decoder are independent implementations of the
Annex D flowcharts whose agreement is pinned by roundtrips, and the
decoded pixels must be IDENTICAL to the huffman baseline decode of the
same quantized coefficients (the entropy coder is lossless, so any
coder bug breaks that equality). Cross-validation against libjpeg
streams is not possible in this container; the state table and models
follow the published spec tables verbatim.

Remaining honest gates after this: lossless, hierarchical, and the
differential frame types (12-bit sequential huffman landed in
jpegcodec.encode_extended12_jpeg the same round).
"""

from __future__ import annotations

import struct

from .jpegcodec import (_JFIF_APP0, _block_qz, _idct8x8, _scaled_quant,
                        _segments, _subsampled_planes, _assemble_pixels,
                        QUANT_CHROMA, QUANT_LUMA, ZIGZAG, is_jpeg)

#: T.81 Table D.3 probability estimation state machine (+ state 113,
#: the fixed ~0.5 bin used for AC signs): (Qe, NMPS, NLPS, SWITCH).
_QE_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    # state 113: fixed ~equiprobable bin (NMPS=NLPS=113, no switch) —
    # used for AC coefficient signs (F.1.4.3.1)
    (0x5A1D, 113, 113, 0),
)

#: default conditioning (T.81 F.1.4.4.1.2 / F.1.4.4.2)
_DEF_DC_L, _DEF_DC_U, _DEF_AC_KX = 0, 1, 5


class _ArithEncoder:
    """T.81 D.1 QM encoder. Output bytes accumulate UNstuffed in
    ``out`` (carry resolution walks the list — the in-memory twin of
    the spec's stacked-0xFF bookkeeping); ``finish()`` applies the
    trailing-zero suppression and 0xFF→0xFF00 byte stuffing."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out: list[int] = []

    def _carry(self) -> None:
        i = len(self.out) - 1
        while True:
            if i < 0:
                # D.1.6: the spacer bits make carry-past-start
                # impossible in a conforming stream
                raise ValueError("arith: carry past stream start")
            self.out[i] += 1
            if self.out[i] == 0x100:
                self.out[i] = 0
                i -= 1
            else:
                return

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            self._carry()
            t &= 0xFF
        self.out.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        qe, nmps, nlps, sw = _QE_TAB[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if bit != mps:
            # LPS path (D.1.4): conditional exchange when the MPS
            # subinterval became the smaller one
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[i] = ((mps ^ sw) << 7) | nlps
        else:
            # MPS path: estimation updates ONLY on renormalization
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | nmps
        while True:
            self.a = (self.a << 1) & 0x1FFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                return

    def finish(self) -> bytes:
        # D.1.8: set C to the in-interval value with the most trailing
        # zeros, then emit the remaining 16 significant bits
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            self._carry()
            self.c &= 0x7FFFFFF
        self.out.append((self.c >> 19) & 0xFF)
        self.out.append((self.c >> 11) & 0xFF)
        while self.out and self.out[-1] == 0:
            self.out.pop()  # trailing zeros are recoverable (D.1.8)
        stuffed = bytearray()
        for b in self.out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0)
        return bytes(stuffed)


class _ArithDecoder:
    """T.81 D.2 QM decoder over one entropy-coded segment. Byte fetch
    handles 0xFF00 stuffing and pauses at any real marker, feeding
    zeros from then on (legal in arithmetic coding — trailing-zero
    suppression relies on it); ``restart(n)`` consumes the expected
    RSTn and reinitializes."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.marker: int | None = None
        self._marker_at = -1
        self._init_regs()

    def _init_regs(self) -> None:
        self.c = 0
        self.a = 0
        self.ct = -16  # bootstrap: two bytes load before first decode

    def _fetch(self) -> int:
        if self.marker is not None:
            return 0
        d, p = self.data, self.pos
        if p >= len(d):
            self.marker = 0xD9  # treat EOF as EOI
            self._marker_at = len(d)
            return 0
        b = d[p]
        self.pos = p + 1
        if b != 0xFF:
            return b
        q = self.pos
        while q < len(d) and d[q] == 0xFF:
            q += 1  # fill bytes
        if q < len(d) and d[q] == 0x00:
            self.pos = q + 1
            return 0xFF  # stuffed data byte
        self.marker = d[q] if q < len(d) else 0xD9
        self._marker_at = q
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        # renormalization & input (D.2.6)
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = ((self.c << 8) | self._fetch()) & 0xFFFFFFFF
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000  # two init bytes in: bootstrap
            self.a = (self.a << 1) & 0x1FFFF
        sv = st[i]
        qe, nmps, nlps, sw = _QE_TAB[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        aligned = self.a << self.ct
        if self.c >= aligned:
            # LPS subinterval (always renormalizes: Qe < 0x8000)
            self.c -= aligned
            if self.a < qe:  # conditional exchange → decode MPS
                self.a = qe
                st[i] = (mps << 7) | nmps
                return mps
            self.a = qe
            st[i] = ((mps ^ sw) << 7) | nlps
            return 1 - mps
        if self.a < 0x8000:
            if self.a < qe:  # conditional exchange → decode LPS
                st[i] = ((mps ^ sw) << 7) | nlps
                return 1 - mps
            st[i] = (mps << 7) | nmps
            return mps
        return mps  # no renorm → no estimation update

    def restart(self, idx: int) -> None:
        if self.marker is None:
            # decoder may not have consumed up to the marker: scan
            p = self.pos
            d = self.data
            while p + 1 < len(d):
                if d[p] == 0xFF and d[p + 1] != 0x00 and d[p + 1] != 0xFF:
                    self.marker = d[p + 1]
                    self._marker_at = p + 1
                    break
                p += 1
            if self.marker is None:
                raise ValueError("arith: restart marker not found")
        expected = 0xD0 + (idx & 7)
        if self.marker != expected:
            raise ValueError(
                f"arith: bad restart marker {self.marker:#x} "
                f"(expected {expected:#x})")
        self.pos = self._marker_at + 1
        self.marker = None
        self._marker_at = -1
        self._init_regs()


def _new_stats(n_comp: int):
    """Fresh statistics areas (all bins state 0 / MPS 0) + the fixed
    sign bin: used at scan start and after every restart (F.1.4)."""
    dc = [bytearray(64) for _ in range(min(n_comp, 2))]
    ac = [bytearray(256) for _ in range(min(n_comp, 2))]
    fixed = bytearray([113])
    return dc, ac, fixed


def _encode_dc(enc, st, fixed_unused, diff, ci, dc_context, L, U):
    """F.1.4.1: encode one DC difference against the conditioning
    state of the PREVIOUS diff for this component."""
    s0 = dc_context[ci]
    if diff == 0:
        enc.encode(st, s0, 0)
        dc_context[ci] = 0
        return
    enc.encode(st, s0, 1)
    if diff > 0:
        enc.encode(st, s0 + 1, 0)
        idx = s0 + 2  # SP
        sign = 0
        v = diff
    else:
        enc.encode(st, s0 + 1, 1)
        idx = s0 + 3  # SN
        sign = 1
        v = -diff
    m = 0
    v -= 1
    if v:
        enc.encode(st, idx, 1)
        m = 1
        idx = 20  # X1 (Table F.4)
        v2 = v
        while v2 >> 1:
            v2 >>= 1
            enc.encode(st, idx, 1)
            m <<= 1
            idx += 1
    enc.encode(st, idx, 0)
    # F.1.4.4.1.2: next-diff conditioning category from magnitude
    if m < (1 << L) >> 1:
        dc_context[ci] = 0
    elif m > (1 << U) >> 1:
        dc_context[ci] = 12 + sign * 4
    else:
        dc_context[ci] = 4 + sign * 4
    idx += 14  # mantissa bin (one shared bin per category)
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(st, idx, 1 if (mm & v) else 0)


def _encode_ac(enc, st, fixed, zz, kx):
    """F.1.4.2: encode the 63 AC coefficients of one block (zigzag
    list) with EOB decisions per index and the Kx high-magnitude
    split."""
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        idx = 3 * (k - 1)
        enc.encode(st, idx, 0)  # not-EOB
        while zz[k] == 0:
            enc.encode(st, idx + 1, 0)
            idx += 3
            k += 1
        enc.encode(st, idx + 1, 1)
        v = zz[k]
        if v > 0:
            enc.encode(fixed, 0, 0)
        else:
            enc.encode(fixed, 0, 1)
            v = -v
        idx += 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, idx, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, idx, 1)  # X1 shares the low-mag bin
                m <<= 1
                idx = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, idx, 1)
                    m <<= 1
                    idx += 1
        enc.encode(st, idx, 0)
        idx += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(st, idx, 1 if (mm & v) else 0)
        k += 1
    if ke < 63:
        enc.encode(st, 3 * ke, 1)  # EOB


def encode_arith_jpeg(width: int, height: int, channels: int,
                      pixels: bytes, quality: int = 90,
                      restart_interval: int = 0,
                      subsampling: str = "444",
                      dc_L: int = _DEF_DC_L, dc_U: int = _DEF_DC_U,
                      ac_Kx: int = _DEF_AC_KX) -> bytes:
    """Encode raw 8-bit pixels as an arithmetic-coded extended
    sequential JPEG (SOF9 + DAC). Same front half as the baseline
    encoder (identical quantized coefficients — jpegcodec._block_qz),
    so ``decode_arith_jpeg(encode_arith_jpeg(px)) ==
    decode_baseline_jpeg(encode_baseline_jpeg(px))`` exactly: the
    entropy coder is lossless. Non-default conditioning (dc_L/dc_U/
    ac_Kx) is written to DAC and must round-trip."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("width/height out of JPEG range")
    if not (0 <= dc_L <= dc_U <= 15):
        raise ValueError("DC conditioning needs 0 <= L <= U <= 15")
    if not 1 <= ac_Kx <= 63:
        raise ValueError("AC conditioning Kx must be 1-63")
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    hv, sizes, splanes = _subsampled_planes(
        width, height, channels, pixels, subsampling)
    quants = [ql] + [qc] * (channels - 1)
    tsel = [0] + [1] * (channels - 1)

    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    enc = _ArithEncoder()
    dc_stats, ac_stats, fixed = _new_stats(channels)
    pred = [0] * channels
    dc_ctx = [0] * channels
    scan = bytearray()
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                scan += enc.finish()
                scan += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1)
                                             & 7)])
                enc = _ArithEncoder()
                dc_stats, ac_stats, fixed = _new_stats(channels)
                pred = [0] * channels
                dc_ctx = [0] * channels
            mcu += 1
            for ci in range(channels):
                h, v = hv[ci]
                t = tsel[ci]
                for vy in range(v):
                    for vx in range(h):
                        qz = _block_qz(splanes[ci], *sizes[ci],
                                       (mx * h + vx) * 8,
                                       (my * v + vy) * 8, quants[ci])
                        _encode_dc(enc, dc_stats[t], fixed,
                                   qz[0] - pred[ci], ci, dc_ctx,
                                   dc_L, dc_U)
                        pred[ci] = qz[0]
                        _encode_ac(enc, ac_stats[t], fixed, qz, ac_Kx)
    scan += enc.finish()

    out = [b"\xff\xd8", _JFIF_APP0]
    for tid, q in ([(0, ql)] if channels == 1 else [(0, ql), (1, qc)]):
        body = bytes([tid]) + bytes(q[ZIGZAG[k]] for k in range(64))
        out.append(b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body)
    comps = b"".join(bytes([c + 1, (hv[c][0] << 4) | hv[c][1],
                            0 if c == 0 else 1])
                     for c in range(channels))
    sof = struct.pack(">BHHB", 8, height, width, channels) + comps
    out.append(b"\xff\xc9" + struct.pack(">H", len(sof) + 2) + sof)
    # DAC: conditioning per table class/id (B.2.4.3)
    dac = bytearray()
    for t in range(1 if channels == 1 else 2):
        dac += bytes([0x00 | t, (dc_U << 4) | dc_L])
        dac += bytes([0x10 | t, ac_Kx])
    out.append(b"\xff\xcc" + struct.pack(">H", len(dac) + 2) + bytes(dac))
    if restart_interval:
        out.append(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
    sos = bytes([channels]) + b"".join(
        bytes([c + 1, (tsel[c] << 4) | tsel[c]]) for c in range(channels)
    ) + bytes([0, 63, 0])
    out.append(b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos)
    out.append(bytes(scan))
    out.append(b"\xff\xd9")
    return b"".join(out)


def _decode_dc(dec, st, ci, dc_context, last_dc, L, U):
    """F.2.4.1: decode one DC difference, mirror of _encode_dc."""
    s0 = dc_context[ci]
    if dec.decode(st, s0) == 0:
        dc_context[ci] = 0
        return last_dc[ci]
    sign = dec.decode(st, s0 + 1)
    idx = s0 + 2 + sign
    m = dec.decode(st, idx)
    if m:
        idx = 20
        while dec.decode(st, idx):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith: DC magnitude overflow")
            idx += 1
    if m < (1 << L) >> 1:
        dc_context[ci] = 0
    elif m > (1 << U) >> 1:
        dc_context[ci] = 12 + sign * 4
    else:
        dc_context[ci] = 4 + sign * 4
    v = m
    idx += 14
    while m >> 1:
        m >>= 1
        if dec.decode(st, idx):
            v |= m
    v += 1
    if sign:
        v = -v
    last_dc[ci] += v
    return last_dc[ci]


def _decode_ac(dec, st, fixed, zz, kx):
    """F.2.4.2: decode the 63 AC coefficients into zigzag list zz."""
    k = 1
    while k <= 63:
        idx = 3 * (k - 1)
        if dec.decode(st, idx):
            return  # EOB
        while dec.decode(st, idx + 1) == 0:
            idx += 3
            k += 1
            if k > 63:
                raise ValueError("arith: AC index overflow")
        sign = dec.decode(fixed, 0)
        idx += 2
        m = dec.decode(st, idx)
        if m:
            if dec.decode(st, idx):
                m <<= 1
                idx = 189 if k <= kx else 217
                while dec.decode(st, idx):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith: AC magnitude overflow")
                    idx += 1
        v = m
        idx += 14
        while m >> 1:
            m >>= 1
            if dec.decode(st, idx):
                v |= m
        v += 1
        zz[k] = -v if sign else v
        k += 1


def decode_arith_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel decode of an arithmetic-coded extended sequential
    (SOF9) JPEG → (width, height, channels, pixels), same contract as
    ``decode_baseline_jpeg`` (1/3 components, sampling factors ≤ 2,
    restart intervals, DAC conditioning; ValueError on malformed or
    non-SOF9 frames)."""
    if not is_jpeg(blob):
        raise ValueError("not a JPEG stream (missing SOI)")
    quant: dict[int, list[int]] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    frame = None
    restart = 0
    scan = None
    for marker, seg, end_pos in _segments(blob):
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if p + 64 > len(seg):
                    raise ValueError("truncated quantization table")
                tbl = [0] * 64
                for k in range(64):
                    tbl[ZIGZAG[k]] = seg[p + k]
                p += 64
                quant[tq] = tbl
        elif marker == 0xCC:  # DAC
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                p += 2
                if tc == 0:
                    dc_cond[tb] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    if not 1 <= cs <= 63:
                        raise ValueError("arith: bad AC Kx conditioning")
                    ac_cond[tb] = cs
        elif marker in (0xC9,):
            if len(seg) < 6:
                raise ValueError("SOF segment too short")
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component frames supported")
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("SOF segment too short")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            if ncomp == 1:
                comps[0]["h"] = comps[0]["v"] = 1  # T.81 A.2
            frame = (width, height, comps)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "decode_arith_jpeg handles SOF9 (sequential arithmetic) "
                f"frames only (SOF{marker - 0xC0} found)")
        elif marker == 0xDD:
            if len(seg) < 2:
                raise ValueError("truncated DRI segment")
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if not seg or len(seg) < 1 + 2 * seg[0]:
                raise ValueError("truncated SOS segment")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + c * 2], seg[2 + c * 2]
                sel[cs] = (tt >> 4, tt & 0xF)
            scan = (sel, end_pos)
            break
    if frame is None or scan is None:
        raise ValueError("no frame/scan found")
    width, height, comps = frame
    sel, data_pos = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["plane"] = [0.0] * (c["bw"] * 8 * c["bh"] * 8)
        if c["id"] not in sel:
            raise ValueError("component missing from scan")
        td, ta = sel[c["id"]]
        c["L"], c["U"] = dc_cond.get(td, (_DEF_DC_L, _DEF_DC_U))
        c["kx"] = ac_cond.get(ta, _DEF_AC_KX)
        c["td"], c["ta"] = td, ta
        c["q"] = quant.get(c["tq"])
        if c["q"] is None:
            raise ValueError("missing quant table")

    n_tables = max(max(c["td"] for c in comps),
                   max(c["ta"] for c in comps)) + 1
    dec = _ArithDecoder(blob, data_pos)

    def fresh():
        return ([bytearray(64) for _ in range(n_tables)],
                [bytearray(256) for _ in range(n_tables)],
                bytearray([113]))

    dc_stats, ac_stats, fixed = fresh()
    last_dc = {i: 0 for i in range(len(comps))}
    dc_ctx = {i: 0 for i in range(len(comps))}
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                dec.restart(rst_idx)
                rst_idx += 1
                dc_stats, ac_stats, fixed = fresh()
                last_dc = {i: 0 for i in range(len(comps))}
                dc_ctx = {i: 0 for i in range(len(comps))}
            mcu_count += 1
            for ci, c in enumerate(comps):
                q = c["q"]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = [0] * 64
                        zz[0] = _decode_dc(dec, dc_stats[c["td"]], ci,
                                           dc_ctx, last_dc,
                                           c["L"], c["U"])
                        _decode_ac(dec, ac_stats[c["ta"]], fixed, zz,
                                   c["kx"])
                        coef = [0.0] * 64
                        for kk in range(64):
                            coef[ZIGZAG[kk]] = zz[kk] * q[ZIGZAG[kk]]
                        px = _idct8x8(coef)
                        bx0 = (mx * c["h"] + vx) * 8
                        by0 = (my * c["v"] + vy) * 8
                        row_w = c["bw"] * 8
                        for yy in range(8):
                            base = (by0 + yy) * row_w + bx0
                            for xx in range(8):
                                c["plane"][base + xx] = px[yy * 8 + xx]
    return width, height, len(comps), _assemble_pixels(
        width, height, comps, hmax, vmax)


# --------------------------------------------------------------------
# Progressive-arithmetic (SOF10) codec — T.81 Annex G.2 scan structure
# (spectral selection + successive approximation) with the Annex G
# arithmetic statistical models: the DC/AC-first models are the
# sequential ones over point-transformed values, DC refinement is one
# fixed-bin bit per block, AC refinement codes correction bits at the
# per-k (st+2) bin with newly-nonzero signs in the fixed bin. Unlike
# huffman progressive there are NO EOB runs — the EOB decision is a
# per-block context. Statistics reset at every scan start and restart.

def _pt_ac(v: int, al: int) -> int:
    """AC point transform (G.1.2.2): magnitude shift toward zero."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _enc_ac_value(enc, st, fixed, idx, v, k, kx):
    """Shared F.1.4 nonzero-AC value encoder at EOB-bin offset
    ``idx`` (sign via the fixed bin, Kx-split magnitude)."""
    if v > 0:
        enc.encode(fixed, 0, 0)
    else:
        enc.encode(fixed, 0, 1)
        v = -v
    idx += 2
    m = 0
    v -= 1
    if v:
        enc.encode(st, idx, 1)
        m = 1
        v2 = v
        if v2 >> 1:
            v2 >>= 1
            enc.encode(st, idx, 1)
            m <<= 1
            idx = 189 if k <= kx else 217
            while v2 >> 1:
                v2 >>= 1
                enc.encode(st, idx, 1)
                m <<= 1
                idx += 1
    enc.encode(st, idx, 0)
    idx += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(st, idx, 1 if (mm & v) else 0)


def encode_arith_progressive_jpeg(width: int, height: int, channels: int,
                                  pixels: bytes, quality: int = 90,
                                  subsampling: str = "444",
                                  script: list | None = None,
                                  restart_interval: int = 0,
                                  dc_L: int = _DEF_DC_L,
                                  dc_U: int = _DEF_DC_U,
                                  ac_Kx: int = _DEF_AC_KX) -> bytes:
    """Encode raw 8-bit pixels as a PROGRESSIVE ARITHMETIC (SOF10)
    JFIF JPEG: the huffman-progressive scan ``script`` format
    (``(comp_indices, Ss, Se, Ah, Al)``), QM-coded. Quantizes the
    exact same coefficients as every other encoder here (shared
    helpers), so the full-script decode must be pixel-identical to
    the baseline decode — the codec self-check."""
    from .jpegcodec import (_PROG_SCRIPT_GRAY, _PROG_SCRIPT_RGB,
                            _prog_scan_mcus)

    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("width/height out of JPEG range")
    if not (0 <= dc_L <= dc_U <= 15):
        raise ValueError("DC conditioning needs 0 <= L <= U <= 15")
    if not 1 <= ac_Kx <= 63:
        raise ValueError("AC conditioning Kx must be 1-63")
    if script is None:
        script = _PROG_SCRIPT_RGB if channels == 3 else _PROG_SCRIPT_GRAY
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    hv, sizes, splanes = _subsampled_planes(
        width, height, channels, pixels, subsampling)
    quants = [ql] + [qc] * (channels - 1)
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for ci in range(channels):
        h, v = hv[ci]
        bw, bh = mcux * h, mcuy * v
        cw, chh = sizes[ci]
        blocks = [_block_qz(splanes[ci], cw, chh, bx * 8, by * 8,
                            quants[ci])
                  for by in range(bh) for bx in range(bw)]
        comps.append({"id": ci + 1, "h": h, "v": v, "bw": bw, "bh": bh,
                      "ci": ci, "blocks": blocks,
                      "t": 0 if ci == 0 else 1})

    out = [b"\xff\xd8", _JFIF_APP0]
    for tid, q in ([(0, ql)] if channels == 1 else [(0, ql), (1, qc)]):
        body = bytes([tid]) + bytes(q[ZIGZAG[k]] for k in range(64))
        out.append(b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body)
    csof = b"".join(bytes([c + 1, (hv[c][0] << 4) | hv[c][1],
                           0 if c == 0 else 1])
                    for c in range(channels))
    sof = struct.pack(">BHHB", 8, height, width, channels) + csof
    out.append(b"\xff\xca" + struct.pack(">H", len(sof) + 2) + sof)
    dac = bytearray()
    for t in range(1 if channels == 1 else 2):
        dac += bytes([0x00 | t, (dc_U << 4) | dc_L])
        dac += bytes([0x10 | t, ac_Kx])
    out.append(b"\xff\xcc" + struct.pack(">H", len(dac) + 2) + bytes(dac))
    if restart_interval:
        out.append(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))

    for comp_idx, ss, se, ah, al in script:
        scomps = [comps[i] for i in comp_idx]
        is_dc = ss == 0
        if is_dc and se != 0:
            raise ValueError("DC scan must have Se=0")
        if not is_dc and len(scomps) != 1:
            raise ValueError("AC scans are single-component (T.81 G.2)")

        enc = _ArithEncoder()
        dc_stats = [bytearray(64) for _ in range(2)]
        ac_stats = [bytearray(256) for _ in range(2)]
        fixed = bytearray([113])
        pred = {c["ci"]: 0 for c in scomps}
        dc_ctx = {c["ci"]: 0 for c in scomps}
        scan_bytes = bytearray()

        def encode_block(c, bidx):
            blk = c["blocks"][bidx]
            st = (dc_stats if is_dc else ac_stats)[c["t"]]
            if is_dc and ah == 0:
                v = blk[0] >> al  # DC point transform: arithmetic shift
                _encode_dc(enc, st, fixed, v - pred[c["ci"]], c["ci"],
                           dc_ctx, dc_L, dc_U)
                pred[c["ci"]] = v
            elif is_dc:
                enc.encode(fixed, 0, (blk[0] >> al) & 1)
            elif ah == 0:
                # G.1.3.2: AC first scan — sequential model over the
                # point-transformed band
                ke = se
                while ke >= ss and _pt_ac(blk[ke], al) == 0:
                    ke -= 1
                k = ss
                while k <= ke:
                    idx = 3 * (k - 1)
                    enc.encode(st, idx, 0)  # not-EOB
                    while _pt_ac(blk[k], al) == 0:
                        enc.encode(st, idx + 1, 0)
                        idx += 3
                        k += 1
                    enc.encode(st, idx + 1, 1)
                    _enc_ac_value(enc, st, fixed, idx,
                                  _pt_ac(blk[k], al), k, ac_Kx)
                    k += 1
                if ke < se:
                    enc.encode(st, 3 * k - 3, 1)  # EOB at position k
            else:
                # G.1.3.3: AC refinement
                ke = se
                while ke >= ss and _pt_ac(blk[ke], al) == 0:
                    ke -= 1
                kex = ke
                while kex >= ss and _pt_ac(blk[kex], ah) == 0:
                    kex -= 1
                k = ss
                while k <= ke:
                    idx = 3 * (k - 1)
                    if k > kex:
                        enc.encode(st, idx, 0)  # EOB decision
                    while True:
                        v = _pt_ac(blk[k], al)
                        if v:
                            if v > 1 or v < -1:  # previously nonzero
                                enc.encode(st, idx + 2, abs(v) & 1)
                            else:  # newly nonzero: signal + sign
                                enc.encode(st, idx + 1, 1)
                                enc.encode(fixed, 0, 0 if v > 0 else 1)
                            break
                        enc.encode(st, idx + 1, 0)
                        idx += 3
                        k += 1
                    k += 1
                if k <= se:
                    enc.encode(st, 3 * (k - 1), 1)  # EOB flag

        unit = 0
        for mcu in _prog_scan_mcus(scomps, mcux, mcuy, hmax, vmax,
                                   width, height):
            if restart_interval and unit and \
                    unit % restart_interval == 0:
                scan_bytes += enc.finish()
                scan_bytes += bytes(
                    [0xFF, 0xD0 + ((unit // restart_interval - 1) & 7)])
                enc = _ArithEncoder()
                dc_stats = [bytearray(64) for _ in range(2)]
                ac_stats = [bytearray(256) for _ in range(2)]
                fixed = bytearray([113])
                pred = {c["ci"]: 0 for c in scomps}
                dc_ctx = {c["ci"]: 0 for c in scomps}
            unit += 1
            for c, bidx in mcu:
                encode_block(c, bidx)
        scan_bytes += enc.finish()

        sos = bytes([len(scomps)]) + b"".join(
            bytes([c["id"], (c["t"] << 4) | c["t"]]) for c in scomps
        ) + bytes([ss, se, (ah << 4) | al])
        out.append(b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos)
        out.append(bytes(scan_bytes))
    out.append(b"\xff\xd9")
    return b"".join(out)


def _next_marker(blob: bytes, pos: int) -> int:
    """Offset of the next non-restart marker's 0xFF prefix at/after
    ``pos`` (skips entropy bytes, stuffed zeros, fill 0xFFs, RSTn)."""
    n = len(blob)
    i = pos
    while i + 1 < n:
        if blob[i] == 0xFF:
            b = blob[i + 1]
            if b == 0x00 or 0xD0 <= b <= 0xD7:
                i += 2
                continue
            if b == 0xFF:
                i += 1
                continue
            return i
        i += 1
    raise ValueError("arith: no trailing marker found")


def decode_arith_progressive_jpeg(blob: bytes) -> tuple[int, int, int,
                                                        bytes]:
    """Full pixel decode of a PROGRESSIVE ARITHMETIC (SOF10) JPEG →
    (width, height, channels, pixels): per-scan QM decoding
    accumulates spectral bands and successive-approximation bits into
    per-block coefficient arrays, then one dequantize + IDCT +
    upsample pass. Supports interleaved DC scans, AC refinement,
    restart intervals, and DAC conditioning."""
    from .jpegcodec import _STANDALONE, _idct8x8, _prog_scan_mcus

    if not is_jpeg(blob):
        raise ValueError("not a JPEG stream (missing SOI)")
    n = len(blob)
    quant: dict[int, list[int]] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    frame = None
    restart = 0
    comps: list = []
    hmax = vmax = mcux = mcuy = 0
    width = height = 0
    i = 2
    while i < n:
        if blob[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i < n and blob[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = blob[i]
        i += 1
        if marker == 0xD9:
            break
        if marker in _STANDALONE:
            continue
        if i + 2 > n:
            raise ValueError("truncated segment length")
        seg_len = struct.unpack(">H", blob[i:i + 2])[0]
        if seg_len < 2 or i + seg_len > n:
            raise ValueError("bad segment length")
        seg = blob[i + 2:i + seg_len]
        data_pos = i + seg_len
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if p + 64 > len(seg):
                    raise ValueError("truncated quantization table")
                tbl = [0] * 64
                for k in range(64):
                    tbl[ZIGZAG[k]] = seg[p + k]
                p += 64
                quant[tq] = tbl
        elif marker == 0xCC:
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                p += 2
                if tc == 0:
                    dc_cond[tb] = (cs & 0x0F, cs >> 4)
                else:
                    if not 1 <= cs <= 63:
                        raise ValueError("arith: bad AC Kx conditioning")
                    ac_cond[tb] = cs
        elif marker == 0xDD:
            if len(seg) < 2:
                raise ValueError("truncated DRI segment")
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xCA:
            if frame is not None:
                raise ValueError("multiple SOF frames")
            if len(seg) < 6:
                raise ValueError("SOF segment too short")
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component frames supported")
            for c in range(ncomp):
                cid, hvb, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hvb >> 4, "v": hvb & 0xF,
                              "tq": tq})
            if ncomp == 1:
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2
                       for c in comps):
                raise ValueError("sampling factors beyond 2 unsupported")
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bw"] = mcux * c["h"]
                c["bh"] = mcuy * c["v"]
                c["cz"] = [[0] * 64 for _ in range(c["bw"] * c["bh"])]
            frame = True
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "decode_arith_progressive_jpeg handles SOF10 frames "
                f"only (SOF{marker - 0xC0} found)")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF (no frame header)")
            if not seg or len(seg) < 4 + 2 * seg[0]:
                raise ValueError("truncated SOS segment")
            ns = seg[0]
            scomps, tsel = [], {}
            for c in range(ns):
                cs, tt = seg[1 + c * 2], seg[2 + c * 2]
                cc = next((x for x in comps if x["id"] == cs), None)
                if cc is None:
                    raise ValueError("scan component not in frame")
                scomps.append(cc)
                tsel[cs] = (tt >> 4, tt & 0xF)
            ss, se, ahl = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0xF
            i = _decode_arith_prog_scan(
                blob, data_pos, scomps, tsel, ss, se, ah, al,
                dc_cond, ac_cond, restart, mcux, mcuy, hmax, vmax,
                width, height)
            continue
        i += seg_len
    if frame is None:
        raise ValueError("no frame/scan found")
    for c in comps:
        q = quant.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table")
        c["plane"] = [0.0] * (c["bw"] * 8 * c["bh"] * 8)
        row_w = c["bw"] * 8
        for bidx, zz in enumerate(c["cz"]):
            coef = [0.0] * 64
            for k in range(64):
                if zz[k]:
                    coef[ZIGZAG[k]] = zz[k] * q[ZIGZAG[k]]
            px = _idct8x8(coef)
            by0 = (bidx // c["bw"]) * 8
            bx0 = (bidx % c["bw"]) * 8
            for yy in range(8):
                base = (by0 + yy) * row_w + bx0
                for xx in range(8):
                    c["plane"][base + xx] = px[yy * 8 + xx]
    return width, height, len(comps), _assemble_pixels(
        width, height, comps, hmax, vmax)


def _decode_arith_prog_scan(blob, pos, scomps, tsel, ss, se, ah, al,
                            dc_cond, ac_cond, restart, mcux, mcuy,
                            hmax, vmax, width, height) -> int:
    """Decode one progressive-arithmetic scan, accumulating into each
    component's ``cz`` blocks; returns the next marker offset."""
    from .jpegcodec import _prog_scan_mcus

    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("DC scan must have Se=0")
    if not is_dc and (len(scomps) != 1 or not 1 <= ss <= se <= 63):
        raise ValueError("invalid AC scan parameters")
    dec = _ArithDecoder(blob, pos)

    def fresh():
        return ([bytearray(64) for _ in range(2)],
                [bytearray(256) for _ in range(2)],
                bytearray([113]))

    dc_stats, ac_stats, fixed = fresh()
    last_dc = {id(c): 0 for c in scomps}
    dc_ctx = {id(c): 0 for c in scomps}
    p1 = 1 << al

    def decode_block(c, bidx):
        zz = c["cz"][bidx]
        td, ta = tsel[c["id"]]
        if is_dc and ah == 0:
            st = dc_stats[td]
            L, U = dc_cond.get(td, (_DEF_DC_L, _DEF_DC_U))
            s0 = dc_ctx[id(c)]
            if dec.decode(st, s0) == 0:
                dc_ctx[id(c)] = 0
            else:
                sign = dec.decode(st, s0 + 1)
                idx = s0 + 2 + sign
                m = dec.decode(st, idx)
                if m:
                    idx = 20
                    while dec.decode(st, idx):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "arith: DC magnitude overflow")
                        idx += 1
                if m < (1 << L) >> 1:
                    dc_ctx[id(c)] = 0
                elif m > (1 << U) >> 1:
                    dc_ctx[id(c)] = 12 + sign * 4
                else:
                    dc_ctx[id(c)] = 4 + sign * 4
                v = m
                idx += 14
                while m >> 1:
                    m >>= 1
                    if dec.decode(st, idx):
                        v |= m
                v += 1
                if sign:
                    v = -v
                last_dc[id(c)] += v
            zz[0] = last_dc[id(c)] << al
        elif is_dc:
            if dec.decode(fixed, 0):
                zz[0] |= p1
        elif ah == 0:
            st = ac_stats[ta]
            kx = ac_cond.get(ta, _DEF_AC_KX)
            k = ss
            while k <= se:
                idx = 3 * (k - 1)
                if dec.decode(st, idx):
                    return  # EOB
                while dec.decode(st, idx + 1) == 0:
                    idx += 3
                    k += 1
                    if k > se:
                        raise ValueError("arith: AC index overflow")
                sign = dec.decode(fixed, 0)
                idx += 2
                m = dec.decode(st, idx)
                if m:
                    if dec.decode(st, idx):
                        m <<= 1
                        idx = 189 if k <= kx else 217
                        while dec.decode(st, idx):
                            m <<= 1
                            if m == 0x8000:
                                raise ValueError(
                                    "arith: AC magnitude overflow")
                            idx += 1
                v = m
                idx += 14
                while m >> 1:
                    m >>= 1
                    if dec.decode(st, idx):
                        v |= m
                v += 1
                zz[k] = (-v if sign else v) << al
                k += 1
        else:
            st = ac_stats[ta]
            m1 = -1 << al
            # previous-stage EOB index: every nonzero accumulated coef
            # was set by an earlier scan (|zz| >= 2^Ah), so the plain
            # nonzero test IS the Ah-stage significance test
            kex = se
            while kex >= ss and zz[kex] == 0:
                kex -= 1
            k = ss
            while k <= se:
                idx = 3 * (k - 1)
                if k > kex:
                    if dec.decode(st, idx):
                        break  # EOB
                while True:
                    if zz[k]:
                        if dec.decode(st, idx + 2):
                            zz[k] += m1 if zz[k] < 0 else p1
                        break
                    if dec.decode(st, idx + 1):
                        zz[k] = m1 if dec.decode(fixed, 0) else p1
                        break
                    idx += 3
                    k += 1
                    if k > se:
                        raise ValueError("arith: AC index overflow")
                k += 1

    unit = 0
    rst_idx = 0
    for mcu in _prog_scan_mcus(scomps, mcux, mcuy, hmax, vmax,
                               width, height):
        if restart and unit and unit % restart == 0:
            dec.restart(rst_idx)
            rst_idx += 1
            dc_stats, ac_stats, fixed = fresh()
            last_dc = {id(c): 0 for c in scomps}
            dc_ctx = {id(c): 0 for c in scomps}
        unit += 1
        for c, bidx in mcu:
            decode_block(c, bidx)
    return _next_marker(blob, dec.pos if dec.marker is None
                        else dec._marker_at - 1)
