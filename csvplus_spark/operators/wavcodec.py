"""Pure-Python PCM WAV codec (struct only, no native libs) — the
audio sibling of :mod:`pngcodec`: makes ``real_codec=True`` audio
metadata/feature extraction work in containers without soundfile /
librosa / ffmpeg. Scope: canonical RIFF/WAVE with integer PCM
(format 1), 8/16/24/32-bit, any channel count — the format's
overwhelmingly common shape; compressed/float WAVs raise honestly.

Reference layout (public spec): RIFF <size> WAVE, then chunks; the
``fmt `` chunk carries (format, channels, sample_rate, byte_rate,
block_align, bits); ``data`` carries interleaved little-endian PCM
frames. Chunks are word-aligned (odd sizes padded by one byte).
"""

from __future__ import annotations

import struct

__all__ = ["is_wav", "wav_info", "decode_wav", "encode_wav"]


def is_wav(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"


def _chunks(blob: bytes):
    """Yield (chunk_id, payload) honoring word alignment."""
    pos = 12
    n = len(blob)
    while pos + 8 <= n:
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        payload = blob[pos + 8: pos + 8 + size]
        yield cid, payload
        pos += 8 + size + (size & 1)  # odd chunk sizes are padded


def wav_info(blob: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, n_frames) without
    decoding samples. Raises ValueError on malformed/compressed
    input."""
    if not is_wav(blob):
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    data_len = None
    for cid, payload in _chunks(blob):
        if cid == b"fmt " and len(payload) >= 16:
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif cid == b"data":
            data_len = len(payload)
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _brate, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format code {audio_format} "
                         f"(only integer PCM=1)")
    if channels <= 0 or bits not in (8, 16, 24, 32) or block_align <= 0:
        raise ValueError("malformed fmt chunk")
    return rate, channels, bits, data_len // block_align


def decode_wav(blob: bytes) -> tuple[tuple[int, int, int, int], list[int]]:
    """((rate, channels, bits, n_frames), samples) — samples are
    signed ints in file order (frames interleaved by channel); 8-bit
    WAV is unsigned on disk and centered to signed here."""
    rate, channels, bits, n_frames = wav_info(blob)
    data = next(p for cid, p in _chunks(blob) if cid == b"data")
    usable = n_frames * channels * (bits // 8)
    data = data[:usable]
    if bits == 8:
        samples = [b - 128 for b in data]
    elif bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    elif bits == 32:
        samples = list(struct.unpack(f"<{len(data) // 4}i", data))
    else:  # 24-bit: manual sign extension
        samples = []
        for i in range(0, len(data), 3):
            v = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            samples.append(v - (1 << 24) if v & (1 << 23) else v)
    return (rate, channels, bits, n_frames), samples


def encode_wav(rate: int, channels: int, bits: int,
               samples: list[int]) -> bytes:
    """Canonical PCM WAV from signed int samples (interleaved).
    Inverse of :func:`decode_wav` for the supported bit depths."""
    if bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    elif bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 32:
        data = struct.pack(f"<{len(samples)}i", *samples)
    elif bits == 24:
        out = bytearray()
        for s in samples:
            v = s & 0xFFFFFF
            out += bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))
        data = bytes(out)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = channels * (bits // 8)
    byte_rate = rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                      block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body
