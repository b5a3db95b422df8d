"""Real, dependency-free media codecs (stdlib only: zlib + struct).

The container has no PIL/librosa/av, but PNG and WAV are simple enough
to implement from their public specifications — so the multimodal
operators can exercise a REAL encode → Arrow transfer → parse/decode
round trip instead of a stub:

* PNG: 8-bit RGB (color type 2), one zlib-compressed IDAT, per-row
  filter byte. The decoder handles all five standard row filters
  (None/Sub/Up/Average/Paeth); the encoder emits filter 0.
* WAV: canonical 44-byte RIFF header + PCM s16le mono frames.
* "SVID": a minimal framed video container of PNG frames
  (magic + frame interval + length-prefixed frames) — videos are just
  framed images; the format is ours, the frames are real PNGs.

These run inside Arrow-batched ``mapInPandas`` workers (bytes in,
bytes/fields out) — the same execution shape a PIL/av-based build has.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """8-bit RGB PNG. ``rgb`` is height×width×3 bytes, row-major."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse a PNG (8-bit RGB, non-interlaced) → (width, height, rgb)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, None
    height = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("bad IDAT payload size")
    out = bytearray()
    prev = bytearray(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        for i in range(stride):
            a = row[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 1:
                row[i] = (row[i] + a) & 0xFF
            elif ftype == 2:
                row[i] = (row[i] + b) & 0xFF
            elif ftype == 3:
                row[i] = (row[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
            elif ftype != 0:
                raise ValueError(f"unknown filter {ftype}")
        out += row
        prev = row
    return width, height, bytes(out)


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """PCM s16le mono WAV (canonical 44-byte header)."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Parse a PCM s16le mono WAV → (sample_rate, samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    sample_rate = None
    samples: list[int] = []
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM s16le mono supported")
        elif tag == b"data":
            samples = list(struct.unpack(f"<{len(body) // 2}h", body))
        pos += 8 + length + (length & 1)
    if sample_rate is None:
        raise ValueError("missing fmt chunk")
    return sample_rate, samples


_SVID_MAGIC = b"SVID"


def encode_video(frames: list[bytes], frame_ms: int) -> bytes:
    """Minimal framed container: magic, frame count, frame interval,
    then length-prefixed PNG frames."""
    head = _SVID_MAGIC + struct.pack("<II", len(frames), frame_ms)
    return head + b"".join(struct.pack("<I", len(f)) + f for f in frames)


def decode_video(data: bytes) -> tuple[int, list[bytes]]:
    """Parse an SVID container → (frame_ms, [png_frame_bytes])."""
    if data[:4] != _SVID_MAGIC:
        raise ValueError("not an SVID container")
    n_frames, frame_ms = struct.unpack("<II", data[4:12])
    pos = 12
    frames = []
    for _ in range(n_frames):
        (length,) = struct.unpack("<I", data[pos : pos + 4])
        frames.append(data[pos + 4 : pos + 4 + length])
        pos += 4 + length
    return frame_ms, frames
