"""Pure-numpy codecs for uncompressed media formats.

Real decode/encode for formats whose layout is a header plus a raw sample
grid — no media libraries needed:

* **BMP** (24-bit uncompressed ``BITMAPINFOHEADER``) — bottom-up BGR rows,
  4-byte row padding;
* **PPM** (binary ``P6``) — ASCII header then RGB bytes;
* **WAV** (PCM16 mono/stereo RIFF) — canonical 44-byte header.

Compressed formats (JPEG/PNG/MP3/H.264) genuinely need PIL/cv2/ffmpeg —
those stay behind the marked import-try extension points in
``operators.multimodal``.  These codecs make the decode / resize /
feature-extract pipeline REAL end-to-end for uncompressed bytes, which is
all the plumbing contract needs: at scale the kernel body is swapped, the
Arrow batch shape is identical.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width = struct.unpack_from("<i", data, 18)[0]
    height = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=height * row_stride, offset=pixel_offset)
    rows = raw.reshape(height, row_stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit uncompressed BMP bytes."""
    h, w, _ = img.shape
    row_stride = (w * 3 + 3) & ~3
    body = np.zeros((h, row_stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    pixel_bytes = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + pixel_bytes


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (h, w, 3) uint8 RGB array."""
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM file")
    # Header: magic, width, height, maxval — whitespace separated, with
    # optional '#' comment lines.
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    raw = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 RIFF WAV → ((n_samples, n_channels) int16 array, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if chunk_id == b"fmt ":
            audio_fmt, n_channels, rate = struct.unpack_from("<HHI", data, pos + 8)
            bits = struct.unpack_from("<H", data, pos + 22)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
            fmt = (n_channels, rate)
        elif chunk_id == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            n_channels, rate = fmt
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=pos + 8)
            return samples.reshape(-1, n_channels).copy(), rate
        pos += 8 + size + (size & 1)
    raise ValueError("WAV data chunk missing")


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    if samples.ndim == 1:
        samples = samples[:, None]
    n_channels = samples.shape[1]
    body = samples.astype("<i2").tobytes()
    byte_rate = rate * n_channels * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(body), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, n_channels, rate, byte_rate,
                      n_channels * 2, 16)
        + struct.pack("<4sI", b"data", len(body))
        + body
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index arithmetic (the sampling
    grid matches the standard pixel-center convention)."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return img[rows][:, cols]


def sniff(data: bytes) -> str:
    """Container detection by magic bytes: 'bmp' | 'ppm' | 'wav' | 'fake' |
    'unknown'.  RIFF alone is not enough for WAV — WebP/AVI are RIFF
    containers too, so the WAVE fourcc is required."""
    head = bytes(data[:12])
    if head[:2] == b"BM":
        return "bmp"
    if head[:2] == b"P6":
        return "ppm"
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return "wav"
    if head[:4] in (b"IMG:", b"AUD:", b"VID:"):
        return "fake"
    return "unknown"
