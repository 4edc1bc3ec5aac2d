"""Pure-numpy codecs for simple media formats.

Real decode/encode with no media libraries needed:

* **BMP** (24-bit uncompressed ``BITMAPINFOHEADER``) — bottom-up BGR rows,
  4-byte row padding;
* **netpbm** (binary ``P6``/``P5``/``P4`` — PPM RGB, PGM grayscale, PBM
  bitmap; the raw OCR-corpus formats) — ASCII header then sample bytes
  (P4 rows bit-packed, 1 = black per spec, decoded to 0/255 gray);
* **WAV** (RIFF) — canonical 44-byte header; every uncompressed sample
  format real corpora carry (r12): PCM 8/16/24/32-bit and IEEE
  float32/float64, any channel count (compressed WAV payloads — ADPCM,
  a-law/mu-law, MP3-in-WAV — stay behind the extension point);
* **PNG** — the FULL static-image spec surface (r12): every legal
  bit-depth/color-type combination (1/2/4/8/16-bit gray, 8/16-bit
  RGB/gray+alpha/RGBA, 1/2/4/8-bit palette with optional tRNS
  transparency) and both interlace methods (none + Adam7) — stdlib
  ``zlib`` inflate plus numpy unfiltering of all five scanline filters
  (None/Sub/Up/Average/Paeth; filters operate on BYTES with a
  bit-depth-dependent lane distance, per spec).  The encoders can emit
  any filter type, depth, and interlace mode (``encode_png_palette``
  emits color-type-3 files), so every decoder reconstruction path is
  round-trip testable.
* **JPEG** (baseline sequential AND progressive DCT — spectral
  selection + successive approximation, r12 — Huffman, 4:4:4 / 4:2:0,
  restart markers) — full pure-numpy pipeline in ``jpeg_codec``,
  re-exported here as ``decode_jpeg`` / ``encode_jpeg``.
* **GIF** (87a/89a, r12) — full LZW, global/local color tables,
  interlace, transparency, frame disposal; animated frames make the
  multimodal VIDEO kind real (``gif_codec``, re-exported here as
  ``decode_gif`` / ``encode_gif`` / ``count_gif_frames``).
* **TIFF** (6.0 baseline classic, r12) — the scanned-document family:
  both byte orders, strips, compressions none/TIFF-LZW(+predictor)/
  PackBits, bilevel/gray/RGB/RGBA/palette, multi-page (pages sample
  like video frames); BigTIFF/tiles/16-bit/CCITT stay gated
  (``tiff_codec``).

Still genuinely out of reach without PIL/cv2/ffmpeg: MP3 and
H.264 — those stay behind
the marked extension points in ``operators.multimodal``.  These codecs
make the decode / resize / feature-extract pipeline REAL end-to-end for
the formats above, which is all the plumbing contract needs: at scale the
kernel body is swapped, the Arrow batch shape is identical.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from spreadsheet_etl_engine_spark.functions.gif_codec import (  # noqa: F401
    count_gif_frames,
    decode_gif,
    encode_gif,
    probe_gif_dims,
)
from spreadsheet_etl_engine_spark.functions.jpeg_codec import (  # noqa: F401
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from spreadsheet_etl_engine_spark.functions.tiff_codec import (  # noqa: F401
    count_tiff_pages,
    decode_tiff,
    decode_tiff_pages,
    encode_tiff,
    probe_tiff_dims,
)


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


def _pnm_header(data: bytes, n_fields: int) -> tuple[list[int], int]:
    """Whitespace-separated integer header fields after the magic, with
    '#' comment lines — shared by the P4/P5/P6 netpbm parsers."""
    fields: list[int] = []
    pos = 2
    while len(fields) < n_fields:
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
    return fields, pos + 1               # single whitespace after header


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary netpbm → uint8 array: P6 (PPM RGB, maxval 255) →
    (h, w, 3); P5 (PGM gray — the OCR-corpus shape) → (h, w, 1);
    P4 (PBM bitmap, 1 = black per spec, row-padded bits) → (h, w, 1)
    with black as 0 and white as 255 (the grayscale convention)."""
    magic = data[:2]
    if magic == b"P6":
        (w, h, maxval), pos = _pnm_header(data, 3)
        if maxval != 255:
            raise ValueError("only maxval=255 PPM supported")
        raw = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
        return raw.reshape(h, w, 3).copy()
    if magic == b"P5":
        (w, h, maxval), pos = _pnm_header(data, 3)
        if maxval != 255:
            raise ValueError("only maxval=255 PGM supported")
        raw = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=pos)
        return raw.reshape(h, w, 1).copy()
    if magic == b"P4":
        (w, h), pos = _pnm_header(data, 2)
        row_bytes = (w + 7) // 8
        raw = np.frombuffer(data, dtype=np.uint8, count=h * row_bytes,
                            offset=pos).reshape(h, row_bytes)
        black = np.unpackbits(raw, axis=1)[:, :w]
        return ((1 - black) * 255).astype(np.uint8)[:, :, None].copy()
    raise ValueError("not a binary PPM/PGM/PBM file")


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 array → binary netpbm: (h, w, 3) emits P6; (h, w) or
    (h, w, 1) emits P5 grayscale."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch == 1:
        return b"P5\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_pbm(bitmap: np.ndarray) -> bytes:
    """(h, w) bitmap (nonzero = black) → binary PBM (P4) bytes."""
    if bitmap.ndim != 2:
        raise ValueError("encode_pbm needs a (h, w) bitmap")
    h, w = bitmap.shape
    packed = np.packbits((np.asarray(bitmap) != 0).astype(np.uint8), axis=1)
    return b"P4\n%d %d\n" % (w, h) + packed.tobytes()


# WAV sample formats: (audio_fmt, bits) -> numpy dtype of the decoded
# array.  PCM8 is unsigned per spec; PCM24 sign-extends into int32;
# the G.711 companded formats (6 = a-law, 7 = mu-law — the telephony
# encodings, r13) expand to int16 via the ITU tables below.
_WAV_FORMATS = {
    (1, 8): np.uint8, (1, 16): np.int16, (1, 24): np.int32,
    (1, 32): np.int32, (3, 32): np.float32, (3, 64): np.float64,
    (6, 8): np.int16, (7, 8): np.int16,
}


def _g711_decode_tables() -> tuple[np.ndarray, np.ndarray]:
    """(a-law, mu-law) 256-entry expansion tables, computed from the
    ITU-T G.711 segment formulas (public spec arithmetic, no
    transcription): every byte maps to its int16 linear sample.
    Validated at import by the exact involution below — G.711
    compression of every table entry must reproduce its byte."""
    bytes_ = np.arange(256, dtype=np.int32)
    # a-law: toggle the even bits, then 3-bit segment + 4-bit mantissa.
    a = bytes_ ^ 0x55
    a_sign = (a & 0x80) != 0
    a_exp = (a >> 4) & 7
    a_mant = a & 0x0F
    a_val = np.where(a_exp == 0, (a_mant << 4) + 8,
                     ((a_mant << 4) + 0x108) << np.maximum(a_exp - 1, 0))
    alaw = np.where(a_sign, -a_val, a_val).astype(np.int16)
    # mu-law: stored inverted, biased by 0x84.
    u = ~bytes_ & 0xFF
    u_sign = (u & 0x80) != 0
    u_exp = (u >> 4) & 7
    u_mant = u & 0x0F
    u_val = (((u_mant << 3) + 0x84) << u_exp) - 0x84
    mulaw = np.where(u_sign, -u_val, u_val).astype(np.int16)
    return alaw, mulaw


_ALAW_TABLE, _MULAW_TABLE = _g711_decode_tables()


def _alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 -> a-law bytes (ITU G.711 segment compression)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635)
    exp = np.searchsorted(
        np.array([0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000]),
        mag, side="right")
    low = mag >> 4                                   # segment 0: linear
    high = ((mag >> (exp + 3)) & 0x0F) | (exp << 4)
    val = np.where(exp == 0, low, high)
    return ((val | sign) ^ 0x55).astype(np.uint8)


def _mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 -> mu-law bytes (ITU G.711, bias 0x84, stored inverted)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = np.searchsorted(
        np.array([0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000]),
        mag, side="right")
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


# Import-time involution check: compressing every expansion-table entry
# must reproduce its byte exactly — a mis-derived segment formula on
# either side breaks it for some of the 256 codes.  The ONE legitimate
# exception: mu-law has two zero codes (0x7F "negative zero" and 0xFF)
# that both expand to 0; the canonical encoder emits 0xFF, so 0x7F
# re-encodes to 0xFF by design.
assert np.array_equal(_alaw_encode(_ALAW_TABLE), np.arange(256)), \
    "G.711 a-law tables are not an involution"
_mu_recode = _mulaw_encode(_MULAW_TABLE)
assert _mu_recode[0x7F] == 0xFF and _MULAW_TABLE[0x7F] == 0, \
    "G.711 mu-law negative zero is mis-derived"
_mu_rest = np.delete(np.arange(256), 0x7F)
assert np.array_equal(_mu_recode[_mu_rest], _mu_rest), \
    "G.711 mu-law tables are not an involution"
del _mu_recode, _mu_rest


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAV → ((n_samples, n_channels) array, sample_rate).

    All the PCM widths real corpora carry (r12 — previously PCM16
    only): unsigned 8-bit → uint8, 16-bit → int16, 24-bit
    (sign-extended) and 32-bit → int32, plus IEEE float (format 3) →
    float32/float64, plus the G.711 companded telephony formats (r13:
    6 = a-law, 7 = mu-law → int16 through the ITU expansion tables).
    MP3/ADPCM stay behind the extension point."""
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
            if (audio_fmt, bits) not in _WAV_FORMATS:
                raise ValueError(
                    f"unsupported WAV sample format (fmt={audio_fmt}, "
                    f"bits={bits})")
            fmt = (n_channels, rate, audio_fmt, bits)
        elif chunk_id == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            n_channels, rate, audio_fmt, bits = fmt
            if audio_fmt in (6, 7):
                # G.711 (r13): one companded byte per sample expands
                # through the ITU table to int16.
                codes = np.frombuffer(data, dtype=np.uint8, count=size,
                                      offset=pos + 8)
                table = _ALAW_TABLE if audio_fmt == 6 else _MULAW_TABLE
                return (table[codes].reshape(-1, n_channels), rate)
            if bits == 24:
                if size % (3 * n_channels):
                    raise ValueError(
                        f"24-bit WAV data chunk size {size} is not a "
                        f"multiple of the {3 * n_channels}-byte frame")
                raw = np.frombuffer(data, dtype=np.uint8,
                                    count=size, offset=pos + 8)
                tri = raw.reshape(-1, 3).astype(np.uint32)
                vals = tri[:, 0] | (tri[:, 1] << 8) | (tri[:, 2] << 16)
                samples = vals.astype(np.int32)
                samples[samples >= (1 << 23)] -= 1 << 24
                # Left-justify into the int32 full scale (the libsndfile
                # convention), so downstream normalization is one rule
                # for PCM24 and PCM32 alike.
                samples <<= 8
            else:
                dtype = np.dtype(_WAV_FORMATS[(audio_fmt, bits)]).newbyteorder("<")
                width = bits // 8
                samples = np.frombuffer(data, dtype=dtype,
                                        count=size // width, offset=pos + 8)
            return samples.reshape(-1, n_channels).astype(
                _WAV_FORMATS[(audio_fmt, bits)]), rate
        pos += 8 + size + (size & 1)
    raise ValueError("WAV data chunk missing")


def encode_wav(samples: np.ndarray, rate: int, *,
               bits: int | None = None,
               codec: str | None = None) -> bytes:
    """Sample array → RIFF WAV bytes.  The format follows the dtype
    (uint8 → PCM8, int16 → PCM16, int32 → PCM32, float32/float64 →
    IEEE float); ``bits=24`` packs an int32 array as PCM24;
    ``codec='alaw'|'mulaw'`` compands an int16 array to G.711 bytes
    (format codes 6/7 — the telephony encodings, r13)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_channels = samples.shape[1]
    if codec is not None:
        if codec not in ("alaw", "mulaw"):
            raise ValueError(f"unknown WAV codec {codec!r}")
        if bits is not None and bits != 8:
            raise ValueError("G.711 WAV is 8 bits per sample")
        if samples.dtype != np.int16:
            raise ValueError("G.711 WAV encodes from an int16 array")
        enc = _alaw_encode if codec == "alaw" else _mulaw_encode
        body = enc(samples.reshape(-1)).tobytes()
        audio_fmt, width = (6 if codec == "alaw" else 7), 1
    elif bits == 24:
        # Takes FULL-SCALE int32 (decode_wav's convention) and keeps the
        # top 24 bits — the low byte is what 24-bit precision discards.
        if samples.dtype != np.int32:
            raise ValueError("PCM24 WAV encodes from an int32 array")
        vals = ((samples.reshape(-1).astype(np.int64) >> 8)
                & 0xFFFFFF).astype(np.uint32)
        tri = np.empty((vals.size, 3), dtype=np.uint8)
        tri[:, 0] = vals & 0xFF
        tri[:, 1] = (vals >> 8) & 0xFF
        tri[:, 2] = (vals >> 16) & 0xFF
        body = tri.tobytes()
        audio_fmt, width = 1, 3
    else:
        spec = {np.dtype(np.uint8): (1, 1), np.dtype(np.int16): (1, 2),
                np.dtype(np.int32): (1, 4), np.dtype(np.float32): (3, 4),
                np.dtype(np.float64): (3, 8)}.get(samples.dtype)
        if spec is None:
            raise ValueError(f"unsupported WAV sample dtype {samples.dtype}")
        if bits is not None and bits != spec[1] * 8:
            raise ValueError(f"bits={bits} does not match dtype {samples.dtype}")
        audio_fmt, width = spec
        body = samples.astype(samples.dtype.newbyteorder("<")).tobytes()
    byte_rate = rate * n_channels * width
    # RIFF chunks are word-aligned: an odd-length data chunk body (PCM8/
    # PCM24 mono, odd sample count) gets a zero pad byte — excluded from
    # the chunk size, included in the RIFF size (r12 ADVICE; decode_wav's
    # `size & 1` skip already tolerates it, strict readers require it).
    pad = b"\x00" if len(body) & 1 else b""
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(body) + len(pad), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, audio_fmt, n_channels, rate,
                      byte_rate, n_channels * width, width * 8)
        + struct.pack("<4sI", b"data", len(body))
        + body
        + pad
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index arithmetic (the sampling
    grid matches the standard pixel-center convention)."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return img[rows][:, cols]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel
# (type 3 scanlines carry ONE palette index per pixel; the palette
# lookup after unfiltering expands to RGB, or RGBA when tRNS is present)
# Legal bit depths per color type (PNG spec §11.2.2, Table 11.1).
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
# Sub-byte gray sample -> 8-bit scaling (bit replication: 255/(2^d-1)).
_PNG_GRAY_SCALE = {1: 255, 2: 85, 4: 17}
# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
#: In-memory decode budget (job safety): PNG dims are 32-bit, so a
#: corrupt 33-byte header can claim a multi-GB image whose allocation
#: MemoryError is not in the totality contract's catchable set.
_PNG_MAX_SAMPLES = 1 << 28


def _png_stride(w: int, ch: int, depth: int) -> int:
    """Scanline payload bytes (excluding the filter byte)."""
    return (w * ch * depth + 7) // 8


def _png_bpp(ch: int, depth: int) -> int:
    """Filter lane distance in bytes ('bpp' in the spec): the byte
    offset of the corresponding byte one PIXEL to the left, floored
    at 1 for sub-byte depths."""
    return max(1, ch * depth // 8)


def _adam7_passes(w: int, h: int):
    """Non-empty Adam7 passes as (xs, ys, xstep, ystep, wp, hp).
    Empty passes (small images) contribute NO scanlines — not even
    filter bytes — per spec."""
    for xs, ys, xstep, ystep in _ADAM7:
        wp = (w - xs + xstep - 1) // xstep
        hp = (h - ys + ystep - 1) // ystep
        if wp > 0 and hp > 0:
            yield xs, ys, xstep, ystep, wp, hp


def _unfilter_bytes(raw: np.ndarray, bpp: int) -> np.ndarray:
    """(h, 1+stride) filtered scanlines -> (h, stride) reconstructed
    bytes.  Filters None/Sub/Up vectorize (Sub is a per-lane cumulative
    sum mod 256); Average/Paeth carry a strict left-neighbor recurrence
    with no closed form, so those rows reconstruct per-byte in Python —
    see decode_png's throughput note."""
    h, stride1 = raw.shape
    stride = stride1 - 1
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:]
        if ft == 0:      # None
            rec = line.copy()
        elif ft == 1:    # Sub: per-lane cumulative sum mod 256
            rec = np.cumsum(
                line.reshape(-1, bpp).astype(np.uint64), axis=0
            ).astype(np.uint8).reshape(-1)
        elif ft == 2:    # Up
            rec = line + prev  # uint8 wraps mod 256
        elif ft == 3:    # Average: left term is sequential
            rec = np.empty_like(line)
            up = prev.astype(np.int32)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + ((left + int(up[x])) >> 1)) & 0xFF
        elif ft == 4:    # Paeth: predictor depends on reconstructed left
            rec = np.empty_like(line)
            up = prev.astype(np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(up[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def _bytes_to_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, stride) reconstructed scanline bytes -> (h, w, ch) sample
    array: uint16 for depth 16, raw uint8 samples otherwise (sub-byte
    gray scaling and palette expansion are the caller's job)."""
    h = rows.shape[0]
    if depth == 16:
        b = rows.reshape(h, w * ch, 2).astype(np.uint16)
        return ((b[..., 0] << 8) | b[..., 1]).reshape(h, w, ch)
    if depth == 8:
        return rows.reshape(h, w, ch).copy()
    # 1/2/4-bit: single sample lane (gray or palette indexes), packed
    # MSB-first within each byte; trailing pad bits crop off at w.
    bits = np.unpackbits(rows, axis=1)
    vals = bits.reshape(h, -1, depth).astype(np.uint8)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    packed = (vals * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)
    return packed[:, :w].reshape(h, w, 1)


def _samples_to_bytes(img: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) sample array -> (h, stride) scanline payload bytes
    (the inverse of :func:`_bytes_to_samples`)."""
    h, w, ch = img.shape
    if depth == 16:
        a = np.ascontiguousarray(img.reshape(h, w * ch).astype(">u2"))
        return a.view(np.uint8).reshape(h, w * ch * 2)
    if depth == 8:
        return img.reshape(h, w * ch).astype(np.uint8)
    flat = img.reshape(h, w).astype(np.uint8)
    bits = np.unpackbits(flat[..., None], axis=2)[:, :, 8 - depth:]
    stride = _png_stride(w, ch, depth)
    padded = np.zeros((h, stride * 8), dtype=np.uint8)
    padded[:, : w * depth] = bits.reshape(h, w * depth)
    return np.packbits(padded, axis=1)


def _filter_bytes(rows: np.ndarray, bpp: int, filter_type: int) -> np.ndarray:
    """Forward-filter (n, stride) scanline bytes -> (n, 1+stride) wire
    scanlines.  Forward filtering is closed-form over the ORIGINAL
    bytes (fully vectorized), which is what makes every decoder
    reconstruction path exercisable."""
    n, stride = rows.shape
    flat = rows.astype(np.int32)
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    up_left = np.zeros_like(flat)
    up_left[1:, bpp:] = flat[:-1, :-bpp]
    if filter_type == 0:
        filtered = flat
    elif filter_type == 1:
        filtered = flat - left
    elif filter_type == 2:
        filtered = flat - up
    elif filter_type == 3:
        filtered = flat - ((left + up) >> 1)
    else:
        p = left + up - up_left
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, up_left))
        filtered = flat - pred
    return np.concatenate(
        [np.full((n, 1), filter_type, dtype=np.uint8),
         (filtered & 0xFF).astype(np.uint8)], axis=1)


def _png_scanlines(img: np.ndarray, depth: int, filter_type: int,
                   interlace: bool) -> bytes:
    """Sample array -> the full (possibly Adam7-split) filtered
    scanline byte stream that gets deflated into IDAT.  Each Adam7 pass
    is an independent mini-image: its own filter bytes, its own
    prev-row state."""
    h, w, ch = img.shape
    bpp = _png_bpp(ch, depth)
    if not interlace:
        return _filter_bytes(_samples_to_bytes(img, depth), bpp,
                             filter_type).tobytes()
    parts = []
    for xs, ys, xstep, ystep, _wp, _hp in _adam7_passes(w, h):
        sub = np.ascontiguousarray(img[ys::ystep, xs::xstep])
        parts.append(_filter_bytes(_samples_to_bytes(sub, depth), bpp,
                                   filter_type).tobytes())
    return b"".join(parts)


def decode_png(data: bytes) -> np.ndarray:
    """PNG → (h, w, channels) sample array — the full static-image spec
    surface (r12; the r11 palette lift covered color type 3 at depth 8):

    * color types 0 (gray), 2 (RGB), 3 (palette — expanded through PLTE
      to RGB, or to RGBA when a tRNS chunk supplies per-entry alpha),
      4 (gray+alpha), 6 (RGBA);
    * every legal bit depth per type (1/2/4/8/16 gray, 1/2/4/8 palette,
      8/16 for the multi-channel types).  Depth 16 returns uint16
      samples; sub-byte gray scales to 8-bit by bit replication
      (0..2^d-1 → 0..255, spec §12.5); everything else returns uint8;
    * both interlace methods: none and Adam7 (each of the 7 passes is
      an independently-filtered mini-image scattered back on the
      (x_start + x_step·i, y_start + y_step·j) grid).

    Only MP3 / H.264 remain behind the PIL/ffmpeg
    extension point in ``operators.multimodal`` — nothing in the PNG
    spec's static surface does.

    Throughput (measured, 512x512 RGB): filters None/Sub/Up decode
    vectorized in 1-4 ms; Average/Paeth carry a strict left-neighbor
    recurrence with no closed form, so their rows reconstruct in a
    per-byte Python loop (~0.3-0.5 s) — fine for test assets and metadata
    probes, but a 100 TB corpus of libpng-encoded images (adaptive
    per-row filters, mostly Paeth) should swap PIL in at the
    ``operators.multimodal`` extension point; the Arrow batch shape is
    identical."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    ihdr: bytes | None = None
    plte: bytes | None = None
    trns: bytes | None = None
    idat: list[bytes] = []
    pos = 8
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos:pos + 4], "big")
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = chunk
        elif ctype == b"PLTE":
            plte = chunk
        elif ctype == b"tRNS":
            trns = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG IHDR missing or malformed")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if depth not in _PNG_DEPTHS[color_type]:
        raise ValueError(
            f"illegal PNG depth {depth} for color type {color_type}")
    if color_type == 3:
        if plte is None or len(plte) == 0 or len(plte) % 3 != 0:
            raise ValueError("palette PNG without a valid PLTE chunk")
    elif plte is not None and color_type in (0, 4):
        raise ValueError(f"PLTE chunk forbidden for color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if w == 0 or h == 0 or not idat:
        raise ValueError("empty PNG")
    ch = _PNG_CHANNELS[color_type]
    bpp = _png_bpp(ch, depth)
    if w * h * ch > _PNG_MAX_SAMPLES:
        raise ValueError(
            f"PNG {w}x{h}x{ch} exceeds the in-memory decode budget")
    # Bounded inflate (job safety): the expected scanline byte count is
    # known from the header, so a zlib bomb cannot allocate past it —
    # at most one extra byte is produced, which the size checks below
    # turn into the fail-loud mismatch.
    if interlace == 0:
        expected_total = h * (1 + _png_stride(w, ch, depth))
    else:
        expected_total = sum(
            hp * (1 + _png_stride(wp, ch, depth))
            for _xs, _ys, _xt, _yt, wp, hp in _adam7_passes(w, h))
    raw = np.frombuffer(
        zlib.decompressobj().decompress(b"".join(idat), expected_total + 1),
        dtype=np.uint8)
    if interlace == 0:
        stride = _png_stride(w, ch, depth)
        if raw.size != h * (1 + stride):
            raise ValueError("PNG scanline data size mismatch")
        rows = _unfilter_bytes(raw.reshape(h, 1 + stride), bpp)
        out = _bytes_to_samples(rows, w, ch, depth)
    else:
        out = np.zeros((h, w, ch),
                       dtype=np.uint16 if depth == 16 else np.uint8)
        pos = 0
        for xs, ys, xstep, ystep, wp, hp in _adam7_passes(w, h):
            stride = _png_stride(wp, ch, depth)
            nbytes = hp * (1 + stride)
            sub = raw[pos:pos + nbytes]
            if sub.size != nbytes:
                raise ValueError("PNG scanline data size mismatch")
            pos += nbytes
            rows = _unfilter_bytes(sub.reshape(hp, 1 + stride), bpp)
            out[ys::ystep, xs::xstep] = _bytes_to_samples(rows, wp, ch, depth)
        if pos != raw.size:
            raise ValueError("PNG scanline data size mismatch")
    if color_type == 0 and depth < 8:
        out = (out.astype(np.uint16) * _PNG_GRAY_SCALE[depth]).astype(np.uint8)
    if color_type == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if pal.shape[0] > (1 << depth):
            raise ValueError(
                f"PLTE has {pal.shape[0]} entries, more than depth "
                f"{depth} can address")
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            # The spec calls an out-of-range index an error; mapping it
            # to black/modulo would be a silent wrong-pixels bug.
            raise ValueError(
                f"palette index {int(idx.max())} out of range "
                f"(palette has {pal.shape[0]} entries)"
            )
        rgb = pal[idx]  # (h, w, 3)
        if trns is None:
            return rgb.copy()
        if len(trns) > pal.shape[0]:
            raise ValueError("tRNS longer than the palette")
        alpha = np.full(pal.shape[0], 255, dtype=np.uint8)
        alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        return np.concatenate([rgb, alpha[idx][..., None]], axis=2).copy()
    return out


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def encode_png(img: np.ndarray, *, level: int = 6, filter_type: int = 0,
               interlace: bool = False) -> bytes:
    """(h, w[, channels]) uint8 or uint16 array → PNG bytes (depth 8 or
    16 inferred from the dtype; ``interlace=True`` emits Adam7).

    ``filter_type`` applies one filter to every scanline (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) — forward filtering is closed-form over the
    ORIGINAL pixels, so every decoder reconstruction path is exercisable.
    ``level=0`` emits zlib stored blocks, making the byte size a closed
    formula (the generative-oracle property the driver check hashes):
    non-interlaced 68 + h*(1 + stride) for one stored block; Adam7 sums
    the same per-pass."""
    if img.dtype == np.uint8:
        depth = 8
    elif img.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError("encode_png needs a uint8 or uint16 array")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter type {filter_type}")
    scanlines = _png_scanlines(img, depth, filter_type, interlace)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(scanlines, level))
            + _png_chunk(b"IEND", b""))


def encode_png_palette(
    indexes: np.ndarray,
    palette: np.ndarray,
    *,
    trns: np.ndarray | None = None,
    level: int = 6,
    filter_type: int = 0,
    depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """(h, w) uint8 index array + (P, 3) uint8 palette → color-type-3
    PNG bytes (optionally with a tRNS alpha chunk of up to P entries),
    at any legal palette depth (1/2/4/8 — sub-byte indexes pack
    MSB-first per spec) and either interlace mode.

    Same filter/level contract as :func:`encode_png`; at depth 8 the
    scanlines carry one index byte per pixel, so a level-0 file's size
    is the closed formula
    8 + 25 + (12+3P) [+ (12+len(trns))] + (12+11+h*(1+w)) + 12
    the generative oracles recompute (sub-byte depths replace w with
    ceil(w·depth/8))."""
    if indexes.dtype != np.uint8 or indexes.ndim != 2:
        raise ValueError("encode_png_palette needs a (h, w) uint8 index array")
    if palette.dtype != np.uint8 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("palette must be a (P, 3) uint8 array")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"illegal palette PNG depth {depth}")
    npal = palette.shape[0]
    if not 1 <= npal <= (1 << depth):
        raise ValueError(
            f"palette must have 1..{1 << depth} entries at depth {depth}, "
            f"got {npal}")
    if int(indexes.max(initial=0)) >= npal:
        raise ValueError(
            f"index {int(indexes.max())} out of range for {npal}-entry palette"
        )
    if trns is not None and (
        trns.dtype != np.uint8 or trns.ndim != 1 or len(trns) > npal
    ):
        raise ValueError("trns must be a uint8 vector of at most P entries")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter type {filter_type}")
    h, w = indexes.shape
    # Index scanlines filter exactly like 1-sample-per-pixel lanes.
    scanlines = _png_scanlines(indexes[:, :, None], depth, filter_type,
                               interlace)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0,
                       1 if interlace else 0)
    parts = [_PNG_SIG, _png_chunk(b"IHDR", ihdr),
             _png_chunk(b"PLTE", palette.tobytes())]
    if trns is not None:
        parts.append(_png_chunk(b"tRNS", trns.tobytes()))
    parts.append(_png_chunk(b"IDAT", zlib.compress(scanlines, level)))
    parts.append(_png_chunk(b"IEND", b""))
    return b"".join(parts)


def probe_png_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the PNG IHDR alone — no inflate, no
    unfiltering.  O(header) vs ``decode_png``'s O(pixels): the right
    kernel for a metadata sweep over a 100 TB corpus, where full decode
    belongs to the feature-extract stage, not the stats probe.  Validates
    the same IHDR constraints decode_png enforces (legal depth/color-type
    combination, known interlace method) so the probe and the decoder
    agree on what is supported."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    if data[12:16] != b"IHDR" or len(data) < 29:
        raise ValueError("PNG IHDR missing or malformed")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack_from(
        ">IIBBBBB", data, 16)
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if depth not in _PNG_DEPTHS[color_type]:
        raise ValueError(
            f"illegal PNG depth {depth} for color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if w == 0 or h == 0:
        raise ValueError("empty PNG")
    return int(w), int(h)


def probe_jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the JPEG SOF header alone — the entropy
    stream (the O(pixels) part) is never touched.  Walks the marker
    segments to SOF0/SOF1/SOF2 (baseline, extended sequential, AND
    progressive — all the frame types ``decode_jpeg`` accepts since
    r12), rejecting the same SOF classes the decoder rejects
    (arithmetic, hierarchical, lossless), so probe and decoder agree."""
    from spreadsheet_etl_engine_spark.functions import jpeg_codec as JC

    return JC.probe_dims(data)


def to_rgb(img: np.ndarray) -> np.ndarray:
    """(h, w, c) → (h, w, 3): gray replicates, alpha drops — the
    normalization the feature kernels use so every image yields the same
    embedding width regardless of source color type."""
    ch = img.shape[2]
    if ch == 3:
        return img
    if ch == 4:
        return img[:, :, :3]
    return np.repeat(img[:, :, :1], 3, axis=2)


def sniff(data: bytes) -> str:
    """Container detection by magic bytes: 'bmp' | 'ppm' | 'wav' | 'png' |
    'jpeg' | 'gif' | 'tiff' | 'fake' | 'unknown'.  RIFF alone is not
    enough for WAV — WebP/AVI are RIFF containers too, so the WAVE fourcc
    is required.  JPEG is SOI followed by another marker (all JFIF/EXIF/
    raw streams start FF D8 FF).  The tiff branch matches classic TIFF
    (magic 42) AND BigTIFF (magic 43) in both byte orders — tiff_codec
    decodes both, so the sniffer must route both (r12 ADVICE)."""
    head = bytes(data[:12])
    if head[:2] == b"BM":
        return "bmp"
    if head[:2] in (b"P6", b"P5", b"P4"):
        return "ppm"                     # binary netpbm family
    if head[:8] == _PNG_SIG:
        return "png"
    if head[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if head[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if head[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        return "tiff"
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return "wav"
    if head[:4] in (b"IMG:", b"AUD:", b"VID:"):
        return "fake"
    return "unknown"
