"""Pure-Python/numpy GIF codec (GIF87a/GIF89a, LZW).

Makes the VIDEO kind of the multimodal pipeline real: animated GIF is
the one moving-picture container expressible without ffmpeg, and it is
genuinely common in web-scraped training corpora.

* **decode_gif** — logical screen descriptor, global + per-frame local
  color tables, interlaced row order, GIF89a graphic-control extensions
  (transparency index, frame delays, disposal methods 0-3 including
  restore-to-background and restore-to-previous), full LZW decompression
  (LSB-first code packing, growing code widths, 12-bit cap, clear/EOI
  codes, the cScSc self-reference case).  Frames composite onto the
  logical screen exactly as a viewer would, yielding
  ``(n_frames, h, w, 3)`` uint8 RGB.
* **encode_gif** — index frames + palette -> GIF89a bytes with real LZW
  compression (dictionary rebuild on clear, 12-bit cap), optional
  per-frame delays, transparency, and interlacing, so every decoder
  path is round-trip testable.
* **probe_gif_dims / count_gif_frames** — O(header) dims; frame counts
  walk the block structure (skipping data sub-blocks by their length
  bytes) without ever running LZW — the metadata-sweep kernel.

Scope: everything in the GIF89a spec except sorting flags/aspect ratio
(ignored, per spec they are hints) and plain-text extensions (skipped
as unknown extensions, per spec).  Decode is total over corrupt input:
malformed streams raise ``ValueError`` (normalized by the callers in
``operators.multimodal``).

Reference semantics (public spec): GIF89a specification (CompuServe,
1990) and the interlace/disposal behavior every major viewer
implements.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

#: In-memory decode budgets (job safety, not a format limit): a corrupt
#: 30-byte header can claim a 65535x65535 canvas — 12.9 GB of RGB —
#: and the resulting MemoryError is NOT in the totality contract's
#: catchable set, so it would kill the executor.  Oversized-but-legal
#: files route through the PIL/ffmpeg extension point like every other
#: gated variant; these raise ValueError by name instead of allocating.
_MAX_CANVAS_PIXELS = 1 << 26        # ~200 MB as one RGB canvas
_MAX_TOTAL_PIXELS = 1 << 28         # all frames stacked, ~800 MB RGB


# --- LZW ---------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first packed codes, initial width
    ``min_code_size + 1``, dictionary grows to a 12-bit cap, CLEAR
    resets.  Returns exactly ``n_pixels`` indexes (extra trailing codes
    are ignored, shortfall raises)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"invalid GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # Bit reader state (LSB-first within each byte).
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1

    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None

    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW code before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]          # the cScSc case
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        if len(table) == (1 << width) and width < 12:
            width += 1
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF LZW stream ended before the frame filled")
    return out


def _lzw_encode(min_code_size: int, indexes: np.ndarray) -> bytes:
    """Standard GIF LZW encoder: emits CLEAR, builds the string table to
    the 12-bit cap, re-clears on overflow, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    prev = b""
    for b in bytes(indexes.astype(np.uint8).tobytes()):
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # Width grows when the NEXT code to assign no longer fits the
        # current width (decoder mirrors this on table length).
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos:pos + n]
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block")
        pos += n


def _skip_sub_blocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: stored row order -> display row order."""
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _GIF_INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    """Display row order -> GIF interlaced storage order."""
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _GIF_INTERLACE_PASSES])
    return rows[order]


# --- container ---------------------------------------------------------------


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (n_frames, h, w, 3) uint8 RGB, frames composited
    onto the logical screen with transparency and disposal applied."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if w == 0 or h == 0:
        raise ValueError("empty GIF")
    if w * h > _MAX_CANVAS_PIXELS:
        raise ValueError(
            f"GIF logical screen {w}x{h} exceeds the in-memory decode "
            "budget")
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_pal = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                                   offset=pos).reshape(n, 3)
        pos += 3 * n

    if global_pal is not None and bg_idx < global_pal.shape[0]:
        background = global_pal[bg_idx]
    else:
        background = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(background, (h, w, 3)).copy()

    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    prev_canvas: np.ndarray | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                    # trailer
            break
        if block == 0x21:                    # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:                # graphic control
                gce, pos = _read_sub_blocks(data, pos)
                if len(gce) < 4:
                    raise ValueError("malformed GIF graphic control")
                packed = gce[0]
                disposal = (packed >> 2) & 7
                transparent = gce[3] if packed & 1 else None
            else:                            # app/comment/plain text: skip
                _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        left, top, fw, fh, fflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise ValueError("GIF frame outside the logical screen")
        pal = global_pal
        if fflags & 0x80:
            n = 2 << (fflags & 7)
            pal = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame with no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(min_code, lzw, fw * fh).reshape(fh, fw)
        if fflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF pixel index outside the color table")

        if disposal == 3:
            prev_canvas = canvas.copy()
        region = canvas[top:top + fh, left:left + fw]
        rgb = pal[idx]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[...] = rgb
        if (len(frames) + 1) * w * h > _MAX_TOTAL_PIXELS:
            raise ValueError(
                "GIF animation exceeds the in-memory frame budget")
        frames.append(canvas.copy())
        if disposal == 2:                    # restore to background
            canvas[top:top + fh, left:left + fw] = background
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames)


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    *,
    delays_cs: list[int] | None = None,
    transparent: int | None = None,
    interlace: bool = False,
) -> bytes:
    """(n, h, w) uint8 index frames + (P, 3) uint8 palette -> GIF89a
    bytes (full-frame images on a global color table, real LZW).
    ``delays_cs`` are per-frame delays in centiseconds (emitted in a
    graphic-control extension, as is ``transparent``)."""
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("encode_gif needs (n, h, w) uint8 index frames")
    if palette.dtype != np.uint8 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("palette must be a (P, 3) uint8 array")
    npal = palette.shape[0]
    if not 2 <= npal <= 256:
        raise ValueError(f"palette must have 2..256 entries, got {npal}")
    if int(frames.max(initial=0)) >= npal:
        raise ValueError(
            f"index {int(frames.max())} out of range for {npal}-entry palette")
    if transparent is not None and not 0 <= transparent < npal:
        raise ValueError("transparent index outside the palette")
    n, h, w = frames.shape
    if n == 0 or h == 0 or w == 0:
        raise ValueError("cannot encode an empty GIF")
    if delays_cs is not None and len(delays_cs) != n:
        raise ValueError("delays_cs must have one entry per frame")

    pal_bits = max(1, (npal - 1).bit_length())
    table_size = 1 << pal_bits
    padded = np.zeros((table_size, 3), dtype=np.uint8)
    padded[:npal] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += padded.tobytes()
    min_code = max(2, pal_bits)
    for fi in range(n):
        if delays_cs is not None or transparent is not None:
            packed = 1 if transparent is not None else 0
            delay = delays_cs[fi] if delays_cs is not None else 0
            out += bytes([0x21, 0xF9, 4, packed]) + struct.pack("<H", delay)
            out += bytes([transparent if transparent is not None else 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h,
                                           0x40 if interlace else 0)
        rows = _interlace(frames[fi]) if interlace else frames[fi]
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(min_code, rows.reshape(-1)))
    out += b"\x3B"
    return bytes(out)


def probe_gif_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor — O(1)."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack_from("<HH", data, 6)
    if w == 0 or h == 0:
        raise ValueError("empty GIF")
    return int(w), int(h)


def count_gif_frames(data: bytes) -> int:
    """Number of image frames, by walking the block structure and
    skipping data sub-blocks via their length bytes — O(blocks), the
    LZW streams are never decompressed.  This is the metadata-sweep
    kernel: a 100 TB corpus counts frames without decoding pixels."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    _w, _h, flags = struct.unpack_from("<HHB", data, 6)
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    count = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos = _skip_sub_blocks(data, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        _l, _t, _fw, _fh, fflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fflags & 0x80:
            pos += 3 * (2 << (fflags & 7))
        pos = _skip_sub_blocks(data, pos + 1)   # +1: LZW min code byte
        count += 1
    if count == 0:
        raise ValueError("GIF contains no image frames")
    return count
