"""Pure-Python CCITT Group 4 (ITU-T T.6, MMR) codec.

G4 is how scanned-document corpora actually arrive: virtually every
fax, book-scan and records-archive TIFF uses Compression=4.  T.6 codes
each row two-dimensionally against the previous row (vertical / pass /
horizontal modes), with horizontal runs falling back to the T.4
terminating + make-up Huffman run-length tables.

Validation stance (same as the JPEG codec's documented one — no
libtiff/PIL exists in this container to cross-check): the run-length
tables are transcribed from the public ITU T.4 tables and validated at
import for prefix-freeness and completeness (a mis-transcribed code
that collides fails the import, one that merely swaps two runs is
caught by the hand-derived spec vectors in the tests: an all-white
row is a single V0 bit, known tiny images assemble from individually
known codes), and encode→decode round-trips cover the mode coder.

Bit order: T.6 bits pack MSB-first into bytes (the TIFF default
FillOrder=1); the optional EOFB terminator is emitted by the encoder
and tolerated by the decoder.
"""

from __future__ import annotations

import numpy as np

# --- T.4 run-length code tables (terminating 0-63, make-up 64-1728,
# extended make-up 1792-2560 shared by both colors).  (code, bits).

_WHITE_CODES: dict[int, tuple[int, int]] = {
    0: (0b00110101, 8), 1: (0b000111, 6), 2: (0b0111, 4), 3: (0b1000, 4),
    4: (0b1011, 4), 5: (0b1100, 4), 6: (0b1110, 4), 7: (0b1111, 4),
    8: (0b10011, 5), 9: (0b10100, 5), 10: (0b00111, 5), 11: (0b01000, 5),
    12: (0b001000, 6), 13: (0b000011, 6), 14: (0b110100, 6),
    15: (0b110101, 6), 16: (0b101010, 6), 17: (0b101011, 6),
    18: (0b0100111, 7), 19: (0b0001100, 7), 20: (0b0001000, 7),
    21: (0b0010111, 7), 22: (0b0000011, 7), 23: (0b0000100, 7),
    24: (0b0101000, 7), 25: (0b0101011, 7), 26: (0b0010011, 7),
    27: (0b0100100, 7), 28: (0b0011000, 7), 29: (0b00000010, 8),
    30: (0b00000011, 8), 31: (0b00011010, 8), 32: (0b00011011, 8),
    33: (0b00010010, 8), 34: (0b00010011, 8), 35: (0b00010100, 8),
    36: (0b00010101, 8), 37: (0b00010110, 8), 38: (0b00010111, 8),
    39: (0b00101000, 8), 40: (0b00101001, 8), 41: (0b00101010, 8),
    42: (0b00101011, 8), 43: (0b00101100, 8), 44: (0b00101101, 8),
    45: (0b00000100, 8), 46: (0b00000101, 8), 47: (0b00001010, 8),
    48: (0b00001011, 8), 49: (0b01010010, 8), 50: (0b01010011, 8),
    51: (0b01010100, 8), 52: (0b01010101, 8), 53: (0b00100100, 8),
    54: (0b00100101, 8), 55: (0b01011000, 8), 56: (0b01011001, 8),
    57: (0b01011010, 8), 58: (0b01011011, 8), 59: (0b01001010, 8),
    60: (0b01001011, 8), 61: (0b00110010, 8), 62: (0b00110011, 8),
    63: (0b00110100, 8),
    64: (0b11011, 5), 128: (0b10010, 5), 192: (0b010111, 6),
    256: (0b0110111, 7), 320: (0b00110110, 8), 384: (0b00110111, 8),
    448: (0b01100100, 8), 512: (0b01100101, 8), 576: (0b01101000, 8),
    640: (0b01100111, 8), 704: (0b011001100, 9), 768: (0b011001101, 9),
    832: (0b011010010, 9), 896: (0b011010011, 9), 960: (0b011010100, 9),
    1024: (0b011010101, 9), 1088: (0b011010110, 9), 1152: (0b011010111, 9),
    1216: (0b011011000, 9), 1280: (0b011011001, 9), 1344: (0b011011010, 9),
    1408: (0b011011011, 9), 1472: (0b010011000, 9), 1536: (0b010011001, 9),
    1600: (0b010011010, 9), 1664: (0b011000, 6), 1728: (0b010011011, 9),
}

_BLACK_CODES: dict[int, tuple[int, int]] = {
    0: (0b0000110111, 10), 1: (0b010, 3), 2: (0b11, 2), 3: (0b10, 2),
    4: (0b011, 3), 5: (0b0011, 4), 6: (0b0010, 4), 7: (0b00011, 5),
    8: (0b000101, 6), 9: (0b000100, 6), 10: (0b0000100, 7),
    11: (0b0000101, 7), 12: (0b0000111, 7), 13: (0b00000100, 8),
    14: (0b00000111, 8), 15: (0b000011000, 9), 16: (0b0000010111, 10),
    17: (0b0000011000, 10), 18: (0b0000001000, 10),
    19: (0b00001100111, 11), 20: (0b00001101000, 11),
    21: (0b00001101100, 11), 22: (0b00000110111, 11),
    23: (0b00000101000, 11), 24: (0b00000010111, 11),
    25: (0b00000011000, 11), 26: (0b000011001010, 12),
    27: (0b000011001011, 12), 28: (0b000011001100, 12),
    29: (0b000011001101, 12), 30: (0b000001101000, 12),
    31: (0b000001101001, 12), 32: (0b000001101010, 12),
    33: (0b000001101011, 12), 34: (0b000011010010, 12),
    35: (0b000011010011, 12), 36: (0b000011010100, 12),
    37: (0b000011010101, 12), 38: (0b000011010110, 12),
    39: (0b000011010111, 12), 40: (0b000001101100, 12),
    41: (0b000001101101, 12), 42: (0b000011011010, 12),
    43: (0b000011011011, 12), 44: (0b000001010100, 12),
    45: (0b000001010101, 12), 46: (0b000001010110, 12),
    47: (0b000001010111, 12), 48: (0b000001100100, 12),
    49: (0b000001100101, 12), 50: (0b000001010010, 12),
    51: (0b000001010011, 12), 52: (0b000000100100, 12),
    53: (0b000000110111, 12), 54: (0b000000111000, 12),
    55: (0b000000100111, 12), 56: (0b000000101000, 12),
    57: (0b000001011000, 12), 58: (0b000001011001, 12),
    59: (0b000000101011, 12), 60: (0b000000101100, 12),
    61: (0b000001011010, 12), 62: (0b000001100110, 12),
    63: (0b000001100111, 12),
    64: (0b0000001111, 10), 128: (0b000011001000, 12),
    192: (0b000011001001, 12), 256: (0b000001011011, 12),
    320: (0b000000110011, 12), 384: (0b000000110100, 12),
    448: (0b000000110101, 12), 512: (0b0000001101100, 13),
    576: (0b0000001101101, 13), 640: (0b0000001001010, 13),
    704: (0b0000001001011, 13), 768: (0b0000001001100, 13),
    832: (0b0000001001101, 13), 896: (0b0000001110010, 13),
    960: (0b0000001110011, 13), 1024: (0b0000001110100, 13),
    1088: (0b0000001110101, 13), 1152: (0b0000001110110, 13),
    1216: (0b0000001110111, 13), 1280: (0b0000001010010, 13),
    1344: (0b0000001010011, 13), 1408: (0b0000001010100, 13),
    1472: (0b0000001010101, 13), 1536: (0b0000001011010, 13),
    1600: (0b0000001011011, 13), 1664: (0b0000001100100, 13),
    1728: (0b0000001100101, 13),
}

_EXT_MAKEUP: dict[int, tuple[int, int]] = {
    1792: (0b00000001000, 11), 1856: (0b00000001100, 11),
    1920: (0b00000001101, 11), 1984: (0b000000010010, 12),
    2048: (0b000000010011, 12), 2112: (0b000000010100, 12),
    2176: (0b000000010101, 12), 2240: (0b000000010110, 12),
    2304: (0b000000010111, 12), 2368: (0b000000011100, 12),
    2432: (0b000000011101, 12), 2496: (0b000000011110, 12),
    2560: (0b000000011111, 12),
}

# T.6 two-dimensional mode codes.
_MODE_V0 = (0b1, 1)
_MODE_VR = {1: (0b011, 3), 2: (0b000011, 6), 3: (0b0000011, 7)}
_MODE_VL = {1: (0b010, 3), 2: (0b000010, 6), 3: (0b0000010, 7)}
_MODE_H = (0b001, 3)
_MODE_PASS = (0b0001, 4)
_EOL = (0b000000000001, 12)


def _decode_table(codes: dict[int, tuple[int, int]]) -> dict[tuple[int, int], int]:
    """(length, code) -> run, with an import-time prefix-freeness check:
    transcription slips that collide fail loudly here."""
    table: dict[tuple[int, int], int] = {}
    for run, (code, length) in codes.items():
        key = (length, code)
        if key in table:
            raise ValueError(f"duplicate CCITT code for runs "
                             f"{table[key]} and {run}")
        table[key] = run
    # Prefix check: no code may be a prefix of another.
    items = sorted(table, key=lambda k: k[0])
    for i, (l1, c1) in enumerate(items):
        for l2, c2 in items[i + 1:]:
            if l2 > l1 and (c2 >> (l2 - l1)) == c1:
                raise ValueError(
                    f"CCITT code {c1:0{l1}b} is a prefix of {c2:0{l2}b}")
    return table


_WHITE_DEC = _decode_table({**_WHITE_CODES, **_EXT_MAKEUP})
_BLACK_DEC = _decode_table({**_BLACK_CODES, **_EXT_MAKEUP})
# Mode codes must be prefix-free among themselves + the EOL.
_decode_table({i: v for i, v in enumerate(
    [_MODE_V0, _MODE_VR[1], _MODE_VR[2], _MODE_VR[3], _MODE_VL[1],
     _MODE_VL[2], _MODE_VL[3], _MODE_H, _MODE_PASS, _EOL])})


class _Bits:
    """MSB-first bit reader (TIFF FillOrder=1)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0          # bit position

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated CCITT G4 stream")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def exhausted(self) -> bool:
        return (self.pos >> 3) >= len(self.data)


def _read_run(bits: _Bits, table: dict[tuple[int, int], int]) -> int:
    """One complete run length: make-up codes accumulate until a
    terminating (<64) code arrives, per T.4."""
    total = 0
    while True:
        code = 0
        length = 0
        run = None
        while length < 14:
            code = (code << 1) | bits.read(1)
            length += 1
            run = table.get((length, code))
            if run is not None:
                break
        if run is None:
            raise ValueError("invalid CCITT run-length code")
        total += run
        if run < 64:
            return total


def _read_mode(bits: _Bits) -> tuple[str, int]:
    """One 2D mode code: ('v', delta) | ('h', 0) | ('p', 0) |
    ('eol', 0)."""
    if bits.read(1):
        return "v", 0                            # V0 = '1'
    if bits.read(1):                             # '01?'
        return ("v", 1) if bits.read(1) else ("v", -1)
    if bits.read(1):                             # '001'
        return "h", 0
    if bits.read(1):                             # '0001'
        return "p", 0
    # '0000...' — longer verticals or EOL
    if bits.read(1):                             # '00001?'
        return ("v", 2) if bits.read(1) else ("v", -2)
    if bits.read(1):                             # '000001?'
        return ("v", 3) if bits.read(1) else ("v", -3)
    # '0000000...' — only EOL (000000000001) is legal from here.
    for _ in range(4):
        if bits.read(1):
            raise ValueError("invalid CCITT G4 mode code")
    if not bits.read(1):
        raise ValueError("invalid CCITT G4 mode code")
    return "eol", 0


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where the color changes, starting from an implicit
    white state; a trailing sentinel pair at width simplifies b1/b2."""
    w = row.shape[0]
    diff = np.flatnonzero(row[1:] != row[:-1]) + 1
    trans = ([0] if row[0] else []) + diff.tolist()
    return trans


def _b1_b2(trans: list[int], a0: int, color: int, width: int) -> tuple[int, int]:
    """b1: first changing element of the REFERENCE row right of a0 whose
    new color is opposite to the coding color; b2: the next one."""
    # Transition i flips the reference to black when i is even (rows
    # start white), to white when odd.  We need a flip TO the opposite
    # of `color`, i.e. index parity == color.
    import bisect
    j = bisect.bisect_right(trans, a0)
    if (j & 1) != color:
        j += 1
    b1 = trans[j] if j < len(trans) else width
    b2 = trans[j + 1] if j + 1 < len(trans) else width
    return b1, b2


def _decode_2d_row(bits: _Bits, ref_trans: list[int], row: np.ndarray,
                   width: int) -> None:
    """One 2D-coded row (the T.6 mode loop, shared verbatim by G4 and
    by G3 two-dimensional lines — T.4 §4.2 uses the identical modes):
    decodes into ``row`` against the reference row's transitions."""
    a0 = -1
    color = 0
    while a0 < width:
        b1, b2 = _b1_b2(ref_trans, a0, color, width)
        mode, delta = _read_mode(bits)
        if mode == "eol":
            raise ValueError("unexpected EOL inside a CCITT 2D-coded row")
        if mode == "p":
            if color:
                row[max(a0, 0):b2] = 1
            a0 = b2
            continue
        if mode == "v":
            a1 = b1 + delta
            # a1 > a0 also guarantees per-mode progress: a corrupt
            # stream repeating a zero-advance mode would otherwise
            # spin forever.  (a0 = -1, a1 = 0 passes: 0 > -1.)
            if a1 < 0 or a1 > width or a1 <= a0:
                raise ValueError("CCITT vertical mode out of range")
            if color:
                row[max(a0, 0):a1] = 1
            a0 = a1
            color ^= 1
            continue
        # Horizontal: two explicit runs from a0 (start-of-row a0=-1
        # counts as 0).
        start = max(a0, 0)
        r1 = _read_run(bits, _BLACK_DEC if color else _WHITE_DEC)
        r2 = _read_run(bits, _WHITE_DEC if color else _BLACK_DEC)
        a1 = start + r1
        a2 = a1 + r2
        if a2 > width:
            raise ValueError("CCITT horizontal runs overflow the row")
        if a2 <= a0:
            raise ValueError("CCITT horizontal mode does not advance")
        if color:
            row[start:a1] = 1
        else:
            row[a1:a2] = 1
        a0 = a2


def g4_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 stream -> (height, width) uint8 bitmap, 1 = black."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT G4 needs positive dimensions")
    bits = _Bits(bytes(data))
    out = np.zeros((height, width), dtype=np.uint8)
    ref_trans: list[int] = []                   # imaginary all-white row
    for y in range(height):
        _decode_2d_row(bits, ref_trans, out[y], width)
        # The next row's reference is THIS row's actual transitions —
        # recomputed from the pixels, which is immune to mode-level
        # bookkeeping drift (pass mode contributes no transition).
        ref_trans = _transitions(out[y])
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _write_run(w: _BitWriter, run: int, color: int) -> None:
    codes = _BLACK_CODES if color else _WHITE_CODES
    while run >= 64:
        if run >= 2624:
            makeup = 2560
        elif run > 1728:
            makeup = (run // 64) * 64
        else:
            makeup = (run // 64) * 64
        code, length = (_EXT_MAKEUP[makeup] if makeup > 1728
                        else codes[makeup])
        w.write(code, length)
        run -= makeup
    code, length = codes[run]
    w.write(code, length)


def _encode_2d_row(w: _BitWriter, ref_trans: list[int],
                   cur_trans: list[int], width: int) -> None:
    """One 2D-coded row (shared by G4 and G3 two-dimensional lines)."""
    a0 = -1
    color = 0
    ti = 0                                       # index into cur_trans
    while a0 < width:
        b1, b2 = _b1_b2(ref_trans, a0, color, width)
        a1 = cur_trans[ti] if ti < len(cur_trans) else width
        if b2 < a1:
            w.write(*_MODE_PASS)
            a0 = b2
            continue
        if abs(a1 - b1) <= 3:
            d = a1 - b1
            if d == 0:
                w.write(*_MODE_V0)
            elif d > 0:
                w.write(*_MODE_VR[d])
            else:
                w.write(*_MODE_VL[-d])
            a0 = a1
            color ^= 1
            ti += 1
            continue
        a2 = cur_trans[ti + 1] if ti + 1 < len(cur_trans) else width
        start = max(a0, 0)
        w.write(*_MODE_H)
        _write_run(w, a1 - start, color)
        _write_run(w, a2 - a1, color ^ 1)
        a0 = a2
        ti += 2


def g4_encode(bitmap: np.ndarray) -> bytes:
    """(h, w) bitmap (nonzero = black) -> T.6 bytes, EOFB-terminated."""
    if bitmap.ndim != 2 or bitmap.shape[0] == 0 or bitmap.shape[1] == 0:
        raise ValueError("g4_encode needs a non-empty (h, w) bitmap")
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    h, width = bm.shape
    w = _BitWriter()
    ref_trans: list[int] = []
    for y in range(h):
        cur_trans = _transitions(bm[y])
        _encode_2d_row(w, ref_trans, cur_trans, width)
        ref_trans = cur_trans
    w.write(*_EOL)
    w.write(*_EOL)                               # EOFB
    return w.flush()


def mh_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """CCITT Modified Huffman (TIFF Compression=2, 'CCITT RLE'):
    each row is an independent 1D sequence of alternating white/black
    T.4 run codes, starting white, BYTE-ALIGNED at the start of every
    row — the G4-superseded but still-common legacy fax coding.
    Returns (height, width) uint8, 1 = black."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT MH needs positive dimensions")
    bits = _Bits(bytes(data))
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        bits.pos = (bits.pos + 7) & ~7           # row starts byte-aligned
        _decode_1d_line(bits, out[y], width)
    return out


def _read_eol(bits: _Bits) -> None:
    """Consume one T.4 EOL (eleven-plus zeros then a one).  Fill bits
    are zeros INSERTED BEFORE the EOL (T4Options bit 2), so scanning
    zeros-until-one accepts any fill; a one arriving before eleven
    zeros is a framing error.  The fill cap covers real minimum-scan-
    time padding (r13 ADVICE): T.4's longest standard MSLT is 40 ms,
    which at 14400 bit/s is 576 fill bits — 4096 leaves generous
    margin for nonstandard senders while still bounding a corrupt
    all-zero stream."""
    zeros = 0
    while True:
        if bits.read(1):
            if zeros >= 11:
                return
            raise ValueError("invalid CCITT G3 EOL framing")
        zeros += 1
        if zeros > 4096 + 11:
            raise ValueError("runaway zero fill before CCITT G3 EOL")


def _read_eol_or_first_line(bits: _Bits) -> None:
    """First-line EOL with the libtiff leniency (r13 ADVICE): many
    real-world Compression=3 writers omit the EOL before the FIRST
    line of a strip (T.4 frames lines on a wire; a TIFF strip already
    knows where it starts).  If the stream opens with a valid EOL,
    consume it; otherwise rewind and let the line decode directly.
    Later lines keep the strict framing — mid-stream resync leniency
    would mask genuine corruption."""
    mark = bits.pos
    try:
        _read_eol(bits)
    except ValueError:
        bits.pos = mark


def _decode_1d_line(bits: _Bits, row: np.ndarray, width: int) -> None:
    """One T.4 one-dimensional line: alternating white/black run codes
    starting white, decoded into ``row`` (shared by MH, G3 1D, and the
    1D-tagged lines of G3 2D)."""
    x = 0
    color = 0
    while x < width:
        run = _read_run(bits, _BLACK_DEC if color else _WHITE_DEC)
        if x + run > width:
            raise ValueError("CCITT 1D run overflows the row")
        if color:
            row[x:x + run] = 1
        x += run
        color ^= 1


def _encode_1d_line(w: _BitWriter, trans: list[int], width: int) -> None:
    """One T.4 one-dimensional line from a row's transition list."""
    x = 0
    color = 0
    for t in trans + [width]:
        _write_run(w, t - x, color)
        x = t
        color ^= 1
    if x < width:
        _write_run(w, width - x, color)


def g3_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """CCITT Group 3 one-dimensional with EOLs (TIFF Compression=3,
    T4Options 2D bit clear) — the classic fax framing: every line is
    PRECEDED by an EOL code (000000000001), optionally with zero fill
    bits before it (T4Options bit 2 byte-alignment — accepted
    transparently), and the line itself is the same alternating T.4
    run sequence as Modified Huffman.  The EOL framing is what lets a
    real fax receiver resynchronize after line noise; in a TIFF strip
    it is pure structure, decoded strictly.  Returns (height, width)
    uint8, 1 = black."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT G3 needs positive dimensions")
    bits = _Bits(bytes(data))
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        if y == 0:
            _read_eol_or_first_line(bits)
        else:
            _read_eol(bits)
        _decode_1d_line(bits, out[y], width)
    return out


def g3_encode(bitmap: np.ndarray, *, eol_align: bool = False) -> bytes:
    """(h, w) bitmap (nonzero = black) -> Compression=3 1D bytes: each
    line EOL-prefixed then coded as alternating T.4 runs starting
    white (a black-first row opens with a zero-length white run).
    ``eol_align=True`` inserts zero fill before each EOL so the EOL's
    trailing one-bit lands on a byte boundary (T4Options bit 2 — the
    layout some fax archives require).  No RTC trailer: TIFF strips
    carry their row count in the IFD, per the spec's note."""
    if bitmap.ndim != 2 or bitmap.shape[0] == 0 or bitmap.shape[1] == 0:
        raise ValueError("g3_encode needs a non-empty (h, w) bitmap")
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    w = _BitWriter()
    for y in range(bm.shape[0]):
        if eol_align:
            # Zero fill so the EOL's final one-bit lands on a byte
            # boundary; the absolute bit position is the writer's own
            # state, so the fill stays exact whatever the previous
            # line's run codes emitted.
            fill = (-(len(w.buf) * 8 + w.n + 12)) % 8
            if fill:
                w.write(0, fill)
        w.write(*_EOL)
        _encode_1d_line(w, _transitions(bm[y]), bm.shape[1])
    return w.flush()


def g3_2d_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """CCITT Group 3 TWO-dimensional (TIFF Compression=3 with
    T4Options bit 0 set — T.4 §4.2): every line is EOL-framed like 1D
    G3, but the EOL carries a tag bit — 1 means the line is coded
    one-dimensionally (the periodic resync lines, every K-th in a real
    fax), 0 means two-dimensionally with the SAME mode set as G4
    against the previous line.  Returns (height, width) uint8,
    1 = black."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT G3 needs positive dimensions")
    bits = _Bits(bytes(data))
    out = np.zeros((height, width), dtype=np.uint8)
    ref_trans: list[int] = []
    for y in range(height):
        if y == 0:
            # First-line leniency (r13 ADVICE): with the EOL omitted
            # there is no tag bit either — T.4 requires the first line
            # to be 1D-coded, so decode it as such directly.
            mark = bits.pos
            try:
                _read_eol(bits)
            except ValueError:
                bits.pos = mark
                _decode_1d_line(bits, out[y], width)
                ref_trans = _transitions(out[y])
                continue
        else:
            _read_eol(bits)
        if bits.read(1):                         # tag 1: 1D line
            _decode_1d_line(bits, out[y], width)
        else:                                    # tag 0: 2D line
            if y == 0:
                # A first line with no reference would decode against
                # the imaginary all-white row — T.4 requires the first
                # line after a page start to be 1D-coded.
                raise ValueError(
                    "CCITT G3 2D page must start with a 1D-coded line")
            _decode_2d_row(bits, ref_trans, out[y], width)
        ref_trans = _transitions(out[y])
    return out


def g3_2d_encode(bitmap: np.ndarray, *, k: int = 4,
                 eol_align: bool = False) -> bytes:
    """(h, w) bitmap (nonzero = black) -> Compression=3 2D bytes
    (T4Options bit 0): each line EOL-framed with the 1D/2D tag bit;
    every ``k``-th line (and the first) is coded one-dimensionally —
    the T.4 resync discipline (k <= 4 twice the vertical resolution's
    2 in real fax; here it just bounds error propagation) — and the
    rest two-dimensionally against the previous line, G4 modes."""
    if bitmap.ndim != 2 or bitmap.shape[0] == 0 or bitmap.shape[1] == 0:
        raise ValueError("g3_2d_encode needs a non-empty (h, w) bitmap")
    if k < 1:
        raise ValueError("k must be at least 1")
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    h, width = bm.shape
    w = _BitWriter()
    ref_trans: list[int] = []
    for y in range(h):
        if eol_align:
            fill = (-(len(w.buf) * 8 + w.n + 12)) % 8
            if fill:
                w.write(0, fill)
        w.write(*_EOL)
        cur_trans = _transitions(bm[y])
        if y % k == 0:
            w.write(1, 1)                        # tag: 1D line
            _encode_1d_line(w, cur_trans, width)
        else:
            w.write(0, 1)                        # tag: 2D line
            _encode_2d_row(w, ref_trans, cur_trans, width)
        ref_trans = cur_trans
    return w.flush()


def mh_encode(bitmap: np.ndarray) -> bytes:
    """(h, w) bitmap (nonzero = black) -> Compression=2 bytes (rows
    byte-aligned, alternating run codes starting white — a row that
    starts black opens with a zero-length white run, per T.4)."""
    if bitmap.ndim != 2 or bitmap.shape[0] == 0 or bitmap.shape[1] == 0:
        raise ValueError("mh_encode needs a non-empty (h, w) bitmap")
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    out = bytearray()
    for y in range(bm.shape[0]):
        w = _BitWriter()
        _encode_1d_line(w, _transitions(bm[y]), bm.shape[1])
        out += w.flush()                         # per-row byte alignment
    return bytes(out)
