"""CCITTFaxDecode — Group 3/4 fax decode (and a fixture encoder) from the
public ITU-T specs (T.4 §4.1/T.6 §2, via ISO 32000-2 §7.4.6 filter
parameters). Closes the largest deterministic slice of the entropy-coded
raster gap (round-4 verdict ask #5): unlike DCT/JPX there is no
quantization, so an exact pixel oracle is possible.

Scope: ``K < 0`` (pure 2-D, Group 4 / T.6 — what PDF producers emit),
``K = 0`` (1-D MH, Group 3), and ``K > 0`` (mixed G3-2D: per-row EOL +
1-bit tag selecting 1-D or 2-D coding, T.4 §4.2.1.3.4 — needs a known
row count since there is no EOFB). Output is packed 1-bit rows, MSB-first,
each row padded to a byte boundary — exactly the sample layout
``images._unpack_rows`` expects — with bit polarity per the PDF default
(0 = black) unless ``black_is_1``.

The encoder exists for deterministic fixtures (sources/corpus pdfgen):
it emits proper adaptive G4 (vertical when |a1-b1| <= 3, pass when
b2 < a1, horizontal otherwise) so decode tests exercise every mode, and
it shares no state with the decoder beyond the public code tables.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import List, Tuple

# --- T.4 modified-Huffman run-length code tables ---------------------------
# (run_length, bit_string) — terminating codes 0..63 then makeup codes.

_WHITE_CODES: List[Tuple[int, str]] = [
    (0, "00110101"), (1, "000111"), (2, "0111"), (3, "1000"),
    (4, "1011"), (5, "1100"), (6, "1110"), (7, "1111"),
    (8, "10011"), (9, "10100"), (10, "00111"), (11, "01000"),
    (12, "001000"), (13, "000011"), (14, "110100"), (15, "110101"),
    (16, "101010"), (17, "101011"), (18, "0100111"), (19, "0001100"),
    (20, "0001000"), (21, "0010111"), (22, "0000011"), (23, "0000100"),
    (24, "0101000"), (25, "0101011"), (26, "0010011"), (27, "0100100"),
    (28, "0011000"), (29, "00000010"), (30, "00000011"), (31, "00011010"),
    (32, "00011011"), (33, "00010010"), (34, "00010011"), (35, "00010100"),
    (36, "00010101"), (37, "00010110"), (38, "00010111"), (39, "00101000"),
    (40, "00101001"), (41, "00101010"), (42, "00101011"), (43, "00101100"),
    (44, "00101101"), (45, "00000100"), (46, "00000101"), (47, "00001010"),
    (48, "00001011"), (49, "01010010"), (50, "01010011"), (51, "01010100"),
    (52, "01010101"), (53, "00100100"), (54, "00100101"), (55, "01011000"),
    (56, "01011001"), (57, "01011010"), (58, "01011011"), (59, "01001010"),
    (60, "01001011"), (61, "00110010"), (62, "00110011"), (63, "00110100"),
    # makeup
    (64, "11011"), (128, "10010"), (192, "010111"), (256, "0110111"),
    (320, "00110110"), (384, "00110111"), (448, "01100100"),
    (512, "01100101"), (576, "01101000"), (640, "01100111"),
    (704, "011001100"), (768, "011001101"), (832, "011010010"),
    (896, "011010011"), (960, "011010100"), (1024, "011010101"),
    (1088, "011010110"), (1152, "011010111"), (1216, "011011000"),
    (1280, "011011001"), (1344, "011011010"), (1408, "011011011"),
    (1472, "010011000"), (1536, "010011001"), (1600, "010011010"),
    (1664, "011000"), (1728, "010011011"),
]

_BLACK_CODES: List[Tuple[int, str]] = [
    (0, "0000110111"), (1, "010"), (2, "11"), (3, "10"),
    (4, "011"), (5, "0011"), (6, "0010"), (7, "00011"),
    (8, "000101"), (9, "000100"), (10, "0000100"), (11, "0000101"),
    (12, "0000111"), (13, "00000100"), (14, "00000111"),
    (15, "000011000"), (16, "0000010111"), (17, "0000011000"),
    (18, "0000001000"), (19, "00001100111"), (20, "00001101000"),
    (21, "00001101100"), (22, "00000110111"), (23, "00000101000"),
    (24, "00000010111"), (25, "00000011000"), (26, "000011001010"),
    (27, "000011001011"), (28, "000011001100"), (29, "000011001101"),
    (30, "000001101000"), (31, "000001101001"), (32, "000001101010"),
    (33, "000001101011"), (34, "000011010010"), (35, "000011010011"),
    (36, "000011010100"), (37, "000011010101"), (38, "000011010110"),
    (39, "000011010111"), (40, "000001101100"), (41, "000001101101"),
    (42, "000011011010"), (43, "000011011011"), (44, "000001010100"),
    (45, "000001010101"), (46, "000001010110"), (47, "000001010111"),
    (48, "000001100100"), (49, "000001100101"), (50, "000001010010"),
    (51, "000001010011"), (52, "000000100100"), (53, "000000110111"),
    (54, "000000111000"), (55, "000000100111"), (56, "000000101000"),
    (57, "000001011000"), (58, "000001011001"), (59, "000000101011"),
    (60, "000000101100"), (61, "000001011010"), (62, "000001100110"),
    (63, "000001100111"),
    # makeup
    (64, "0000001111"), (128, "000011001000"), (192, "000011001001"),
    (256, "000001011011"), (320, "000000110011"), (384, "000000110100"),
    (448, "000000110101"), (512, "0000001101100"), (576, "0000001101101"),
    (640, "0000001001010"), (704, "0000001001011"), (768, "0000001001100"),
    (832, "0000001001101"), (896, "0000001110010"), (960, "0000001110011"),
    (1024, "0000001110100"), (1088, "0000001110101"),
    (1152, "0000001110110"), (1216, "0000001110111"),
    (1280, "0000001010010"), (1344, "0000001010011"),
    (1408, "0000001010100"), (1472, "0000001010101"),
    (1536, "0000001011010"), (1600, "0000001011011"),
    (1664, "0000001100100"), (1728, "0000001100101"),
]

# extended makeup codes 1792..2560 are shared by both colours (T.4 table 3)
_EXT_CODES: List[Tuple[int, str]] = [
    (1792, "00000001000"), (1856, "00000001100"), (1920, "00000001101"),
    (1984, "000000010010"), (2048, "000000010011"), (2112, "000000010100"),
    (2176, "000000010101"), (2240, "000000010110"), (2304, "000000010111"),
    (2368, "0000000011100"), (2432, "0000000011101"),
    (2496, "0000000011110"), (2560, "0000000011111"),
]

_EOL = "000000000001"


def _decode_table(codes: List[Tuple[int, str]]) -> dict:
    """{(nbits, value): run_length} lookup for prefix-free MH codes."""
    t = {}
    for run, bits in codes:
        t[(len(bits), int(bits, 2))] = run
    return t


_WHITE_DEC = _decode_table(_WHITE_CODES + _EXT_CODES)
_BLACK_DEC = _decode_table(_BLACK_CODES + _EXT_CODES)

_WHITE_ENC = {run: bits for run, bits in _WHITE_CODES}
_BLACK_ENC = {run: bits for run, bits in _BLACK_CODES}
_EXT_ENC = {run: bits for run, bits in _EXT_CODES}


class CCITTError(ValueError):
    pass


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def peek(self, k: int) -> int:
        """Next k bits MSB-first (zero-padded past EOF)."""
        v = 0
        p = self.pos
        d = self.data
        for i in range(k):
            bp = p + i
            bit = 0
            if bp < self.n:
                bit = (d[bp >> 3] >> (7 - (bp & 7))) & 1
            v = (v << 1) | bit
        return v

    def skip(self, k: int) -> None:
        self.pos += k

    def eof(self) -> bool:
        return self.pos >= self.n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _eol_bits(br: _BitReader) -> int:
    """Bits consumed by an EOL starting at ``br.pos``, tolerating FILL:
    T.4 §4.1.2 allows variable-length runs of 0 fill bits before the
    000000000001 EOL, so any >= 11 zeros followed by a 1 is fill+EOL
    (no valid MH/MR code sequence contains 11 consecutive zeros).
    Returns 0 if the bits at ``pos`` are not a (filled) EOL."""
    p, n, d = br.pos, br.n, br.data
    zeros = 0
    while p + zeros < n and not ((d[(p + zeros) >> 3] >> (7 - ((p + zeros) & 7))) & 1):
        zeros += 1
    if zeros >= 11 and p + zeros < n:
        return zeros + 1
    return 0


def _read_run(br: _BitReader, table: dict) -> int:
    """One complete MH run: zero or more makeup codes + a terminating code."""
    total = 0
    while True:
        run = None
        for nbits in range(2, 14):
            hit = table.get((nbits, br.peek(nbits)))
            if hit is not None:
                br.skip(nbits)
                run = hit
                break
        if run is None:
            raise CCITTError(f"bad MH code at bit {br.pos}")
        total += run
        if run < 64:
            return total
        # makeup code: a terminating code must follow (possibly more
        # makeups first for runs > 2560)


def _changes_of_row(row_bits: List[int]) -> List[int]:
    """Positions where colour flips (row starts implicitly white)."""
    changes = []
    prev = 0
    for i, b in enumerate(row_bits):
        if b != prev:
            changes.append(i)
            prev = b
    return changes


def _b1_b2(ref: List[int], a0: int, color: int, columns: int) -> Tuple[int, int]:
    """First changing element in the reference line right of ``a0`` whose
    new colour is opposite to the current ``color`` (b1), and the next
    change after it (b2). ``ref`` transitions to black at even indices."""
    i = bisect_right(ref, a0)
    # parity for a transition to !color: to black (even) when color==0
    want = 0 if color == 0 else 1
    while i < len(ref) and (i & 1) != want:
        i += 1
    b1 = ref[i] if i < len(ref) else columns
    b2 = ref[i + 1] if i + 1 < len(ref) else columns
    return b1, b2


def ccittfax_decode(
    data: bytes,
    columns: int = 1728,
    rows: int = 0,
    k: int = -1,
    black_is_1: bool = False,
    encoded_byte_align: bool = False,
) -> bytes:
    """Decode a CCITTFaxDecode stream to packed 1-bit rows (MSB-first,
    byte-aligned rows). ``rows == 0`` decodes until EOFB/RTC or data end."""
    if columns <= 0:
        raise CCITTError("Columns must be positive")
    if k > 0 and not rows:
        # mixed G3-2D has no EOFB; the row count must come from
        # /Rows or the image dict Height (get_data passes it)
        raise CCITTError("K > 0 requires a known row count")
    br = _BitReader(data)
    out = bytearray()
    row_bytes = (columns + 7) // 8
    # reference line for 2-D coding: imaginary all-white line above row 0
    ref: List[int] = []
    n_rows = 0
    black_bit = 1 if black_is_1 else 0
    white_bit = black_bit ^ 1

    def emit_row(changes: List[int]) -> None:
        """Pack one row, honouring the output bit polarity (PDF default:
        0 = black, so a row starts as all-1 white and black runs clear)."""
        fill = 0xFF if white_bit else 0x00
        rowb = bytearray([fill]) * row_bytes
        # changes alternate to-black / to-white
        for ci in range(0, len(changes), 2):
            start = changes[ci]
            end = changes[ci + 1] if ci + 1 < len(changes) else columns
            for p in range(start, end):
                byte, bit = p >> 3, 7 - (p & 7)
                if black_bit:
                    rowb[byte] |= 1 << bit
                else:
                    rowb[byte] &= ~(1 << bit) & 0xFF
        out.extend(rowb)

    while True:
        if rows and n_rows >= rows:
            break
        if encoded_byte_align and k < 0:
            br.align()
        # EOL / EOFB handling: any number of EOLs may precede a row; two
        # consecutive EOLs (EOFB) end the image. For K > 0 (mixed G3-2D,
        # T.4 §4.2.1.3.4) each EOL is followed by a 1-bit tag selecting
        # the row coding: 1 = 1-D MH, 0 = 2-D.
        saw_eol = False
        tag_one_d = True  # rows without a leading EOL default to 1-D
        while (not br.eof()) and (nb := _eol_bits(br)):
            br.skip(nb)
            if k > 0:
                saw_eol = True
                if not br.eof():
                    tag_one_d = br.peek(1) == 1
                    br.skip(1)
                break  # exactly one EOL+tag per row
            if saw_eol:
                br.pos = br.n
                break
            saw_eol = True
        if br.eof():
            break
        if k == 0 and encoded_byte_align and not saw_eol:
            br.align()
        if k == 0 or (k > 0 and tag_one_d):
            # 1-D MH row: alternating white/black runs from an implicit
            # white start; a colour transition sits at every run boundary
            # inside the row
            changes = []
            pos = 0
            color = 0
            while pos < columns:
                run = _read_run(br, _WHITE_DEC if color == 0 else _BLACK_DEC)
                pos += run
                if pos < columns:
                    changes.append(pos)
                color ^= 1
            changes = _normalize(changes)
            emit_row(changes)
            ref = changes
            n_rows += 1
            continue
        # --- 2-D row (G4 / T.6; also the 2-D rows of mixed K > 0) ---
        a0 = -1
        color = 0
        changes: List[int] = []
        while a0 < columns:
            if br.eof():
                if not changes and a0 <= 0:
                    # trailing padding after last row
                    br.pos = br.n
                    a0 = columns
                    break
                raise CCITTError("unexpected EOF mid-row")
            b1, b2 = _b1_b2(ref, a0, color, columns)
            if br.peek(4) == 0b0001:  # pass
                br.skip(4)
                a0 = b2
            elif br.peek(3) == 0b001:  # horizontal
                br.skip(3)
                base = a0 if a0 > 0 else 0
                r1 = _read_run(br, _WHITE_DEC if color == 0 else _BLACK_DEC)
                r2 = _read_run(br, _BLACK_DEC if color == 0 else _WHITE_DEC)
                a1 = base + r1
                a2 = a1 + r2
                changes.append(min(a1, columns))
                changes.append(min(a2, columns))
                a0 = a2
            else:
                # vertical modes
                p7 = br.peek(7)
                if br.peek(1) == 1:
                    br.skip(1); delta = 0
                elif br.peek(3) == 0b011:
                    br.skip(3); delta = 1
                elif br.peek(3) == 0b010:
                    br.skip(3); delta = -1
                elif br.peek(6) == 0b000011:
                    br.skip(6); delta = 2
                elif br.peek(6) == 0b000010:
                    br.skip(6); delta = -2
                elif p7 == 0b0000011:
                    br.skip(7); delta = 3
                elif p7 == 0b0000010:
                    br.skip(7); delta = -3
                elif br.peek(12) == 1:  # EOL mid-stream: row done early
                    break
                else:
                    raise CCITTError(f"bad 2-D mode code at bit {br.pos}")
                a1 = b1 + delta
                changes.append(min(max(a1, 0), columns))
                a0 = a1
                color ^= 1
        if a0 >= columns and not changes and br.eof():
            break
        changes = _normalize([c for c in changes if c < columns])
        emit_row(changes)
        ref = changes
        n_rows += 1
        if rows and n_rows >= rows:
            break
        if br.eof():
            break
    if rows and n_rows < rows:
        raise CCITTError(f"decoded {n_rows} rows, expected {rows}")
    return bytes(out)


def _normalize(changes: List[int]) -> List[int]:
    """Drop zero-length runs: equal adjacent transitions cancel."""
    outc: List[int] = []
    for c in changes:
        if outc and outc[-1] == c:
            outc.pop()
        else:
            outc.append(c)
    return outc


# --- encoder (fixture generation only) -------------------------------------

def _enc_run(run: int, color: int) -> str:
    """MH encoding of one run (makeups + terminating)."""
    bits = []
    term = _WHITE_ENC if color == 0 else _BLACK_ENC
    while run >= 2624:  # 2560 makeup + up to 63 terminating
        bits.append(_EXT_ENC[2560])
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        bits.append(_EXT_ENC[mk] if mk >= 1792 else term[mk])
        run -= mk
    bits.append(term[run])
    return "".join(bits)


def _enc_2d_row(cur: List[int], ref: List[int], width: int) -> str:
    """One 2-D-coded row (T.6 / the 2-D rows of T.4 K>0). Adaptive mode
    choice so decode exercises pass/vertical/horizontal paths."""
    bits: List[str] = []
    a0 = -1
    color = 0
    while a0 < width:
        b1, b2 = _b1_b2(ref, a0, color, width)
        # a1: next change in cur after a0 (of the opposite colour —
        # by construction transitions alternate)
        i = bisect_right(cur, a0)
        want = 0 if color == 0 else 1
        while i < len(cur) and (i & 1) != want:
            i += 1
        a1 = cur[i] if i < len(cur) else width
        if b2 < a1:
            bits.append("0001")  # pass
            a0 = b2
            continue
        delta = a1 - b1
        if -3 <= delta <= 3:
            bits.append({0: "1", 1: "011", 2: "000011", 3: "0000011",
                         -1: "010", -2: "000010", -3: "0000010"}[delta])
            a0 = a1
            color ^= 1
        else:
            # horizontal: two runs from max(a0,0)
            j = i + 1
            a2 = cur[j] if j < len(cur) else width
            base = a0 if a0 > 0 else 0
            bits.append("001")
            bits.append(_enc_run(a1 - base, color))
            bits.append(_enc_run(a2 - a1, color ^ 1))
            a0 = a2
    return "".join(bits)


def _enc_1d_row(cur: List[int], width: int) -> str:
    """One 1-D MH row: alternating white/black runs from an implicit
    white start (a zero-length leading white run is valid T.4 coding
    when the row begins black)."""
    bounds = [0] + list(cur) + [width]
    color = 0
    bits: List[str] = []
    for i in range(len(bounds) - 1):
        bits.append(_enc_run(bounds[i + 1] - bounds[i], color))
        color ^= 1
    return "".join(bits)


def _row_changes(pixels, r: int, width: int) -> List[int]:
    row = [int(v) for v in pixels[r]]
    if len(row) != width:
        raise CCITTError("row width mismatch")
    return _changes_of_row(row)


def ccitt_g4_encode(
    pixels, width: int, height: int, black_is_1: bool = False
) -> bytes:
    """Encode a 2-D 0/1 matrix (list of rows or ndarray; 1 = black in the
    matrix regardless of ``black_is_1`` — polarity only affects DECODE
    output) to a Group 4 stream with EOFB."""
    bits: List[str] = []
    ref: List[int] = []
    for r in range(height):
        cur = _row_changes(pixels, r, width)
        bits.append(_enc_2d_row(cur, ref, width))
        ref = cur
    bits.append(_EOL)
    bits.append(_EOL)  # EOFB
    s = "".join(bits)
    pad = (-len(s)) % 8
    s += "0" * pad
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def ccitt_g3_encode(
    pixels, width: int, height: int, k: int = 0, fill: int = 0
) -> bytes:
    """Encode a 0/1 matrix (1 = black) as Group 3: K=0 emits EOL + 1-D MH
    per row (T.4 §4.1); K>0 emits EOL + tag bit per row, one 1-D row
    followed by up to K-1 2-D rows (T.4 §4.2.1.3.4). ``fill`` zero bits
    precede every EOL (T.4 §4.1.2 FILL — real fax streams pad this way,
    and the decoder must tolerate it)."""
    if k < 0:
        raise CCITTError("ccitt_g3_encode handles K >= 0 only")
    bits: List[str] = []
    ref: List[int] = []
    for r in range(height):
        cur = _row_changes(pixels, r, width)
        bits.append("0" * fill + _EOL)
        if k > 0:
            use_2d = (r % k) != 0  # row 0 of each K-group is 1-D
            bits.append("0" if use_2d else "1")
            bits.append(
                _enc_2d_row(cur, ref, width) if use_2d
                else _enc_1d_row(cur, width)
            )
        else:
            bits.append(_enc_1d_row(cur, width))
        ref = cur
    s = "".join(bits)
    pad = (-len(s)) % 8
    s += "0" * pad
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))
