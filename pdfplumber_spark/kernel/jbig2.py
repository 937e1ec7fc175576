"""From-scratch JBIG2 (ITU-T T.88) — MQ arithmetic coder + generic
region decoding, plus the matching encoder for test/corpus generation.

Public sources only: ITU-T T.88 (JBIG2) — Annex E software conventions
for the MQ coder (Tables E.1, flowcharts INITDEC/DECODE/BYTEIN and
INITENC/CODEMPS/CODELPS/BYTEOUT/FLUSH), §6.2 generic region decoding
(GB template 0 with nominal adaptive pixels, optional TPGDON), and
§7.2 segment headers for the embedded (PDF) stream format.

Scope and validation: template 0 / arithmetic coding only (MMR regions
and refinement/halftone/text regions are out of scope — classified
'unsupported' upstream). The reference corpus contains NO JBIG2
fixtures (surveyed round 6), so external interop cannot be exercised
offline; correctness is pinned by encoder/decoder roundtrips over
random bitmaps and contexts (the two sides are implemented from the
spec's separate encoder/decoder flowcharts) plus structural tests.
Context bit order is the spec figure's raster order (MSB = top-left),
documented on ``_context``.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

__all__ = [
    "JBIG2Error", "MQDecoder", "MQEncoder",
    "decode_generic_region", "encode_generic_region",
    "decode_embedded", "encode_embedded",
]


class JBIG2Error(Exception):
    pass


# T.88 Table E.1 — Qe values and state transitions.
# (Qe, NMPS, NLPS, SWITCH)
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQDecoder:
    """T.88 Annex E MQ arithmetic decoder (software conventions)."""

    def __init__(self, data: bytes, n_contexts: int = 1 << 16):
        self.data = data
        self.bp = 0
        self.i = [0] * n_contexts   # state index per context
        self.mps = [0] * n_contexts
        # INITDEC
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, k: int) -> int:
        return self.data[k] if k < len(self.data) else 0xFF

    def _bytein(self):
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8
        self.c &= 0xFFFFFFFF

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, switch = _QE[self.i[cx]]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path
            if self.a < qe:
                d = self.mps[cx]
                self.i[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] ^= 1
                self.i[cx] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return self.mps[cx]
            if self.a < qe:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] ^= 1
                self.i[cx] = nlps
            else:
                d = self.mps[cx]
                self.i[cx] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E MQ arithmetic encoder (software conventions)."""

    def __init__(self, n_contexts: int = 1 << 16):
        self.i = [0] * n_contexts
        self.mps = [0] * n_contexts
        # INITENC
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.b = -1  # index of the byte being built (B in the spec)

    def encode(self, cx: int, d: int):
        qe, nmps, nlps, switch = _QE[self.i[cx]]
        if d == self.mps[cx]:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe  # MPS interval sits above the Qe LPS slot
                return
            if self.a < qe:
                self.a = qe  # conditional exchange: MPS takes the slot
            else:
                self.c += qe
            self.i[cx] = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] ^= 1
            self.i[cx] = nlps
        # RENORME
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self):
        if self.b >= 0 and self.out[self.b] == 0xFF:
            # stuffing after 0xFF
            self.out.append((self.c >> 20) & 0xFF)
            self.b = len(self.out) - 1
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self.out.append((self.c >> 19) & 0xFF)
                self.b = len(self.out) - 1
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                # carry into B
                if self.b >= 0:
                    self.out[self.b] += 1
                    if self.out[self.b] == 0xFF:
                        self.c &= 0x7FFFFFF
                        self.out.append((self.c >> 20) & 0xFF)
                        self.b = len(self.out) - 1
                        self.c &= 0xFFFFF
                        self.ct = 7
                        return
                self.out.append((self.c >> 19) & 0xFF)
                self.b = len(self.out) - 1
                self.c &= 0x7FFFF
                self.ct = 8

    def flush(self) -> bytes:
        # SETBITS (T.800 C.2.9): set the low 16 bits of C to ones so the
        # decoder's 1-filled tail stays inside the final interval; back
        # off 0x8000 if that overshoots the interval top
        temp = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c > temp:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        # discard trailing 0xFF bytes (spec: optional; decoder supplies
        # 1-bits past the end)
        while self.out and self.out[-1] == 0xFF:
            self.out.pop()
        return bytes(self.out)


# -- generic region (T.88 6.2, GB template 0, nominal AT pixels) --------

# template 0 pixel offsets in raster order (MSB first); includes the
# nominal adaptive pixels A1..A4 at their default positions
# (A1=(+3,-1), A2=(-3,-1), A3=(+2,-2), A4=(-2,-2))
_TPL0 = (
    (-2, -2), (-1, -2), (0, -2), (1, -2), (2, -2),       # row y-2 (A4..A3)
    (-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), (3, -1),
    (-4, 0), (-3, 0), (-2, 0), (-1, 0),                  # row y
)
_TPGDON_CX = 0x9B25  # T.88 6.2.5.7 SLTP context for template 0


def _context(rows: List[List[int]], x: int, y: int, w: int) -> int:
    """Template-0 context: _TPL0 pixels MSB-first; out-of-bounds = 0."""
    cx = 0
    for (dx, dy) in _TPL0:
        xx, yy = x + dx, y + dy
        bit = rows[yy][xx] if 0 <= yy < len(rows) and 0 <= xx < w else 0
        cx = (cx << 1) | bit
    return cx


def decode_generic_region(data: bytes, w: int, h: int,
                          tpgdon: bool = False) -> List[List[int]]:
    """Arithmetic generic region decode -> rows of 0/1 ints."""
    if w <= 0 or h <= 0 or w * h > 50_000_000:
        raise JBIG2Error("bad region dims")
    dec = MQDecoder(data)
    rows: List[List[int]] = []
    ltp = 0
    for y in range(h):
        if tpgdon:
            if dec.decode(_TPGDON_CX):
                ltp ^= 1
            if ltp:
                rows.append(list(rows[y - 1]) if y else [0] * w)
                continue
        row = [0] * w
        rows.append(row)
        for x in range(w):
            row[x] = dec.decode(_context(rows, x, y, w))
    return rows


def encode_generic_region(rows: List[List[int]], w: int, h: int,
                          tpgdon: bool = False) -> bytes:
    """Arithmetic generic region encode (the decoder's exact inverse)."""
    enc = MQEncoder()
    ltp = 0
    prev: Optional[List[int]] = None
    for y in range(h):
        if tpgdon:
            same = prev is not None and rows[y] == prev
            flip = 1 if same != bool(ltp) else 0
            enc.encode(_TPGDON_CX, flip)
            if flip:
                ltp ^= 1
            if ltp:
                prev = rows[y]
                continue
        for x in range(w):
            enc.encode(_context(rows, x, y, w), rows[y][x])
        prev = rows[y]
    return enc.flush()


# -- embedded (PDF) segment stream (T.88 §7.2, Annex H) -----------------

def _seg_header(num: int, seg_type: int, page: int,
                data_len: int) -> bytes:
    # flags: deferred=0, page-assoc-4byte=0 -> 1-byte page association
    # referred-to count 0 (3 bits) + retain bits 0
    return (struct.pack(">IB", num, seg_type & 0x3F)
            + bytes([0x00])      # 0 referred segments
            + bytes([page & 0xFF])
            + struct.pack(">I", data_len))


def encode_embedded(rows: List[List[int]], w: int, h: int,
                    tpgdon: bool = False) -> bytes:
    """Minimal embedded-format JBIG2: page info segment + one immediate
    generic region segment (lossless, template 0, arithmetic)."""
    region = encode_generic_region(rows, w, h, tpgdon)
    # region segment info (17 bytes) + flags byte (MMR=0, TEMPLATE=0,
    # TPGDON bit 3)
    seg_data = (struct.pack(">IIIIB", w, h, 0, 0, 0)  # x,y,combop
                + bytes([(8 if tpgdon else 0)])
                + region)
    page_info = struct.pack(">IIIIB", w, h, 0, 0, 0) + b"\x00\x00\x00"
    out = _seg_header(0, 48, 1, len(page_info)) + page_info
    out += _seg_header(1, 38, 1, len(seg_data)) + seg_data  # immediate
    out += _seg_header(2, 49, 1, 0)  # end of page
    return out


def decode_embedded(data: bytes,
                    globals_data: bytes = b"") -> Tuple[List[List[int]],
                                                        int, int]:
    """Decode an embedded-format JBIG2 stream (PDF /JBIG2Decode):
    returns (rows, width, height) of the page's first generic region.
    Only arithmetic template-0 generic regions are supported — anything
    else raises JBIG2Error (classified 'unsupported' upstream)."""
    buf = globals_data + data
    pos = 0
    n = len(buf)
    while pos + 11 <= n:
        num, flags = struct.unpack(">IB", buf[pos:pos + 5])
        pos += 5
        seg_type = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        rts = buf[pos]
        count = rts >> 5
        if count == 7:  # long form
            (count,) = struct.unpack(">I", buf[pos:pos + 4])
            count &= 0x1FFFFFFF
            pos += 4 + (count + 8) // 8
        else:
            pos += 1
        # referred-to segment numbers: size depends on this segment's
        # number (T.88 7.2.5)
        ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
        pos += count * ref_size
        pos += 4 if page_assoc_4 else 1
        (dlen,) = struct.unpack(">I", buf[pos:pos + 4])
        pos += 4
        if dlen == 0xFFFFFFFF:
            raise JBIG2Error("unknown-length segment unsupported")
        seg = buf[pos:pos + dlen]
        pos += dlen
        if seg_type in (36, 38, 39):  # generic region (any placement)
            if len(seg) < 18:
                raise JBIG2Error("short region segment")
            w, h, _x, _y, _comb = struct.unpack(">IIIIB", seg[:17])
            rflags = seg[17]
            if rflags & 1:
                raise JBIG2Error("MMR region unsupported")
            if (rflags >> 1) & 3 != 0:
                raise JBIG2Error("only GB template 0 supported")
            tpgdon = bool(rflags & 8)
            # nominal AT pixels follow (4 pairs for template 0) when
            # encoded; our encoder omits them (nominal), real streams
            # include them — accept both by checking remaining length
            body = seg[18:]
            if len(body) >= 8 and body[:8] == bytes(
                    (3, 0xFF, 0xFD, 0xFF, 2, 0xFE, 0xFE, 0xFE)):
                body = body[8:]  # explicit nominal AT bytes
            return decode_generic_region(body, w, h, tpgdon), w, h
    raise JBIG2Error("no generic region segment found")
