"""WEBP decode from the public container/bitstream specs — VP8L
(lossless) fully, from the "WebP Lossless Bitstream Specification"
(Google, RFC-style public document): LSB-first bit reading, canonical
prefix codes (simple + code-length-coded forms), meta prefix images,
LZ77 backward references with the 120-entry 2-D distance map, color
cache, and all four transforms (predictor, color, subtract-green,
color-indexing incl. sub-byte pixel bundling). Lossy VP8 raises
``WebPError`` → callers classify 'unsupported' (a full VP8 intra
decoder is out of scope).

No real-world WEBP fixtures exist offline (the JBIG2/JPX precedent):
correctness is pinned by encoder/decoder roundtrips — the minimal
encoder (``webp_encode_lossless``) emits fixed-length literal codes and
can exercise each transform — plus structural/fuzz tests.

Reference analogue: pdfplumber's display stack delegates image decode
to PIL, which wraps libwebp.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["WebPError", "webp_decode", "webp_encode_lossless"]


class WebPError(ValueError):
    pass


# code-length-code symbol order (spec §"Decoding the Code Lengths")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)

# 2-D distance mapping: the first 120 distance codes address a pixel
# neighborhood (x in [-8, 7], y in [0, 7]) in this exact order
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def bits(self, n: int) -> int:
        v = 0
        for k in range(n):
            if self.pos >= len(self.data):
                raise WebPError("EOF in VP8L stream")
            v |= ((self.data[self.pos] >> self.bit) & 1) << k
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int):
        for k in range(n):
            self.acc |= ((v >> k) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


class _Prefix:
    """Canonical prefix code: decode walks the code MSB-first, one
    stream bit at a time (the stream itself is LSB-first per byte)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: List[int]):
        self.single: Optional[int] = None
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise WebPError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = {}
            return
        # canonical assignment (RFC 1951 §3.2.2 ordering)
        nz.sort()
        table: Dict[Tuple[int, int], int] = {}
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= (ln - prev_len)
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        if code != (1 << prev_len):
            raise WebPError("prefix code not complete")
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.bits(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise WebPError("bad prefix code")

    @staticmethod
    def write_code(bw: _BitWriter, lengths: List[int], sym: int):
        """Encoder twin of ``read`` for a canonical code."""
        nz = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
        code = 0
        prev_len = nz[0][0]
        for ln, s in nz:
            code <<= (ln - prev_len)
            prev_len = ln
            if s == sym:
                for k in range(ln - 1, -1, -1):
                    bw.bits((code >> k) & 1, 1)
                return
            code += 1
        raise WebPError(f"symbol {sym} not in code")


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Prefix:
    if br.bits(1):  # simple code
        nsym = br.bits(1) + 1
        if br.bits(1):
            first = br.bits(8)
        else:
            first = br.bits(1)
        lengths = [0] * alphabet
        if first >= alphabet:
            raise WebPError("simple-code symbol out of range")
        lengths[first] = 1
        if nsym == 2:
            second = br.bits(8)
            if second >= alphabet:
                raise WebPError("simple-code symbol out of range")
            lengths[second] = 1
        return _Prefix(lengths)
    # normal: code-length code first
    n_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(n_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _Prefix(clc_lengths)
    # optional cap on coded symbols
    if br.bits(1):
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = clc.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    if i > alphabet:
        raise WebPError("code lengths overflow alphabet")
    return _Prefix(lengths)


def _lz77_value(br: _BitReader, code: int) -> int:
    """length/distance prefix-code value expansion."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _read_entropy_image(br: _BitReader, w: int, h: int,
                        allow_meta: bool, allow_cache: bool
                        ) -> np.ndarray:
    """Spatially-coded ARGB image (the workhorse shared by the main
    image, transform sub-images, and palettes). Returns (h, w, 4)
    uint8 [A, R, G, B]."""
    if w <= 0 or h <= 0 or w * h > 50_000_000:
        raise WebPError("bad image dims")
    cache_bits = 0
    cache = None
    if allow_cache and br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise WebPError("bad color-cache size")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.bits(1):
        meta_bits = br.bits(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _read_entropy_image(br, mw, mh, False, False)
        # group index of a tile = (red << 8) | green of its meta pixel
        n_groups = int(
            ((meta[:, :, 1].astype(np.int64) << 8)
             | meta[:, :, 2].astype(np.int64)).max()
        ) + 1
        if n_groups > 1024:
            raise WebPError("implausible meta group count")
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))
    out = np.zeros((h, w, 4), dtype=np.uint8)  # A,R,G,B
    flat = out.reshape(-1, 4)
    n = w * h
    i = 0
    while i < n:
        if meta is not None:
            y, x = divmod(i, w)
            mrow = meta[y >> meta_bits, x >> meta_bits]
            gidx = (int(mrow[1]) << 8) | int(mrow[2])
            if gidx >= len(groups):
                raise WebPError("meta group out of range")
            g = groups[gidx]
        else:
            g = groups[0]
        sym = g[0].read(br)
        if sym < 256:  # literal
            r = g[1].read(br)
            b = g[2].read(br)
            a = g[3].read(br)
            flat[i] = (a, r, sym, b)
            if cache is not None:
                argb = (a << 24) | (r << 16) | (sym << 8) | b
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = argb
            i += 1
        elif sym < 280:  # backward reference
            length = _lz77_value(br, sym - 256)
            dcode = g[4].read(br)
            dist = _lz77_value(br, dcode)
            if dist <= 120:
                dx, dy = _DIST_MAP[dist - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist -= 120
            if dist > i or i + length > n:
                raise WebPError("backward reference out of range")
            for _k in range(length):
                flat[i] = flat[i - dist]
                if cache is not None:
                    a_, r_, gg, b_ = (int(v) for v in flat[i])
                    argb = (a_ << 24) | (r_ << 16) | (gg << 8) | b_
                    cache[(0x1E35A7BD * argb & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
                i += 1
        else:  # color-cache hit
            if cache is None:
                raise WebPError("cache symbol without color cache")
            idx = sym - 280
            if idx >= len(cache):
                raise WebPError("cache index out of range")
            argb = cache[idx]
            flat[i] = ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                       (argb >> 8) & 0xFF, argb & 0xFF)
            i += 1
    return out


# --- transforms (inverse, applied in reverse signal order) ---------------

def _inv_subtract_green(img: np.ndarray):
    g = img[:, :, 2].astype(np.uint16)
    img[:, :, 1] = ((img[:, :, 1] + g) & 0xFF).astype(np.uint8)
    img[:, :, 3] = ((img[:, :, 3] + g) & 0xFF).astype(np.uint8)


def _predict(mode: int, img: np.ndarray, x: int, y: int) -> np.ndarray:
    def px(xx, yy):
        return img[yy, xx].astype(np.int32)

    L = px(x - 1, y) if x > 0 else (
        px(0, y - 1) if y > 0 else np.array([255, 0, 0, 0], np.int32))
    T = px(x, y - 1) if y > 0 else L
    TL = px(x - 1, y - 1) if x > 0 and y > 0 else L
    TR = (px(x + 1, y - 1) if y > 0 and x + 1 < img.shape[1] else L)
    if mode == 0:
        return np.array([255, 0, 0, 0], np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return ((L + TR) // 2 + T) // 2
    if mode == 6:
        return (L + TL) // 2
    if mode == 7:
        return (L + T) // 2
    if mode == 8:
        return (TL + T) // 2
    if mode == 9:
        return (T + TR) // 2
    if mode == 10:
        return ((L + TL) // 2 + (T + TR) // 2) // 2
    if mode == 11:  # select
        p = L + T - TL
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T).sum())
        return L if pl < pt else T
    if mode == 12:  # clamped add-subtract-full
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:  # clamped add-subtract-half
        avg = (L + T) // 2
        return np.clip(avg + (avg - TL) // 2, 0, 255)
    raise WebPError(f"bad predictor mode {mode}")


def _inv_predictor(img: np.ndarray, tiles: np.ndarray, bits: int):
    h, w = img.shape[:2]
    for y in range(h):
        for x in range(w):
            mode = int(tiles[y >> bits, x >> bits, 2])  # green channel
            pred = _predict(mode, img, x, y)
            img[y, x] = ((img[y, x].astype(np.int32) + pred) & 0xFF
                         ).astype(np.uint8)


def _cdelta(t: int, c: int) -> int:
    # signed 3.5 fixed-point multiply (spec ColorTransformDelta)
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _inv_color_transform(img: np.ndarray, tiles: np.ndarray, bits: int):
    h, w = img.shape[:2]
    for y in range(h):
        for x in range(w):
            tl = tiles[y >> bits, x >> bits]
            g2r, g2b, r2b = int(tl[3]), int(tl[2]), int(tl[1])
            a, r, g, b = (int(v) for v in img[y, x])
            r = (r + _cdelta(g2r, g)) & 0xFF
            b = (b + _cdelta(g2b, g) + _cdelta(r2b, r)) & 0xFF
            img[y, x] = (a, r, g, b)


def _inv_color_indexing(img: np.ndarray, palette: np.ndarray,
                        orig_w: int) -> np.ndarray:
    n = palette.shape[0]
    if n <= 2:
        pack = 3  # 8 pixels/byte
    elif n <= 4:
        pack = 2
    elif n <= 16:
        pack = 1
    else:
        pack = 0
    h = img.shape[0]
    out = np.zeros((h, orig_w, 4), dtype=np.uint8)
    bits_per = 8 >> pack
    per_byte = 1 << pack
    mask = (1 << bits_per) - 1
    for y in range(h):
        for x in range(orig_w):
            if pack:
                packed = int(img[y, x >> pack, 2])
                idx = (packed >> ((x % per_byte) * bits_per)) & mask
            else:
                idx = int(img[y, x, 2])
            if idx >= n:
                out[y, x] = (0, 0, 0, 0)
            else:
                out[y, x] = palette[idx]
    return out


def _vp8l_decode(data: bytes) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise WebPError("bad VP8L signature")
    br = _BitReader(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise WebPError("unknown VP8L version")
    if w * h > 50_000_000:
        raise WebPError("implausible dimensions")
    transforms = []
    cur_w = w
    seen = set()
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in seen:
            raise WebPError("duplicate transform")
        seen.add(ttype)
        if ttype == 2:  # subtract-green
            transforms.append(("sg",))
        elif ttype in (0, 1):  # predictor / color transform
            bits = br.bits(3) + 2
            tw = -(-cur_w // (1 << bits))
            th = -(-h // (1 << bits))
            tiles = _read_entropy_image(br, tw, th, False, True)
            transforms.append(("pred" if ttype == 0 else "color",
                               tiles, bits))
        else:  # 3: color indexing
            n = br.bits(8) + 1
            pal = _read_entropy_image(br, n, 1, False, True)[0]
            # palette entries are delta-coded component-wise
            pal = np.cumsum(pal.astype(np.int64), axis=0) & 0xFF
            pal = pal.astype(np.uint8)
            transforms.append(("palette", pal, cur_w))
            if n <= 2:
                cur_w = -(-cur_w // 8)
            elif n <= 4:
                cur_w = -(-cur_w // 4)
            elif n <= 16:
                cur_w = -(-cur_w // 2)
    img = _read_entropy_image(br, cur_w, h, True, True)
    for t in reversed(transforms):
        if t[0] == "sg":
            _inv_subtract_green(img)
        elif t[0] == "pred":
            _inv_predictor(img, t[1], t[2])
        elif t[0] == "color":
            _inv_color_transform(img, t[1], t[2])
        else:
            img = _inv_color_indexing(img, t[1], t[2])
    return img


def webp_decode(data: bytes) -> dict:
    """-> dict(width, height, n_components=4, samples=(h, w, 4) uint8
    RGBA). VP8L (lossless) decodes; VP8/VP8X (lossy/extended) and
    container forms without a decodable chunk raise WebPError with
    'unsupported' in the message (callers classify)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebPError("not a WEBP file")
    pos = 12
    while pos + 4 <= len(data):
        tag = data[pos:pos + 4]
        if tag in (b"VP8 ", b"VP8X"):
            raise WebPError("lossy/extended WEBP unsupported")
        if pos + 8 > len(data):
            break
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        if tag == b"VP8L":
            if len(chunk) < ln:
                raise WebPError("truncated VP8L chunk")
            argb = _vp8l_decode(chunk)
            rgba = argb[:, :, [1, 2, 3, 0]]  # A,R,G,B -> R,G,B,A
            return {"width": argb.shape[1], "height": argb.shape[0],
                    "n_components": 4, "samples": rgba}
        pos += 8 + ln + (ln & 1)
    raise WebPError("no decodable WEBP chunk (unsupported)")


# --- minimal encoder (tests/corpus only) ---------------------------------

_LIT_LENGTHS_GREEN = [8] * 256 + [0] * 24
_LIT_LENGTHS_256 = [8] * 256


def _write_fixed_literal_code(bw: _BitWriter, alphabet: int):
    """Normal-form prefix code: 256 symbols at length 8 (complete),
    via a 1-bit code-length code over {0, 8}."""
    bw.bits(0, 1)  # not simple
    # clc covers kOrder positions up to symbol 8 (index 11)
    bw.bits(12 - 4, 4)
    for i in range(12):
        sym = _CLC_ORDER[i]
        bw.bits(1 if sym in (0, 8) else 0, 3)
    bw.bits(0, 1)  # no max_symbol cap
    clc_lengths = [0] * 19
    clc_lengths[0] = 1
    clc_lengths[8] = 1
    for s in range(alphabet):
        _Prefix.write_code(bw, clc_lengths, 8 if s < 256 else 0)


def _write_single_symbol_code(bw: _BitWriter, sym: int):
    bw.bits(1, 1)  # simple
    bw.bits(0, 1)  # one symbol
    bw.bits(1, 1)  # 8-bit symbol id
    bw.bits(sym, 8)


def _write_literal_image(bw: _BitWriter, argb: np.ndarray,
                         allow_meta: bool):
    """All-literal spatially-coded image with fixed 8-bit codes."""
    bw.bits(0, 1)  # no color cache
    if allow_meta:
        bw.bits(0, 1)  # no meta prefix image
    _write_fixed_literal_code(bw, 256 + 24)  # green
    _write_fixed_literal_code(bw, 256)       # red
    _write_fixed_literal_code(bw, 256)       # blue
    _write_fixed_literal_code(bw, 256)       # alpha
    _write_single_symbol_code(bw, 0)         # distance (unused)
    lit = [8] * 256
    for px in argb.reshape(-1, 4):
        a, r, g, b = (int(v) for v in px)
        _Prefix.write_code(bw, _LIT_LENGTHS_GREEN, g)
        _Prefix.write_code(bw, lit, r)
        _Prefix.write_code(bw, lit, b)
        _Prefix.write_code(bw, lit, a)


def webp_encode_lossless(arr: np.ndarray,
                         subtract_green: bool = False,
                         predictor_mode: Optional[int] = None,
                         color_transform: Optional[Tuple[int, int, int]]
                         = None,
                         palette: Optional[np.ndarray] = None) -> bytes:
    """Minimal VP8L: all-literal coding with optional transforms —
    subtract-green, a constant-mode predictor, a constant color
    transform (g2r, g2b, r2b bytes), or color-indexing (``palette``
    given: ``arr`` is then (h, w) palette INDICES and ``palette`` an
    (n, 4) RGBA array; n <= 16 exercises pixel bundling). Fixtures/
    corpus only — no compression effort."""
    pal_argb = None
    if palette is not None:
        idx = np.asarray(arr)
        if idx.ndim != 2 or idx.dtype != np.uint8:
            raise WebPError("palette form expects uint8 (h, w) indices")
        pal = np.asarray(palette, dtype=np.uint8)
        n = pal.shape[0]
        if idx.max(initial=0) >= n:
            raise WebPError("palette index out of range")
        h, w = idx.shape
        pal_argb = pal[:, [3, 0, 1, 2]]  # RGBA -> A,R,G,B
        alpha_hint = int((pal[:, 3] != 255).any())
    else:
        a = np.asarray(arr)
        if a.ndim == 2:
            a = np.stack([a, a, a, np.full_like(a, 255)], axis=2)
        if a.shape[2] == 3:
            a = np.concatenate(
                [a, np.full(a.shape[:2] + (1,), 255, np.uint8)], axis=2)
        if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 4:
            raise WebPError("encoder expects uint8 (h, w[, 3|4])")
        h, w = a.shape[:2]
        argb = a[:, :, [3, 0, 1, 2]].astype(np.uint8)  # RGBA -> A,R,G,B
        alpha_hint = int((a[:, :, 3] != 255).any())
    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(alpha_hint, 1)
    bw.bits(0, 3)  # version
    if pal_argb is not None:
        n = pal_argb.shape[0]
        bw.bits(1, 1)
        bw.bits(3, 2)  # color indexing
        bw.bits(n - 1, 8)
        deltas = np.diff(
            np.vstack([np.zeros((1, 4), np.int64),
                       pal_argb.astype(np.int64)]), axis=0) & 0xFF
        _write_literal_image(bw, deltas.astype(np.uint8)[None, :, :],
                             allow_meta=False)
        if n <= 2:
            pack, per = 3, 8
        elif n <= 4:
            pack, per = 2, 4
        elif n <= 16:
            pack, per = 1, 2
        else:
            pack, per = 0, 1
        pw = -(-w // per)
        packed = np.zeros((h, pw, 4), dtype=np.uint8)
        bits_per = 8 >> pack
        for y in range(h):
            for x in range(w):
                packed[y, x // per, 2] |= (
                    int(arr[y, x]) << ((x % per) * bits_per))
        bw.bits(0, 1)  # no more transforms
        _write_literal_image(bw, packed, allow_meta=True)
        payload = b"\x2f" + bw.flush()
        if len(payload) & 1:
            chunk = payload + b"\x00"
        else:
            chunk = payload
        riff = (b"VP8L" + struct.pack("<I", len(payload)) + chunk)
        return (b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP"
                + riff)
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.bits(1, 1)
        bw.bits(1, 2)  # transform type 1
        bits = 4
        bw.bits(bits - 2, 3)
        tw, th = -(-w // (1 << bits)), -(-h // (1 << bits))
        tiles = np.zeros((th, tw, 4), dtype=np.uint8)
        tiles[:, :, 3] = g2r   # blue channel carries g2r
        tiles[:, :, 2] = g2b   # green carries g2b
        tiles[:, :, 1] = r2b   # red carries r2b
        _write_literal_image(bw, tiles, allow_meta=False)
        out = argb.astype(np.int32)
        for y in range(h):
            for x in range(w):
                a_, r, g, b = (int(v) for v in argb[y, x])
                r2 = (r - _cdelta(g2r, g)) & 0xFF
                b2 = (b - _cdelta(g2b, g) - _cdelta(r2b, r)) & 0xFF
                out[y, x] = (a_, r2, g, b2)
        argb = out.astype(np.uint8)
    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise WebPError("bad predictor mode")
        bw.bits(1, 1)
        bw.bits(0, 2)  # transform type 0
        bits = 4
        bw.bits(bits - 2, 3)
        tw, th = -(-w // (1 << bits)), -(-h // (1 << bits))
        tiles = np.zeros((th, tw, 4), dtype=np.uint8)
        tiles[:, :, 2] = predictor_mode
        _write_literal_image(bw, tiles, allow_meta=False)
        orig = argb.astype(np.uint8)
        res = np.zeros_like(orig)
        for y in range(h):
            for x in range(w):
                pred = _predict(predictor_mode, orig, x, y)
                res[y, x] = ((orig[y, x].astype(np.int32) - pred)
                             & 0xFF).astype(np.uint8)
        argb = res
    if subtract_green:
        bw.bits(1, 1)
        bw.bits(2, 2)  # transform type 2
        argb = argb.astype(np.int16)
        g = argb[:, :, 2]
        argb[:, :, 1] = (argb[:, :, 1] - g) & 0xFF
        argb[:, :, 3] = (argb[:, :, 3] - g) & 0xFF
        argb = argb.astype(np.uint8)
    bw.bits(0, 1)  # no more transforms
    _write_literal_image(bw, argb, allow_meta=True)
    payload = b"\x2f" + bw.flush()
    if len(payload) & 1:
        chunk = payload + b"\x00"
    else:
        chunk = payload
    riff = (b"VP8L" + struct.pack("<I", len(payload)) + chunk)
    return (b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff)
