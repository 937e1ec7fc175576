"""Baseline-sequential JPEG (DCTDecode) decode from the public ITU T.81
spec — closes most of the remaining entropy-coded raster gap: every DCT
stream across the reference's fixture corpus is SOF0 baseline (121/121
surveyed), so progressive (SOF2) and the other exotic SOF types stay
classified unsupported.

Supported: 8-bit baseline, grayscale / YCbCr(JFIF) / RGB (Adobe
transform 0), any h/v sampling factors, restart markers, byte stuffing.
Unsupported (raise ``JPEGError`` → callers classify 'unsupported'):
progressive, arithmetic coding, 12-bit, 4-component CMYK/YCCK.

The fixture ENCODER emits baseline streams with the T.81 Annex K tables
(quality-free: quant table all-ones → lossless for small sample values),
so decode tests have exact expected pixels; real-world validation comes
from the fixture corpus JPEGs themselves (dimensions + stats pinned).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


class JPEGError(ValueError):
    pass


ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 8x8 IDCT-II basis: block_spatial = A.T @ coefs @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2)) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _build_huffman(counts: List[int], symbols: List[int]) -> Dict[Tuple[int, int], int]:
    """Canonical Huffman: {(code_length, code_value): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over the entropy-coded segment with FF00
    unstuffing; restart markers are handled by the caller via resync."""

    __slots__ = ("data", "byte_pos", "bit_pos")

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.byte_pos = start
        self.bit_pos = 0

    def read_bit(self) -> int:
        d = self.data
        p = self.byte_pos
        if p >= len(d):
            raise JPEGError("EOF in entropy data")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0
            if nxt == 0x00:
                pass  # stuffed FF: bits come from the FF byte itself
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                raise JPEGError("hit marker in entropy data")
        bit = (b >> (7 - self.bit_pos)) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.byte_pos += 1
            if b == 0xFF and self.byte_pos < len(d) \
                    and d[self.byte_pos] == 0x00:
                self.byte_pos += 1  # skip the stuffing zero
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JPEGError("bad huffman code")

    def align_to_marker(self) -> Optional[int]:
        """Skip to the next marker (for restart intervals); returns the
        marker's second byte."""
        self.bit_pos = 0
        d = self.data
        p = self.byte_pos
        while p + 1 < len(d):
            if d[p] == 0xFF and d[p + 1] != 0x00:
                self.byte_pos = p + 2
                return d[p + 1]
            p += 1
        self.byte_pos = len(d)
        return None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> dict:
    """-> {width, height, n_components, samples} with ``samples`` a
    (h, w, C) uint8 array (C = 1 gray or 3 RGB). Every malformed-stream
    failure surfaces as ``JPEGError`` (callers classify, never crash)."""
    try:
        return _jpeg_decode_inner(data)
    except JPEGError:
        raise
    except Exception as e:  # noqa: BLE001 — truncated tables, bad reshapes
        raise JPEGError(f"malformed JPEG: {type(e).__name__}") from e


def _jpeg_decode_inner(data: bytes) -> dict:
    if data[:2] != b"\xff\xd8":
        raise JPEGError("not a JPEG (no SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, dict] = {}
    huff_ac: Dict[int, dict] = {}
    frame = None
    restart_interval = 0
    adobe_transform: Optional[int] = None
    n = len(data)
    while pos + 3 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8
                                         ).astype(np.int32)
                    i += 64
                else:
                    vals = np.frombuffer(seg[i:i + 128], dtype=">u2"
                                         ).astype(np.int32)
                    i += 128
                qt[tq] = vals
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                total = sum(counts)
                symbols = list(seg[i + 17:i + 17 + total])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    counts, symbols)
                i += 17 + total
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise JPEGError(f"{prec}-bit precision unsupported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15,
                     "q": seg[8 + c * 3]})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JPEGError(f"SOF{marker - 0xC0} unsupported (not baseline)")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[11] if len(seg) > 11 else None
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JPEGError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid = seg[1 + c * 2]
                tabs = seg[2 + c * 2]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 15))
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval, adobe_transform,
            )
        pos += seglen
    raise JPEGError("no SOS marker")


def _decode_scan(data, start, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval, adobe_transform) -> dict:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(comps) not in (1, 3):
        raise JPEGError(f"{len(comps)}-component JPEG unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise JPEGError("bad sampling factors")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient planes (in 8x8 block units)
    planes = []
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float32))
    br = _BitReader(data, start)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                m = br.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise JPEGError("missing restart marker")
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, (comp, dct, act) in enumerate(scan):
                q = qt.get(comp["q"])
                if q is None:
                    raise JPEGError("missing quant table")
                dtab = huff_dc.get(dct)
                atab = huff_ac.get(act)
                if dtab is None or atab is None:
                    raise JPEGError("missing huffman table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = br.decode_symbol(dtab)
                        diff = _extend(br.read_bits(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(atab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JPEGError("AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coefs = np.zeros(64, dtype=np.float32)
                        coefs[ZIGZAG] = (zz * q).astype(np.float32)
                        block = coefs.reshape(8, 8)
                        spatial = _A.T @ block @ _A + 128.0
                        py = (my * comp["v"] + by) * 8
                        px = (mx * comp["h"] + bx) * 8
                        planes[ci][py:py + 8, px:px + 8] = spatial
    # upsample to full res and assemble
    out = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        rgb = out[0][:, :, None]
    else:
        y, cb, cr = out
        if adobe_transform == 0:
            rgb = np.stack([y, cb, cr], axis=2)
        else:  # JFIF / Adobe transform 1: YCbCr
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            rgb = np.stack([r, g, b], axis=2)
    samples = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "n_components": len(comps),
            "samples": samples}


# --- fixture encoder (tests/corpus only) ------------------------------------

# T.81 Annex K.3 luminance DC/AC tables (the standard example tables)
_STD_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_SYMBOLS = list(range(12))
_STD_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _enc_codes(counts, symbols):
    """{symbol: (length, code)} from canonical table definition."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                if self.acc == 0xFF:
                    self.bytes.append(0x00)  # stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def jpeg_encode_gray(pixels: np.ndarray) -> bytes:
    """Baseline JPEG of an 8-bit grayscale image with an ALL-ONES quant
    table (coefficients survive exactly, so smooth fixtures round-trip
    with only IDCT/FDCT float rounding — ±1 per sample)."""
    pixels = np.asarray(pixels, dtype=np.float32)
    h, w = pixels.shape
    dc_codes = _enc_codes(_STD_DC_COUNTS, _STD_DC_SYMBOLS)
    ac_codes = _enc_codes(_STD_AC_COUNTS, _STD_AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes):
        out.extend(b"\xff" + bytes([marker])
                   + (len(payload) + 2).to_bytes(2, "big") + payload)

    q = np.ones(64, dtype=np.uint8)
    seg(0xDB, bytes([0]) + q.tobytes())
    seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]))
    seg(0xC4, bytes([0x00] + _STD_DC_COUNTS) + bytes(_STD_DC_SYMBOLS))
    seg(0xC4, bytes([0x10] + _STD_AC_COUNTS) + bytes(_STD_AC_SYMBOLS))
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    pred = 0
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(pixels, ((0, bh * 8 - h), (0, bwid * 8 - w)),
                    mode="edge")
    for by in range(bh):
        for bx in range(bwid):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coefs = _A @ block @ _A.T  # FDCT (orthonormal basis)
            # ZIGZAG[i] = natural index of the i-th zigzag coefficient,
            # so indexing BY it reads the block out in zigzag order
            zz = np.round(coefs.reshape(64)[ZIGZAG]).astype(np.int64)
            dc = int(zz[0])
            diff = dc - pred
            pred = dc

            def mag(v: int):
                a = abs(v)
                t = a.bit_length()
                if v >= 0:
                    return t, v
                return t, v + (1 << t) - 1

            t, bits = mag(diff)
            ln, code = dc_codes[t]
            bw.write(code, ln)
            if t:
                bw.write(bits, t)
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if zz[k]:
                    last_nz = k
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                t, bits = mag(v)
                ln, code = ac_codes[(run << 4) | t]
                bw.write(code, ln)
                bw.write(bits, t)
                run = 0
            if last_nz < 63:
                ln, code = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()
    out.extend(bw.bytes)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
