"""JPEG (DCTDecode) decode from the public ITU T.81 spec.

Supported: 8-bit baseline/extended sequential (SOF0/SOF1) — grayscale /
YCbCr(JFIF) / RGB (Adobe transform 0), any h/v sampling factors, restart
markers, byte stuffing — and, since round 6, PROGRESSIVE (SOF2, Annex G):
DC first/refine scans (interleaved or single-component), per-band AC
first scans with cross-block EOB runs, and AC successive-approximation
refinement with correction bits. Every DCT stream across the reference's
fixture corpus is SOF0 (121/121 surveyed); progressive is the largest
real-corpus class beyond that. Round 7 adds 4-component CMYK / YCCK
(Adobe APP14 transform 0/2) for both sequential and progressive frames —
the print-origin scanned-PDF class. Decoded output follows the
libjpeg+PIL convention (the stack behind the reference's
``display.py:36-90``): Adobe-marked files store inverted CMYK, so
``samples`` is TRUE CMYK after the inversion; YCCK applies the YCbCr
inverse to the first three channels first (T.81 carries no colorspace —
the Adobe APP14 transform flag is the only public signal).
Unsupported (raise ``JPEGError`` → callers classify 'unsupported'):
arithmetic coding, hierarchical/lossless SOFs, 12-bit.

The fixture ENCODERS (baseline ``jpeg_encode_gray``, progressive
``jpeg_encode_gray_progressive``) use an all-ones quant table, so both
emit the SAME coefficients and progressive decode is pinned byte-equal
to baseline decode; real-world validation comes from the fixture corpus
JPEGs themselves (dimensions + stats pinned).
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
    (h, w, C) uint8 array (C = 1 gray, 3 RGB, or 4 true CMYK). Every
    malformed-stream failure surfaces as ``JPEGError`` (callers
    classify, never crash)."""
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
    coef_state = None
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
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
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if marker == 0xC2:
                coef_state = _init_progressive_state(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JPEGError(
                f"SOF{marker - 0xC0} unsupported (not sequential/progressive)"
            )
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
            if not frame.get("progressive"):
                return _decode_scan(
                    data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval, adobe_transform,
                )
            # progressive (T.81 Annex G): spectral selection + successive
            # approximation; each scan refines the coefficient state
            ss = seg[1 + ns * 2]
            se = seg[2 + ns * 2]
            ahal = seg[3 + ns * 2]
            pos = _progressive_scan(
                data, pos + seglen, frame, scan, huff_dc, huff_ac,
                restart_interval, coef_state, ss, se, ahal >> 4, ahal & 15,
            )
            continue
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return _assemble_progressive(frame, coef_state, qt, adobe_transform)
    raise JPEGError("no SOS marker")


def _mcu_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise JPEGError("bad sampling factors")
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _init_progressive_state(frame):
    """Per-component zigzag-order coefficient planes, padded to MCU
    multiples (interleaved DC scans address the padding; non-interleaved
    AC scans stay inside the component's true block grid)."""
    if len(frame["comps"]) not in (1, 3, 4):
        raise JPEGError(f"{len(frame['comps'])}-component JPEG unsupported")
    hmax, vmax, mcux, mcuy = _mcu_geometry(frame)
    state = []
    for c in frame["comps"]:
        bw_pad, bh_pad = mcux * c["h"], mcuy * c["v"]
        # true (non-interleaved) block grid of this component
        cw = (frame["w"] * c["h"] + hmax - 1) // hmax
        ch = (frame["h"] * c["v"] + vmax - 1) // vmax
        state.append({
            "coef": np.zeros((bh_pad, bw_pad, 64), dtype=np.int32),
            "bw": (cw + 7) // 8, "bh": (ch + 7) // 8,
        })
    return state


def _progressive_scan(data, start, frame, scan, huff_dc, huff_ac,
                      restart_interval, state, ss, se, ah, al) -> int:
    """One progressive scan (T.81 Annex G.2): DC first/refine
    (interleaved or not), AC first/refine with EOB runs (single
    component). Mutates ``state`` coefficient planes; returns the
    position just past this scan's entropy data."""
    comps = frame["comps"]
    if ss == 0 and se != 0:
        raise JPEGError("bad spectral band (DC scan with Se != 0)")
    if ss > se or se > 63:
        raise JPEGError("bad spectral band")
    if ss > 0 and len(scan) != 1:
        raise JPEGError("interleaved AC progressive scan")
    br = _BitReader(data, start)
    eobrun = 0
    preds = [0] * len(scan)
    comp_idx = {id(c): i for i, c in enumerate(comps)}
    _, _, mcux, mcuy = _mcu_geometry(frame)

    def decode_dc_first(ci, scomp, dct, bx, by):
        dtab = huff_dc.get(dct)
        if dtab is None:
            raise JPEGError("missing huffman table")
        t = br.decode_symbol(dtab)
        diff = _extend(br.read_bits(t), t)
        preds[ci] += diff
        coef = state[comp_idx[id(scomp)]]["coef"]
        coef[by, bx, 0] = preds[ci] << al

    def decode_dc_refine(scomp, bx, by):
        coef = state[comp_idx[id(scomp)]]["coef"]
        if br.read_bit():
            coef[by, bx, 0] |= 1 << al

    def decode_ac_first(scomp, act, bx, by):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        atab = huff_ac.get(act)
        if atab is None:
            raise JPEGError("missing huffman table")
        zz = state[comp_idx[id(scomp)]]["coef"][by, bx]
        k = ss
        while k <= se:
            rs = br.decode_symbol(atab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read_bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise JPEGError("AC index past band end")
            zz[k] = _extend(br.read_bits(s), s) << al
            k += 1

    def decode_ac_refine(scomp, act, bx, by):
        """T.81 G.1.2.3 correction-bit refinement."""
        nonlocal eobrun
        p1 = 1 << al
        m1 = -1 << al
        zz = state[comp_idx[id(scomp)]]["coef"][by, bx]
        k = ss
        if eobrun == 0:
            while k <= se:
                atab = huff_ac.get(act)
                if atab is None:
                    raise JPEGError("missing huffman table")
                rs = br.decode_symbol(atab)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    # r == 15: run of 16 zero-history coefficients
                else:
                    if s != 1:
                        raise JPEGError("bad refinement magnitude")
                    val = p1 if br.read_bit() else m1
                # advance r zero-history positions, emitting correction
                # bits for every nonzero-history coefficient passed
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if br.read_bit() and (c & p1) == 0:
                            zz[k] = c + (p1 if c > 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            # remaining nonzero-history coefficients get correction bits
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        zz[k] = c + (p1 if c > 0 else m1)
                k += 1
            eobrun -= 1

    # MCU walk: interleaved over all scan components (DC scans with
    # ns > 1) or the single component's own block grid
    interleaved = len(scan) > 1
    if interleaved:
        n_mcu = mcux * mcuy
    else:
        st = state[comp_idx[id(scan[0][0])]]
        n_mcu = st["bw"] * st["bh"]

    def resync():
        nonlocal eobrun, preds
        m = br.align_to_marker()
        if m is None or not (0xD0 <= m <= 0xD7):
            raise JPEGError("missing restart marker")
        eobrun = 0
        preds = [0] * len(scan)

    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            resync()
        if interleaved:
            mx, my = m % mcux, m // mcux
            for ci, (scomp, dct, act) in enumerate(scan):
                for by in range(scomp["v"]):
                    for bx in range(scomp["h"]):
                        gx = mx * scomp["h"] + bx
                        gy = my * scomp["v"] + by
                        if ss == 0 and ah == 0:
                            decode_dc_first(ci, scomp, dct, gx, gy)
                        elif ss == 0:
                            decode_dc_refine(scomp, gx, gy)
                        else:  # pragma: no cover — rejected above
                            raise JPEGError("interleaved AC scan")
        else:
            scomp, dct, act = scan[0]
            st = state[comp_idx[id(scomp)]]
            gx, gy = m % st["bw"], m // st["bw"]
            if ss == 0 and ah == 0:
                decode_dc_first(0, scomp, dct, gx, gy)
            elif ss == 0:
                decode_dc_refine(scomp, gx, gy)
            elif ah == 0:
                decode_ac_first(scomp, act, gx, gy)
            else:
                decode_ac_refine(scomp, act, gx, gy)
    # skip to the next marker (the entropy data is byte-padded)
    br.bit_pos = 0
    d, p = data, br.byte_pos
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00:
            if 0xD0 <= d[p + 1] <= 0xD7:  # trailing RST
                p += 2
                continue
            return p
        p += 1
    return len(d)


def _assemble_progressive(frame, state, qt, adobe_transform) -> dict:
    """Dequantize + IDCT the accumulated coefficient planes and run the
    shared upsample/color path."""
    comps = frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["q"])
        if q is None:
            raise JPEGError("missing quant table")
        coef = state[ci]["coef"].astype(np.float32) * q.astype(np.float32)
        bh_pad, bw_pad = coef.shape[:2]
        blocks = np.zeros((bh_pad * bw_pad, 8, 8), dtype=np.float32)
        blocks.reshape(-1, 64)[:, ZIGZAG] = coef.reshape(-1, 64)
        spatial = np.matmul(np.matmul(_A.T, blocks), _A) + 128.0
        plane = (
            spatial.reshape(bh_pad, bw_pad, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_pad * 8, bw_pad * 8)
        )
        planes.append(plane)
    return _finish_planes(frame, planes, adobe_transform)


def _finish_planes(frame, planes, adobe_transform) -> dict:
    """Upsample component planes to full resolution and color-transform
    (shared by the sequential and progressive paths)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        rgb = out[0][:, :, None]
    elif len(out) == 4:
        # CMYK / YCCK (Adobe APP14 transform 0 / 2). Net decode rule of
        # the libjpeg ycck_cmyk path + PIL's "CMYK;I" inversion for
        # Adobe-marked files: Adobe stores INVERTED CMYK; YCCK further
        # runs the YCbCr forward transform over the inverted C,M,Y.
        # Sign audit (libjpeg jccolor.c cmyk_ycck_convert is the public
        # authority): the encoder computes YCbCr over (255 - stored CMY)
        # and passes stored K through; Photoshop hands it INVERTED CMYK
        # (stored = 255 - true), so the YCbCr inverse lands directly on
        # true C,M,Y while K needs the inversion. Equivalent two-step
        # view: libjpeg's ycck_cmyk output (255-R, 255-G, 255-B, K)
        # then the consumer-side Adobe inversion of all four channels.
        y, cb, cr, k = out
        if adobe_transform == 2:  # YCCK
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            rgb = np.stack([r, g, b, 255.0 - k], axis=2)
        elif adobe_transform is not None:  # Adobe CMYK, stored inverted
            rgb = 255.0 - np.stack([y, cb, cr, k], axis=2)
        else:  # no Adobe marker: raw CMYK samples (PIL convention)
            rgb = np.stack([y, cb, cr, k], axis=2)
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


def _decode_scan(data, start, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval, adobe_transform) -> dict:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(comps) not in (1, 3, 4):
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
    return _finish_planes(frame, planes, adobe_transform)


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


# --- progressive fixture encoder (tests/corpus only, T.81 Annex G) ----------

# custom equal-length AC table for progressive scans: EOBn (r<<4|0,
# r<=14), ZRL, and (r<<4)|s for s<=10 — the standard baseline table
# lacks EOBn codes for r>0
_PROG_AC_SYMBOLS = (
    [(r << 4) for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_COUNTS = [0] * 16
_PROG_AC_COUNTS[7] = len(_PROG_AC_SYMBOLS)  # all codes 8 bits long


def jpeg_encode_gray_progressive(pixels: np.ndarray) -> bytes:
    """Progressive (SOF2) JPEG of an 8-bit grayscale image, all-ones
    quant table, six scans exercising every Annex-G decode path: DC
    first (Al=1) + DC refine, AC first per band (Al=1, with EOB-run
    accumulation across blocks), AC refine per band (Al=0, correction
    bits + newly-significant insertion + per-block EOB)."""
    pixels = np.asarray(pixels, dtype=np.float32)
    h, w = pixels.shape
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(pixels, ((0, bh * 8 - h), (0, bwid * 8 - w)),
                    mode="edge")
    blocks = []
    for by in range(bh):
        for bx in range(bwid):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coefs = _A @ block @ _A.T
            blocks.append(np.round(coefs.reshape(64)[ZIGZAG]).astype(np.int64))

    dc_codes = _enc_codes(_STD_DC_COUNTS, _STD_DC_SYMBOLS)
    ac_codes = _enc_codes(_PROG_AC_COUNTS, _PROG_AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(b"\xff" + bytes([marker])
                   + (len(payload) + 2).to_bytes(2, "big") + payload)

    q = np.ones(64, dtype=np.uint8)
    seg(0xDB, bytes([0]) + q.tobytes())
    seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]))
    seg(0xC4, bytes([0x00] + _STD_DC_COUNTS) + bytes(_STD_DC_SYMBOLS))
    seg(0xC4, bytes([0x10] + _PROG_AC_COUNTS) + bytes(_PROG_AC_SYMBOLS))

    def mag(v: int):
        a = abs(v)
        t = a.bit_length()
        return (t, v) if v >= 0 else (t, v + (1 << t) - 1)

    def scan(ss, se, ah, al, body_fn):
        seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        bw_ = _BitWriter()
        body_fn(bw_)
        bw_.flush()
        out.extend(bw_.bytes)

    def dc_first(bw_):
        pred = 0
        for zz in blocks:
            v = int(zz[0]) >> 1  # Al=1 point transform (arithmetic)
            t, bits = mag(v - pred)
            pred = v
            ln, code = dc_codes[t]
            bw_.write(code, ln)
            if t:
                bw_.write(bits, t)

    def dc_refine(bw_):
        for zz in blocks:
            bw_.write(int(zz[0]) & 1, 1)

    def ac_first(ss, se, al):
        def body(bw_):
            eobrun = 0

            def flush():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    ln, code = ac_codes[r << 4]
                    bw_.write(code, ln)
                    if r:
                        bw_.write(eobrun - (1 << r), r)
                    eobrun = 0

            for zz in blocks:
                vals = [
                    int(abs(zz[k]) >> al) * (1 if zz[k] >= 0 else -1)
                    for k in range(ss, se + 1)
                ]
                nz = [i for i, v in enumerate(vals) if v]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x3FFF:
                        flush()
                    continue
                flush()
                run = 0
                for i in range(nz[-1] + 1):
                    v = vals[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        bw_.write(code, ln)
                        run -= 16
                    t, bits = mag(v)
                    ln, code = ac_codes[(run << 4) | t]
                    bw_.write(code, ln)
                    bw_.write(bits, t)
                    run = 0
                if nz[-1] < se - ss:
                    eobrun = 1
            flush()
        return body

    def ac_refine(ss, se, ah, al):
        def body(bw_):
            for zz in blocks:
                vals = [int(abs(zz[k]) >> al) for k in range(ss, se + 1)]
                hist = [int(abs(zz[k]) >> ah) for k in range(ss, se + 1)]
                newly = [i for i in range(len(vals))
                         if hist[i] == 0 and vals[i]]
                last_new = newly[-1] if newly else -1
                run = 0
                buffered = []
                for i in range(last_new + 1):
                    if hist[i] != 0:
                        buffered.append(vals[i] & 1)
                        continue
                    if vals[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        bw_.write(code, ln)
                        for b in buffered:
                            bw_.write(b, 1)
                        buffered = []
                        run -= 16
                    ln, code = ac_codes[(run << 4) | 1]
                    bw_.write(code, ln)
                    bw_.write(1 if zz[ss + i] > 0 else 0, 1)
                    for b in buffered:
                        bw_.write(b, 1)
                    buffered = []
                    run = 0
                # per-block EOB (run of 1) + correction bits for the
                # remaining nonzero-history coefficients
                if last_new < se - ss:
                    ln, code = ac_codes[0x00]
                    bw_.write(code, ln)
                    for i in range(last_new + 1, len(vals)):
                        if hist[i] != 0:
                            bw_.write(vals[i] & 1, 1)
        return body

    scan(0, 0, 0, 1, dc_first)
    scan(1, 5, 0, 1, ac_first(1, 5, 1))
    scan(6, 63, 0, 1, ac_first(6, 63, 1))
    scan(0, 0, 1, 0, dc_refine)
    scan(1, 5, 1, 0, ac_refine(1, 5, 1, 0))
    scan(6, 63, 1, 0, ac_refine(6, 63, 1, 0))
    out.extend(b"\xff\xd9")
    return bytes(out)


# --- CMYK / YCCK fixture encoder (tests/corpus only) -------------------------


def _plane_blocks(plane: np.ndarray) -> list:
    """8x8 FDCT blocks of one component plane, zigzag int64 vectors."""
    h, w = plane.shape
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(
        plane.astype(np.float32),
        ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge",
    )
    blocks = []
    for by in range(bh):
        for bx in range(bwid):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coefs = _A @ block @ _A.T
            blocks.append(
                np.round(coefs.reshape(64)[ZIGZAG]).astype(np.int64))
    return blocks


def jpeg_encode_cmyk(pixels: np.ndarray, transform: int = 2,
                     adobe: bool = True) -> bytes:
    """Baseline 4-component JPEG of TRUE CMYK pixels (h, w, 4) uint8,
    all-ones quant table, 1x1 sampling on every component.

    ``transform=2`` stores YCCK exactly as Photoshop does (APP14 Adobe
    transform 2; YCbCr over the true C,M,Y, K channel inverted — see the
    sign audit in ``_finish_planes``); ``transform=0`` stores inverted
    CMYK with an APP14 transform-0 marker. ``adobe=False`` (only valid
    with transform=0) omits the marker and stores RAW CMYK — the
    non-Adobe convention real decoders fall back to."""
    pixels = np.asarray(pixels, dtype=np.float32)
    h, w = pixels.shape[:2]
    if pixels.ndim != 3 or pixels.shape[2] != 4:
        raise ValueError("jpeg_encode_cmyk wants (h, w, 4)")
    if transform == 2:
        if not adobe:
            raise ValueError("YCCK requires the Adobe marker")
        c, m, yy, k = [pixels[:, :, i] for i in range(4)]
        ych = 0.299 * c + 0.587 * m + 0.114 * yy
        cb = 128.0 - 0.168736 * c - 0.331264 * m + 0.5 * yy
        cr = 128.0 + 0.5 * c - 0.418688 * m - 0.081312 * yy
        stored = [ych, cb, cr, 255.0 - k]
    elif transform == 0:
        stored = [
            (255.0 - pixels[:, :, i]) if adobe else pixels[:, :, i]
            for i in range(4)
        ]
    else:
        raise ValueError(f"transform {transform} not encodable")
    stored = [np.clip(p, 0, 255) for p in stored]
    dc_codes = _enc_codes(_STD_DC_COUNTS, _STD_DC_SYMBOLS)
    ac_codes = _enc_codes(_STD_AC_COUNTS, _STD_AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(b"\xff" + bytes([marker])
                   + (len(payload) + 2).to_bytes(2, "big") + payload)

    if adobe:
        # APP14: "Adobe" + version 100 + flags0 + flags1 + transform
        seg(0xEE, b"Adobe" + (100).to_bytes(2, "big") + b"\x00\x00"
            + b"\x00\x00" + bytes([transform]))
    q = np.ones(64, dtype=np.uint8)
    seg(0xDB, bytes([0]) + q.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([4])
    for cid in range(1, 5):
        sof += bytes([cid, 0x11, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00] + _STD_DC_COUNTS) + bytes(_STD_DC_SYMBOLS))
    seg(0xC4, bytes([0x10] + _STD_AC_COUNTS) + bytes(_STD_AC_SYMBOLS))
    sos = bytes([4])
    for cid in range(1, 5):
        sos += bytes([cid, 0x00])
    seg(0xDA, sos + bytes([0, 63, 0]))

    plane_blocks = [_plane_blocks(p) for p in stored]
    bw = _BitWriter()
    preds = [0, 0, 0, 0]

    def mag(v: int):
        a = abs(v)
        t = a.bit_length()
        return (t, v) if v >= 0 else (t, v + (1 << t) - 1)

    for bi in range(len(plane_blocks[0])):  # MCU order == block order (1x1)
        for ci in range(4):
            zz = plane_blocks[ci][bi]
            dc = int(zz[0])
            t, bits = mag(dc - preds[ci])
            preds[ci] = dc
            ln, code = dc_codes[t]
            bw.write(code, ln)
            if t:
                bw.write(bits, t)
            run = 0
            last_nz = 0
            for kk in range(1, 64):
                if zz[kk]:
                    last_nz = kk
            for kk in range(1, last_nz + 1):
                v = int(zz[kk])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                t, bits = mag(v)
                ln, code = ac_codes[(run << 4) | t]
                bw.write(code, ln)
                bw.write(bits, t)
                run = 0
            if last_nz < 63:
                ln, code = ac_codes[0x00]
                bw.write(code, ln)
    bw.flush()
    out.extend(bw.bytes)
    out.extend(b"\xff\xd9")
    return bytes(out)
