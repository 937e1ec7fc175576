"""Embedded-TrueType glyph parsing + rasterization from scratch (round 6
stretch — replaces 5x7 bitmap stamping with real typographic outlines in
renders when a /FontFile2 is present).

Public-spec sources: the TrueType/OpenType sfnt layout (Apple "TrueType
Reference Manual" / Microsoft OpenType spec, both public): table
directory, `head` (unitsPerEm, indexToLocFormat), `loca`, `glyf` simple
+ composite glyph outlines (quadratic B-splines with on/off-curve
points), `cmap` formats 0/4/6/12, `hhea`/`hmtx` metrics.

Rasterization: quadratic segments flattened to polylines, scanline fill
with the NON-ZERO winding rule (TrueType's fill convention), sampled at
pixel centers. Deterministic (pure integer font units + fixed flattening
steps) so render hashes stay oracle-checkable.

Reference analogue: the reference renders via pypdfium2 (display.py);
pixel-exact parity with pdfium is out of scope — this provides real
glyph SHAPES deterministically.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple


class TrueTypeError(Exception):
    pass


class TrueTypeFont:
    """Minimal sfnt parser exposing unicode->glyph and glyph outlines."""

    def __init__(self, data: bytes):
        self.data = data
        if len(data) < 12:
            raise TrueTypeError("too short")
        tag = data[:4]
        if tag not in (b"\x00\x01\x00\x00", b"true", b"ttcf", b"OTTO"):
            raise TrueTypeError(f"not an sfnt: {tag!r}")
        if tag == b"OTTO":
            raise TrueTypeError("CFF outlines (OTTO) not supported")
        off = 0
        if tag == b"ttcf":  # font collection: first font
            if len(data) < 16:
                raise TrueTypeError("bad ttc header")
            (off,) = struct.unpack(">I", data[12:16])
        (num_tables,) = struct.unpack(">H", data[off + 4:off + 6])
        self.tables: Dict[bytes, Tuple[int, int]] = {}
        p = off + 12
        for _ in range(num_tables):
            if p + 16 > len(data):
                raise TrueTypeError("truncated table directory")
            t, _cs, toff, tlen = struct.unpack(">4sIII", data[p:p + 16])
            self.tables[t] = (toff, tlen)
            p += 16
        head = self._table(b"head")
        if head is None or len(head) < 54:
            raise TrueTypeError("missing head")
        self.units_per_em = struct.unpack(">H", head[18:20])[0] or 1000
        self.loca_long = struct.unpack(">h", head[50:52])[0] == 1
        hhea = self._table(b"hhea")
        self.ascender = self.descender = None
        if hhea is not None and len(hhea) >= 8:
            self.ascender, self.descender = struct.unpack(">hh", hhea[4:8])
        maxp = self._table(b"maxp")
        self.num_glyphs = (
            struct.unpack(">H", maxp[4:6])[0] if maxp and len(maxp) >= 6 else 0
        )
        loca = self._table(b"loca")
        self.loca: List[int] = []
        if loca is not None:
            if self.loca_long:
                self.loca = list(struct.unpack(f">{len(loca) // 4}I", loca[:len(loca) // 4 * 4]))
            else:
                self.loca = [
                    v * 2 for v in struct.unpack(
                        f">{len(loca) // 2}H", loca[:len(loca) // 2 * 2])
                ]
        self.glyf = self._table(b"glyf")
        self._cmap = self._parse_cmap()
        self._outline_cache: Dict[int, List[List[Tuple[float, float, bool]]]] = {}

    def _table(self, tag: bytes) -> Optional[bytes]:
        rec = self.tables.get(tag)
        if rec is None:
            return None
        off, ln = rec
        return self.data[off:off + ln]

    # --- cmap ---------------------------------------------------------------

    def _parse_cmap(self) -> Dict[int, int]:
        cm = self._table(b"cmap")
        if cm is None or len(cm) < 4:
            return {}
        (n,) = struct.unpack(">H", cm[2:4])
        subtables = []
        for i in range(n):
            p = 4 + i * 8
            if p + 8 > len(cm):
                break
            pid, eid, off = struct.unpack(">HHI", cm[p:p + 8])
            subtables.append((pid, eid, off))
        # preference: (3,10) full unicode > (3,1) BMP > (0,*) > (3,0)
        # symbol > (1,0) mac
        def rank(st):
            pid, eid, _ = st
            return {(3, 10): 0, (3, 1): 1}.get((pid, eid),
                                               2 if pid == 0 else
                                               3 if (pid, eid) == (3, 0) else
                                               4 if pid == 1 else 9)

        out: Dict[int, int] = {}
        for pid, eid, off in sorted(subtables, key=rank):
            try:
                m = self._parse_cmap_sub(cm, off)
            except (struct.error, IndexError):
                continue
            if m:
                if (pid, eid) == (3, 0):
                    # symbol cmap: codes live at 0xF000+code
                    m = {**m, **{k - 0xF000: v for k, v in m.items()
                                 if 0xF000 <= k <= 0xF0FF}}
                return m
        return out

    def _parse_cmap_sub(self, cm: bytes, off: int) -> Dict[int, int]:
        (fmt,) = struct.unpack(">H", cm[off:off + 2])
        out: Dict[int, int] = {}
        if fmt == 0:
            for code in range(256):
                gid = cm[off + 6 + code]
                if gid:
                    out[code] = gid
        elif fmt == 4:
            segx2 = struct.unpack(">H", cm[off + 6:off + 8])[0]
            seg = segx2 // 2
            ends = struct.unpack(f">{seg}H", cm[off + 14:off + 14 + segx2])
            sp = off + 16 + segx2
            starts = struct.unpack(f">{seg}H", cm[sp:sp + segx2])
            dp = sp + segx2
            deltas = struct.unpack(f">{seg}h", cm[dp:dp + segx2])
            rp = dp + segx2
            ranges = struct.unpack(f">{seg}H", cm[rp:rp + segx2])
            for i in range(seg):
                for code in range(starts[i], min(ends[i], 0xFFFE) + 1):
                    if ranges[i] == 0:
                        gid = (code + deltas[i]) & 0xFFFF
                    else:
                        gp = rp + i * 2 + ranges[i] + (code - starts[i]) * 2
                        if gp + 2 > len(cm):
                            continue
                        (gid,) = struct.unpack(">H", cm[gp:gp + 2])
                        if gid:
                            gid = (gid + deltas[i]) & 0xFFFF
                    if gid:
                        out[code] = gid
        elif fmt == 6:
            first, count = struct.unpack(">HH", cm[off + 6:off + 10])
            gids = struct.unpack(f">{count}H", cm[off + 10:off + 10 + count * 2])
            for i, gid in enumerate(gids):
                if gid:
                    out[first + i] = gid
        elif fmt == 12:
            (ngroups,) = struct.unpack(">I", cm[off + 12:off + 16])
            p = off + 16
            for _ in range(min(ngroups, 100_000)):
                s, e, g = struct.unpack(">III", cm[p:p + 12])
                for c in range(s, min(e, s + 0xFFFF) + 1):
                    out[c] = g + (c - s)
                p += 12
        return out

    def glyph_id(self, codepoint: int) -> Optional[int]:
        return self._cmap.get(codepoint)

    # --- outlines -----------------------------------------------------------

    def glyph_outline(
        self, gid: int, _depth: int = 0
    ) -> List[List[Tuple[float, float, bool]]]:
        """Contours of glyph ``gid`` in font units: each a list of
        (x, y, on_curve) points. Composites resolved (offset-only and
        2x2-scaled components)."""
        if gid in self._outline_cache:
            return self._outline_cache[gid]
        if (self.glyf is None or gid + 1 >= len(self.loca) or _depth > 4):
            return []
        start, end = self.loca[gid], self.loca[gid + 1]
        if end <= start or end > len(self.glyf):
            return []  # empty glyph (e.g. space)
        g = self.glyf[start:end]
        (ncont,) = struct.unpack(">h", g[:2])
        if ncont >= 0:
            contours = self._simple_glyph(g, ncont)
        else:
            contours = self._composite_glyph(g, _depth)
        self._outline_cache[gid] = contours
        return contours

    def _simple_glyph(self, g: bytes, ncont: int):
        end_pts = struct.unpack(f">{ncont}H", g[10:10 + ncont * 2])
        n_pts = (end_pts[-1] + 1) if ncont else 0
        p = 10 + ncont * 2
        (ilen,) = struct.unpack(">H", g[p:p + 2])
        p += 2 + ilen
        flags: List[int] = []
        while len(flags) < n_pts:
            f = g[p]
            p += 1
            flags.append(f)
            if f & 8:  # repeat
                r = g[p]
                p += 1
                flags.extend([f] * r)
        flags = flags[:n_pts]
        xs: List[int] = []
        x = 0
        for f in flags:
            if f & 2:
                dx = g[p]
                p += 1
                x += dx if f & 16 else -dx
            elif not (f & 16):
                (dx,) = struct.unpack(">h", g[p:p + 2])
                p += 2
                x += dx
            xs.append(x)
        ys: List[int] = []
        y = 0
        for f in flags:
            if f & 4:
                dy = g[p]
                p += 1
                y += dy if f & 32 else -dy
            elif not (f & 32):
                (dy,) = struct.unpack(">h", g[p:p + 2])
                p += 2
                y += dy
            ys.append(y)
        contours = []
        s = 0
        for e in end_pts:
            contours.append([
                (float(xs[i]), float(ys[i]), bool(flags[i] & 1))
                for i in range(s, e + 1)
            ])
            s = e + 1
        return contours

    def _composite_glyph(self, g: bytes, depth: int):
        contours = []
        p = 10
        while True:
            flags, gi = struct.unpack(">HH", g[p:p + 4])
            p += 4
            if flags & 1:  # ARG_1_AND_2_ARE_WORDS
                a, b = struct.unpack(">hh", g[p:p + 4])
                p += 4
            else:
                a, b = struct.unpack(">bb", g[p:p + 2])
                p += 2
            xx = yy = 1.0
            xy = yx = 0.0
            if flags & 8:  # WE_HAVE_A_SCALE
                (sc,) = struct.unpack(">h", g[p:p + 2])
                xx = yy = sc / 16384.0
                p += 2
            elif flags & 0x40:  # X_AND_Y_SCALE
                sx, sy = struct.unpack(">hh", g[p:p + 4])
                xx, yy = sx / 16384.0, sy / 16384.0
                p += 4
            elif flags & 0x80:  # 2x2
                m = struct.unpack(">hhhh", g[p:p + 8])
                xx, xy, yx, yy = (v / 16384.0 for v in m)
                p += 8
            dx, dy = (float(a), float(b)) if flags & 2 else (0.0, 0.0)
            for cont in self.glyph_outline(gi, depth + 1):
                contours.append([
                    (x * xx + y * yx + dx, x * xy + y * yy + dy, on)
                    for (x, y, on) in cont
                ])
            if not (flags & 0x20):  # MORE_COMPONENTS
                break
        return contours


def _flatten_contour(
    cont: List[Tuple[float, float, bool]], steps: int = 4
) -> List[Tuple[float, float]]:
    """Quadratic B-spline contour -> closed polyline. Implied on-curve
    midpoints between consecutive off-curve points (TrueType rule)."""
    if not cont:
        return []
    # rotate so the contour starts on-curve (or synthesize a midpoint)
    pts = list(cont)
    if not pts[0][2]:
        on_idx = next((i for i, p in enumerate(pts) if p[2]), None)
        if on_idx is None:
            # all off-curve: start at midpoint of last/first
            mx = (pts[0][0] + pts[-1][0]) / 2
            my = (pts[0][1] + pts[-1][1]) / 2
            pts = [(mx, my, True)] + pts
        else:
            pts = pts[on_idx:] + pts[:on_idx]
    out: List[Tuple[float, float]] = [(pts[0][0], pts[0][1])]
    i = 1
    n = len(pts)
    cur = (pts[0][0], pts[0][1])
    while i <= n:
        px, py, on = pts[i % n]
        if on:
            out.append((px, py))
            cur = (px, py)
            i += 1
            continue
        # off-curve control: end point is next on-curve or implied mid
        nx, ny, non = pts[(i + 1) % n]
        if not non:
            nx, ny = (px + nx) / 2, (py + ny) / 2
            i += 1
        else:
            i += 2
        c0 = cur
        for s in range(1, steps + 1):
            t = s / steps
            mt = 1 - t
            out.append((
                mt * mt * c0[0] + 2 * mt * t * px + t * t * nx,
                mt * mt * c0[1] + 2 * mt * t * py + t * t * ny,
            ))
        cur = (nx, ny)
    return out


def rasterize_glyph(font: TrueTypeFont, gid: int, w_px: int, h_px: int,
                    baseline_units: Optional[float] = None):
    """Non-zero-winding scanline fill of glyph ``gid`` into a (h_px,
    w_px) uint8 mask (0/255). The em square maps to the pixel box:
    y = baseline_units (default hhea descender) sits at the bottom."""
    import numpy as np

    contours = font.glyph_outline(gid)
    if not contours or w_px <= 0 or h_px <= 0:
        return None
    upem = float(font.units_per_em)
    desc = (float(font.descender) if font.descender is not None
            else -0.2 * upem)
    if baseline_units is not None:
        desc = baseline_units
    sy = h_px / upem
    sx = sy  # uniform em scaling; advance differences live in the box
    polys = []
    for cont in contours:
        poly = _flatten_contour(cont)
        if len(poly) >= 3:
            # font units (y up, baseline 0) -> pixel coords (y down)
            polys.append([
                (x * sx, h_px - (y - desc) * sy) for (x, y) in poly
            ])
    if not polys:
        return None
    mask = np.zeros((h_px, w_px), dtype=np.uint8)
    # scanline non-zero winding at pixel centers
    edges = []
    for poly in polys:
        for i in range(len(poly)):
            x0, y0 = poly[i]
            x1, y1 = poly[(i + 1) % len(poly)]
            if y0 != y1:
                edges.append((x0, y0, x1, y1))
    if not edges:
        return None
    for row in range(h_px):
        yc = row + 0.5
        crossings = []
        for (x0, y0, x1, y1) in edges:
            if (y0 <= yc < y1) or (y1 <= yc < y0):
                t = (yc - y0) / (y1 - y0)
                crossings.append((x0 + t * (x1 - x0), 1 if y1 > y0 else -1))
        if not crossings:
            continue
        crossings.sort()
        winding = 0
        spans = []
        span_start = None
        for x, w in crossings:
            prev = winding
            winding += w
            if prev == 0 and winding != 0:
                span_start = x
            elif prev != 0 and winding == 0 and span_start is not None:
                spans.append((span_start, x))
                span_start = None
        for xa, xb in spans:
            a = max(0, int(np.ceil(xa - 0.5)))
            b = min(w_px - 1, int(np.floor(xb - 0.5)))
            if b >= a:
                mask[row, a:b + 1] = 255
    return mask
