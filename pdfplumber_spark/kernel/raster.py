"""From-scratch RGB rasterizer + PNG encoder for the visual debug surface
(reference: ``/root/reference/pdfplumber/display.py``, which delegates to
PIL/pypdfium2 — neither exists in this environment, so the canvas, the
alpha blending, and the PNG container are implemented here directly on
numpy + zlib).

Scope is the DEBUG rendering the reference's PageImage provides: object
boxes, rule lines, circles, and real blits of the rasters the engine can
pixel-decode (Flate/LZW/… and CCITT via kernel/images.py). Glyph
rasterization is NOT attempted (no font engine offline) — chars render as
structural boxes; documented divergence.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Sequence, Tuple

import numpy as np

RGBA = Tuple[int, int, int, int]


_NAMED_COLORS = {
    "red": (255, 0, 0), "green": (0, 128, 0), "blue": (0, 0, 255),
    "black": (0, 0, 0), "white": (255, 255, 255), "yellow": (255, 255, 0),
    "orange": (255, 165, 0), "purple": (128, 0, 128), "gray": (128, 128, 128),
    "grey": (128, 128, 128), "cyan": (0, 255, 255), "magenta": (255, 0, 255),
}


_COLOR_CACHE: dict = {}

_CH3 = np.arange(3)
_BLEND_LUTS: dict = {}


def _blend_lut(rgba: RGBA) -> np.ndarray:
    """(256, 3) uint8 table: lut[v, c] = the historical float blend of
    channel value v under ``rgba`` — np.clip(v*(1-a) + col*a + 0.5)."""
    lut = _BLEND_LUTS.get(rgba)
    if lut is None:
        a = rgba[3] / 255.0
        vals = np.repeat(
            np.arange(256, dtype=np.float32)[:, None], 3, axis=1
        )
        col = np.array(rgba[:3], dtype=np.float32)
        lut = np.clip(
            vals * (1.0 - a) + col * a + 0.5, 0, 255
        ).astype(np.uint8)
        if len(_BLEND_LUTS) < 1024:
            _BLEND_LUTS[rgba] = lut
    return lut


def _norm_color(color, default_alpha: int = 255) -> Optional[RGBA]:
    """(r,g,b) / (r,g,b,a) / PIL-style name / None -> RGBA or None."""
    if color is None:
        return None
    try:
        hit = _COLOR_CACHE.get((color, default_alpha))
    except TypeError:  # unhashable (e.g. list) — normalize uncached
        hit = None
    else:
        if hit is None:
            hit = _norm_color_uncached(color, default_alpha)
            if len(_COLOR_CACHE) < 4096:
                _COLOR_CACHE[(color, default_alpha)] = hit
        return hit
    return _norm_color_uncached(color, default_alpha)


def _norm_color_uncached(color, default_alpha: int) -> RGBA:
    if isinstance(color, str):
        named = _NAMED_COLORS.get(color.lower())
        if named is None:
            raise ValueError(f"unknown color name {color!r}")
        return named + (default_alpha,)
    c = tuple(int(v) for v in color)
    if len(c) == 3:
        return c + (default_alpha,)
    if len(c) == 4:
        return c
    raise ValueError(f"bad color {color!r}")


class Canvas:
    """(height, width, 3) uint8 RGB raster with alpha-blended drawing."""

    def __init__(self, width: int, height: int,
                 bg: Tuple[int, int, int] = (255, 255, 255)):
        self.width = int(width)
        self.height = int(height)
        self.arr = np.empty((self.height, self.width, 3), dtype=np.uint8)
        self.arr[:, :] = np.array(bg, dtype=np.uint8)
        self._axis_cache: dict = {}

    @property
    def size(self):
        """(width, height) — reference PIL.Image.size parity."""
        return (self.width, self.height)

    def copy(self) -> "Canvas":
        c = Canvas.__new__(Canvas)
        c.width, c.height = self.width, self.height
        c.arr = self.arr.copy()
        c._axis_cache = {}
        return c

    @property
    def size(self) -> Tuple[int, int]:
        """(width, height) — PIL Image.size parity for ported tests."""
        return (self.width, self.height)

    def __eq__(self, other) -> bool:  # content equality, like PIL images
        return (isinstance(other, Canvas)
                and self.size == other.size
                and bool((self.arr == other.arr).all()))

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)

    # --- low-level ---------------------------------------------------------

    def _clip_box(self, x0, y0, x1, y1):
        # math.floor/ceil, not np.floor/ceil: identical IEEE results on
        # python floats, ~10x less per-call overhead (stamp_mask runs
        # thousands of times per page render)
        import math

        ix0 = max(0, min(self.width, math.floor(min(x0, x1))))
        ix1 = max(0, min(self.width, math.ceil(max(x0, x1))))
        iy0 = max(0, min(self.height, math.floor(min(y0, y1))))
        iy1 = max(0, min(self.height, math.ceil(max(y0, y1))))
        return ix0, iy0, ix1, iy1

    def _blend_slice(self, ys, xs, rgba: RGBA) -> None:
        a = rgba[3] / 255.0
        if a <= 0:
            return
        if rgba[3] >= 255:
            # exact fast path: at a=1 the blend reduces to
            # clip(col + 0.5).astype(uint8) == col for integer col
            self.arr[ys, xs] = np.array(rgba[:3], dtype=np.uint8)
            return
        region = self.arr[ys, xs].astype(np.float32)
        col = np.array(rgba[:3], dtype=np.float32)
        self.arr[ys, xs] = np.clip(
            region * (1.0 - a) + col * a + 0.5, 0, 255
        ).astype(np.uint8)

    # --- shapes ------------------------------------------------------------

    def fill_rect(self, x0, y0, x1, y1, color) -> None:
        rgba = _norm_color(color)
        if rgba is None:
            return
        ix0, iy0, ix1, iy1 = self._clip_box(x0, y0, x1, y1)
        # zero-area boxes still mark one pixel row/col (visibility)
        ix1 = max(ix1, ix0 + 1) if ix0 < self.width else ix1
        iy1 = max(iy1, iy0 + 1) if iy0 < self.height else iy1
        if ix0 >= ix1 or iy0 >= iy1:
            return
        self._blend_slice(slice(iy0, iy1), slice(ix0, ix1), rgba)

    def fill_rects_batch(self, boxes, color) -> None:
        """One alpha blend over the union of many axis-aligned boxes —
        O(pixels + boxes) via a 2-D difference array instead of one
        Python slice-blend per box (the char-box layer of a structural
        page render is thousands of boxes)."""
        rgba = _norm_color(color)
        if rgba is None or not len(boxes):
            return
        b = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        ix0 = np.clip(np.floor(np.minimum(b[:, 0], b[:, 2])), 0,
                      self.width).astype(np.int64)
        ix1 = np.clip(np.ceil(np.maximum(b[:, 0], b[:, 2])), 0,
                      self.width).astype(np.int64)
        iy0 = np.clip(np.floor(np.minimum(b[:, 1], b[:, 3])), 0,
                      self.height).astype(np.int64)
        iy1 = np.clip(np.ceil(np.maximum(b[:, 1], b[:, 3])), 0,
                      self.height).astype(np.int64)
        # zero-area visibility rule (match fill_rect)
        ix1 = np.where((ix1 == ix0) & (ix0 < self.width), ix0 + 1, ix1)
        iy1 = np.where((iy1 == iy0) & (iy0 < self.height), iy0 + 1, iy1)
        keep = (ix1 > ix0) & (iy1 > iy0)
        if not keep.any():
            return
        ix0, ix1, iy0, iy1 = ix0[keep], ix1[keep], iy0[keep], iy1[keep]
        diff = np.zeros((self.height + 1, self.width + 1), dtype=np.int32)
        np.add.at(diff, (iy0, ix0), 1)
        np.add.at(diff, (iy0, ix1), -1)
        np.add.at(diff, (iy1, ix0), -1)
        np.add.at(diff, (iy1, ix1), 1)
        cov = np.cumsum(np.cumsum(diff, axis=0), axis=1)[
            : self.height, : self.width] > 0
        ys, xs = np.nonzero(cov)
        if len(ys):
            self._blend_slice(ys, xs, rgba)

    def stroke_rect(self, x0, y0, x1, y1, color, width: int = 1) -> None:
        rgba = _norm_color(color)
        if rgba is None:
            return
        w = max(1, int(width))
        self.fill_rect(x0, y0 - w + 1, x1, y0 + 1, rgba)          # top
        self.fill_rect(x0, y1, x1, y1 + w, rgba)                  # bottom
        self.fill_rect(x0 - w + 1, y0, x0 + 1, y1, rgba)          # left
        self.fill_rect(x1, y0, x1 + w, y1, rgba)                  # right

    def line(self, p0, p1, color, width: int = 1) -> None:
        rgba = _norm_color(color)
        if rgba is None:
            return
        x0, y0 = float(p0[0]), float(p0[1])
        x1, y1 = float(p1[0]), float(p1[1])
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.linspace(x0, x1, n)
        ys = np.linspace(y0, y1, n)
        half = (max(1, int(width)) - 1) / 2.0
        pts = set()
        for dx in range(-int(np.floor(half)), int(np.ceil(half)) + 1 or 1):
            for dy in range(-int(np.floor(half)), int(np.ceil(half)) + 1 or 1):
                for x, y in zip(xs, ys):
                    px, py = int(round(x + dx)), int(round(y + dy))
                    if 0 <= px < self.width and 0 <= py < self.height:
                        pts.add((py, px))
        if not pts:
            return
        idx = np.array(sorted(pts))
        self._blend_slice(idx[:, 0], idx[:, 1], rgba)

    def polyline(self, points: Sequence, color, width: int = 1) -> None:
        for a, b in zip(points, points[1:]):
            self.line(a, b, color, width)

    def ellipse(self, x0, y0, x1, y1, fill=None, stroke=None) -> None:
        frgba = _norm_color(fill)
        srgba = _norm_color(stroke)
        ix0, iy0, ix1, iy1 = self._clip_box(x0, y0, x1, y1)
        if ix0 >= ix1 or iy0 >= iy1:
            return
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = max((x1 - x0) / 2.0, 0.5), max((y1 - y0) / 2.0, 0.5)
        yy, xx = np.mgrid[iy0:iy1, ix0:ix1]
        d = ((xx + 0.5 - cx) / rx) ** 2 + ((yy + 0.5 - cy) / ry) ** 2
        if frgba is not None:
            ys, xs = np.nonzero(d <= 1.0)
            if len(ys):
                self._blend_slice(ys + iy0, xs + ix0, frgba)
        if srgba is not None:
            ring = (d <= 1.0) & (d >= (1.0 - 2.0 / max(rx, ry)))
            ys, xs = np.nonzero(ring)
            if len(ys):
                self._blend_slice(ys + iy0, xs + ix0, srgba)

    def _axis_indices(self, lo: int, hi: int, a0: float, a1: float,
                      s: int) -> np.ndarray:
        """Nearest-neighbour source indices for one stamp axis, memoized:
        every glyph on a text line shares the exact (lo, hi, a0, a1, s)
        vertical key, so the per-stamp cost collapses to a dict hit. The
        expression is kept OP-FOR-OP identical to the historical inline
        form (float associativity changes a last-ulp floor → a pixel →
        the pinned render hash)."""
        key = (lo, hi, a0, a1, s)
        cached = self._axis_cache.get(key)
        if cached is None:
            d = max(a1 - a0, 1e-9)
            if hi - lo <= 32:
                # small spans (glyph stamps): scalar loop beats numpy's
                # per-op dispatch. int() and .astype(int) both truncate
                # toward zero and python-float / numpy-float64 arithmetic
                # is the same IEEE sequence — results are bit-identical.
                top = s - 1
                cached = np.array(
                    [min(max(int((v + 0.5 - a0) / d * s), 0), top)
                     for v in range(lo, hi)],
                    dtype=np.int64,
                )
            else:
                cached = np.clip(
                    ((np.arange(lo, hi) + 0.5 - a0) / d * s).astype(int),
                    0, s - 1,
                )
            if len(self._axis_cache) > 4096:
                self._axis_cache.clear()
            self._axis_cache[key] = cached
        return cached

    def stamp_mask(self, mask: np.ndarray, x0, y0, x1, y1, color) -> None:
        """Nearest-neighbour scale a boolean mask into the box and blend
        ``color`` where True (glyph stamping)."""
        rgba = _norm_color(color)
        if rgba is None:
            return
        ix0, iy0, ix1, iy1 = self._clip_box(x0, y0, x1, y1)
        if ix0 >= ix1 or iy0 >= iy1 or mask.size == 0:
            return
        sh, sw = mask.shape
        sy = self._axis_indices(iy0, iy1, y0, y1, sh)
        sx = self._axis_indices(ix0, ix1, x0, x1, sw)
        sub = mask[sy[:, None], sx] != 0
        # blend in-place on the rectangular view — one boolean-mask store
        # instead of nonzero + two scattered fancy-index passes (the
        # glyph-stamp layer is thousands of small masks per page)
        region = self.arr[iy0:iy1, ix0:ix1]
        if rgba[3] >= 255:
            region[sub] = np.array(rgba[:3], dtype=np.uint8)
            return
        if rgba[3] <= 0:
            return
        # alpha blend via a per-color 256-entry LUT: the blend of a fixed
        # rgba depends only on the underlying channel value, so the float
        # formula runs 256x3 times at LUT build and never per-stamp —
        # bit-identical to the inline form by construction
        region[sub] = _blend_lut(rgba)[region[sub], _CH3]

    def blit(self, samples: np.ndarray, x0, y0, x1, y1) -> None:
        """Nearest-neighbour scale of a (h, w) gray or (h, w, 3) RGB
        sample array into the device-space box."""
        ix0, iy0, ix1, iy1 = self._clip_box(x0, y0, x1, y1)
        if ix0 >= ix1 or iy0 >= iy1 or samples.size == 0:
            return
        sh, sw = samples.shape[:2]
        # map each destination pixel back to a source pixel
        dys = np.arange(iy0, iy1)
        dxs = np.arange(ix0, ix1)
        sy = np.clip(((dys + 0.5 - y0) / max(y1 - y0, 1e-9) * sh).astype(int),
                     0, sh - 1)
        sx = np.clip(((dxs + 0.5 - x0) / max(x1 - x0, 1e-9) * sw).astype(int),
                     0, sw - 1)
        src = samples[np.ix_(sy, sx)]
        if src.ndim == 2:
            src = np.repeat(src[:, :, None], 3, axis=2)
        self.arr[iy0:iy1, ix0:ix1] = src.astype(np.uint8)


def png_encode(arr: np.ndarray) -> bytes:
    """Minimal spec-compliant PNG: 8-bit RGB, filter 0, one IDAT."""
    h, w = arr.shape[:2]
    raw = b"".join(
        b"\x00" + arr[r].astype(np.uint8).tobytes() for r in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return (struct.pack(">I", len(data)) + c
                + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def png_decode_size(png: bytes) -> Tuple[int, int]:
    """(width, height) from a PNG header — the test-side sanity parser."""
    if png[:8] != b"\x89PNG\r\n\x1a\n" or png[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", png[16:24])
    return w, h
