"""Standalone image-FILE decode from scratch (round-6: replaces the last
multimodal stub). Reference analogue: PIL-backed decode in the reference's
``display.py:36-90``; here the engine's own codecs do the work:

- PNG (ISO/IEC 15948): chunk walk, zlib-inflated IDAT, per-row filter
  reconstruction (the same five filters as PDF's PNG predictors —
  ``kernel/pdfparse._png_predictor`` is reused verbatim), PLTE palette
  expansion. 8-bit depth, color types 0/2/3/4/6, non-interlaced.
- JPEG (ITU T.81 baseline): ``kernel/jpeg.py``.

Adam7 interlace, 16-bit/sub-byte PNG depths, progressive JPEG, GIF and
WEBP classify ``unsupported`` (UnsupportedImageError); structurally broken
payloads of a recognized format raise ``ImageFileError`` (-> 'error').
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np


class ImageFileError(Exception):
    """Recognized format, broken payload -> status 'error'."""


class UnsupportedImageError(Exception):
    """Format/feature without a from-scratch decoder -> 'unsupported'."""


def sniff_format(data: bytes) -> str:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:5] == b"%PDF-":
        return "pdf"
    return "unknown"


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_file_decode(data: bytes) -> dict:
    """Decode a PNG file to ``{format, width, height, channels, samples}``
    (samples: uint8 H×W×C ndarray; palette images expand to RGB)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ImageFileError("bad PNG signature")
    pos = 8
    width = height = None
    bitdepth = colortype = interlace = None
    idat = bytearray()
    plte: Optional[bytes] = None
    n = len(data)
    while pos + 8 <= n:
        (clen,) = struct.unpack(">I", data[pos:pos + 4])
        ctag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ImageFileError("truncated chunk")
        pos += 8 + clen + 4  # skip CRC (tolerated like most viewers)
        if ctag == b"IHDR":
            if clen != 13:
                raise ImageFileError("bad IHDR length")
            width, height, bitdepth, colortype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0:
                raise ImageFileError("bad IHDR compression/filter method")
        elif ctag == b"PLTE":
            plte = bytes(body)
        elif ctag == b"IDAT":
            idat += body
        elif ctag == b"IEND":
            break
    if width is None:
        raise ImageFileError("missing IHDR")
    if interlace != 0:
        raise UnsupportedImageError("Adam7 interlace")
    if bitdepth != 8:
        raise UnsupportedImageError(f"bit depth {bitdepth}")
    channels = _PNG_CHANNELS.get(colortype)
    if channels is None:
        raise ImageFileError(f"bad color type {colortype}")
    if width <= 0 or height <= 0 or width * height > 64_000_000:
        raise ImageFileError("bad dimensions")
    if not idat:
        raise ImageFileError("missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ImageFileError(f"IDAT inflate: {e}") from e
    row_bytes = width * channels
    if len(raw) != height * (1 + row_bytes):
        raise ImageFileError("IDAT size mismatch")
    # the five PNG row filters == PDF's PNG predictors; reuse the engine's
    # reconstruction (pdfparse._png_predictor walks filter-byte + row)
    from .pdfparse import _png_predictor

    flat = _png_predictor(raw, width, channels, 8)
    if len(flat) != height * row_bytes:
        raise ImageFileError("filter reconstruction size mismatch")
    arr = np.frombuffer(flat, dtype=np.uint8).reshape(height, width, channels)
    if colortype == 3:
        if plte is None:
            raise ImageFileError("palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8)
        if len(pal) % 3:
            raise ImageFileError("bad PLTE length")
        pal = pal.reshape(-1, 3)
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ImageFileError("palette index out of range")
        arr = pal[idx]
        channels = 3
    return {
        "format": "png", "width": int(width), "height": int(height),
        "channels": int(channels), "samples": arr,
    }


def jpeg_file_decode(data: bytes) -> dict:
    from .jpeg import JPEGError, jpeg_decode

    try:
        d = jpeg_decode(data)
    except JPEGError as e:
        # jpeg_decode wraps every malformed-structure error; distinguish
        # the documented not-implemented classes (progressive etc.)
        msg = str(e).lower()
        if "unsupported" in msg or "progressive" in msg:
            raise UnsupportedImageError(str(e)) from e
        raise ImageFileError(str(e)) from e
    return {
        "format": "jpeg", "width": int(d["width"]),
        "height": int(d["height"]), "channels": int(d["n_components"]),
        "samples": d["samples"],
    }


def png_file_encode(
    arr: np.ndarray,
    palette: Optional[list] = None,
    filter_type: int = 0,
) -> bytes:
    """Encode uint8 pixels as a spec-compliant PNG (8-bit depth).

    ``arr`` H×W (gray; or palette indices when ``palette`` given),
    H×W×2 (gray+alpha), H×W×3 (RGB) or H×W×4 (RGBA). ``filter_type``
    0-4 applies that forward filter to every row, so decoders exercise
    all five reconstruction paths."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        ch = 1
        colortype = 3 if palette is not None else 0
        flat = arr.reshape(h, w, 1)
    else:
        h, w, ch = arr.shape
        colortype = {2: 4, 3: 2, 4: 6}[ch]
        flat = arr
    bpp = ch
    out_rows = []
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        raw = flat[r].reshape(-1).astype(np.int16)
        left = np.concatenate([np.zeros(bpp, dtype=np.int16),
                               raw[:-bpp] if len(raw) > bpp else []])
        up = prev.astype(np.int16)
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int16),
                                 up[:-bpp] if len(up) > bpp else []])
        if filter_type == 0:
            enc = raw
        elif filter_type == 1:
            enc = raw - left
        elif filter_type == 2:
            enc = raw - up
        elif filter_type == 3:
            enc = raw - ((left + up) >> 1)
        elif filter_type == 4:
            p = left + up - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - up),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, upleft))
            enc = raw - pred
        else:
            raise ValueError(f"bad filter type {filter_type}")
        out_rows.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = flat[r].reshape(-1)
    raw_stream = b"".join(out_rows)

    def chunk(tag: bytes, body: bytes) -> bytes:
        c = tag + body
        return (struct.pack(">I", len(body)) + c
                + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    parts = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    if palette is not None:
        parts.append(chunk(
            b"PLTE", b"".join(bytes(rgb) for rgb in palette)
        ))
    parts.append(chunk(b"IDAT", zlib.compress(raw_stream, 6)))
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts)


def decode_image(data: bytes) -> dict:
    """Sniff + decode a standalone image file. Raises
    ``UnsupportedImageError`` for formats/features without a decoder and
    ``ImageFileError`` for broken payloads of a recognized format."""
    fmt = sniff_format(data)
    if fmt == "png":
        return png_file_decode(data)
    if fmt == "jpeg":
        return jpeg_file_decode(data)
    raise UnsupportedImageError(f"no decoder for format={fmt}")
