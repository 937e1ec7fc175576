"""Image XObject pixel decode (reference: pdfplumber's image handling in
``page.py`` + ``display.py``, which delegates pixel access to PIL/pypdfium2;
here the non-DCT path is implemented from scratch on the PDF stream-filter
machinery of ``pdfparse.py``).

Supported for REAL decode: 1/2/4/8-bit DeviceGray, 8-bit DeviceRGB,
8-bit DeviceCMYK (native 4-channel samples; consumers convert),
Indexed(DeviceRGB/DeviceGray) palettes at any of those index widths —
row-padded MSB-first sample layout per ISO 32000 §8.9.5.2 — behind any of
the engine's stream filters (Flate incl. PNG predictors, LZW, A85, AHx,
RL), plus CCITT Group 3/4 fax (``kernel/ccitt.py``: K < 0, K = 0 and
mixed K > 0; ImageMask stencils included), baseline+progressive JPEG
(``kernel/jpeg.py``, SOF0/SOF2), arithmetic JBIG2 generic regions
(``kernel/jbig2.py`` — generic incl. T.6 MMR, symbol-dictionary +
text regions + refinement + halftone since round 7), JPEG 2000 (``kernel/jpx.py``, T.800 Part 1:
5/3 + 9/7 wavelets, all progression orders, tiles), and since round 7
CMYK / YCCK JPEG (Adobe APP14 transforms, libjpeg-pinned sign
convention), the full JPX code-block style matrix + precinct
partitions + component subsampling, and WEBP VP8L. Remaining
``unsupported``: JBIG2 huffman mode, lossy-VP8 WEBP, and the JPX
precinct x position-order combination — each raises in its kernel and
classifies here.
"""

from __future__ import annotations

from typing import List, Optional

from .pdfparse import PDFDocument, StreamObj

# filters whose output is still entropy-coded raster data, not raw
# samples. The set emptied over rounds 5-6 as kernels landed: CCITT
# (ccitt.py), DCT (jpeg.py), JBIG2 (jbig2.py), and finally JPX
# (jpx.py). Undecodable FEATURE subsets (JBIG2 halftone regions, JPX
# precinct partitions, ...) raise inside their kernel and classify
# 'unsupported' per-stream below.
_UNSUPPORTED_FILTERS: set = set()

_CHANNELS = {"DeviceRGB": 3, "CalRGB": 3, "DeviceGray": 1, "CalGray": 1,
             "DeviceCMYK": 4}


def image_xobjects(data: bytes, password: str = "") -> List[dict]:
    """Painted image XObjects of a PDF in CONTENT-STREAM PAINT ORDER —
    one row per ``Do`` invocation, Form-XObject-nested paints included —
    matching the reference's ``page.images`` semantics (``page.py``): a
    page that paints one XObject twice yields two rows. Pixel decode per
    paint where the format is supported.

    Returns one dict per paint: ``page_number``, ``image_index``
    (0-based paint position within the page), ``name``, ``width``,
    ``height``, ``bits``, ``colorspace``, ``channels``, ``status``
    ('ok' | 'unsupported' | 'error'), and for ok images ``samples`` —
    raw interleaved row-major 8-bit bytes (width*height*channels).

    Falls back to sorted-resource-name enumeration when the content
    streams don't interpret (a paint-order walk needs them)."""
    from .pdfparse import parse_pdf

    interps = parse_pdf(data, style=False, password=password)
    out: List[dict] = []
    if interps:
        for it in interps:
            idx = 0
            for rec, xo in zip(it.images, it.image_objs):
                row = _decode_one(it.doc, xo)
                row.update(
                    page_number=it.page_number, image_index=idx,
                    name=str(rec[0]),
                )
                out.append(row)
                idx += 1
        return out
    # fallback: resource-dict enumeration (uninterpretable content streams)
    doc = PDFDocument(data, password=password)
    for pno, spec in enumerate(doc.pages(), start=1):
        res = doc.resolve(spec.get("Resources")) or {}
        xdict = doc.resolve(res.get("XObject")) or {}
        if not isinstance(xdict, dict):
            continue
        idx = 0
        for name in sorted(xdict):
            xo = doc.resolve(xdict[name])
            if not isinstance(xo, StreamObj):
                continue
            if str(doc.resolve(xo.attrs.get("Subtype", ""))) != "Image":
                continue
            row = _decode_one(doc, xo)
            row.update(page_number=pno, image_index=idx, name=str(name))
            out.append(row)
            idx += 1
    return out


def _filter_names(doc: PDFDocument, xo: StreamObj) -> List[str]:
    f = doc.resolve(xo.attrs.get("Filter"))
    if f is None:
        return []
    if isinstance(f, list):
        return [str(doc.resolve(v)) for v in f]
    return [str(f)]


def _unpack_rows(data: bytes, width: int, height: int, channels: int,
                 bits: int) -> Optional[bytes]:
    """PDF image sample layout -> one byte per sample value.

    Rows are padded to byte boundaries (ISO 32000 §8.9.5.2); sub-byte
    samples pack MSB-first. Returned values are the RAW sample codes
    (0..2^bits-1) — for sub-byte gray the stats operator reports code
    statistics, with ``bits`` in the row so the domain is unambiguous."""
    import numpy as np

    row_bytes = (width * channels * bits + 7) // 8
    if len(data) < row_bytes * height:
        return None
    if bits == 8:
        if row_bytes == width * channels:
            return bytes(data[: width * height * channels])
        arr = np.frombuffer(
            data[: row_bytes * height], np.uint8
        ).reshape(height, row_bytes)
        return bytes(arr[:, : width * channels].tobytes())
    arr = np.frombuffer(data[: row_bytes * height], np.uint8).reshape(
        height, row_bytes
    )
    bitarr = np.unpackbits(arr, axis=1)  # (height, row_bytes*8), MSB-first
    n_samples = width * channels
    vals = bitarr[:, : n_samples * bits].reshape(height, n_samples, bits)
    weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint8)
    out = (vals * weights).sum(axis=2).astype(np.uint8)
    return bytes(out.tobytes())


def _resolve_colorspace(doc: PDFDocument, cs):
    """-> (display_name, channels, palette_or_None). Palette rows are
    base-colorspace tuples; Indexed output expands through it."""
    cs = doc.resolve(cs)
    if cs is None:
        return None, None, None
    if isinstance(cs, list) and cs and str(doc.resolve(cs[0])) in (
        "Indexed", "I"
    ):
        base = str(doc.resolve(cs[1])) if len(cs) > 1 else ""
        base_ch = _CHANNELS.get(base)
        lookup = doc.resolve(cs[3]) if len(cs) > 3 else None
        if isinstance(lookup, StreamObj):
            try:
                lookup = lookup.get_data(doc)
            except Exception:  # noqa: BLE001
                lookup = None
        if isinstance(lookup, str):
            lookup = lookup.encode("latin-1", "replace")
        if base_ch is None or not isinstance(lookup, (bytes, bytearray)):
            return f"Indexed({base})", None, None
        return f"Indexed({base})", base_ch, bytes(lookup)
    name = str(cs)
    return name, _CHANNELS.get(name), None


def _decode_one(doc: PDFDocument, xo: StreamObj) -> dict:
    width = int(doc.resolve(xo.attrs.get("Width", 0)) or 0)
    height = int(doc.resolve(xo.attrs.get("Height", 0)) or 0)
    bits = int(doc.resolve(xo.attrs.get("BitsPerComponent", 0)) or 0)
    cs_name, channels, palette = _resolve_colorspace(
        doc, xo.attrs.get("ColorSpace")
    )
    row = {
        "width": width,
        "height": height,
        "bits": bits,
        "colorspace": cs_name,
        "channels": channels,
        "samples": None,
        "status": "unsupported",
    }
    filters = _filter_names(doc, xo)
    if any(f in _UNSUPPORTED_FILTERS for f in filters):
        return row
    if "JPXDecode" in filters:
        # JPEG 2000 (kernel/jpx.py). Per ISO 32000 §7.4.9 the codestream
        # is authoritative for dimensions/depth/colorspace — the image
        # dict MAY omit them all; only a NONZERO dict dim that disagrees
        # is an error (the DCT convention below).
        from .jpx import jpx_decode

        try:
            data = xo.get_data(doc)
            d = jpx_decode(bytes(data))
        except Exception:  # noqa: BLE001 — unsupported style / broken
            return row
        jw, jh, jc = d["width"], d["height"], d["n_components"]
        if (width and width != jw) or (height and height != jh):
            row["status"] = "error"
            return row
        row.update(
            width=jw, height=jh, bits=8, channels=jc,
            colorspace=row["colorspace"] or ("DeviceRGB" if jc == 3
                                             else "DeviceGray"),
            samples=d["samples"].tobytes(), status="ok",
        )
        return row
    if any(f in ("DCTDecode", "DCT") for f in filters):
        # baseline JPEG (kernel/jpeg.py); earlier chain filters (e.g.
        # Flate around the JPEG payload, issue-203) already applied by
        # get_data, which passes the DCT payload through raw
        from .jpeg import JPEGError, jpeg_decode

        try:
            data = xo.get_data(doc)
            d = jpeg_decode(bytes(data))
        except Exception:  # noqa: BLE001
            # progressive / CMYK / truncated / fake-JPEG payloads all
            # classify 'unsupported' (the oracle scanner cannot tell a
            # decodable DCT stream from an undecodable one)
            return row
        samples = d["samples"]
        jw, jh, jc = d["width"], d["height"], d["n_components"]
        # per-axis check, 0/missing = unspecified: real consumers trust
        # the SOF dimensions, so only a NONZERO dict dim that disagrees
        # with the SOF dim is an error (round-5 ADVICE: (jw, 0) with a
        # fine decode used to flag 'error')
        if (width and width != jw) or (height and height != jh):
            row["status"] = "error"  # dict/stream dimension mismatch
            return row
        row.update(
            width=jw, height=jh, bits=8, channels=jc,
            colorspace=row["colorspace"] or {
                1: "DeviceGray", 3: "DeviceRGB", 4: "DeviceCMYK",
            }.get(jc, "DeviceGray"),
            samples=samples.tobytes(), status="ok",
        )
        return row
    if bool(doc.resolve(xo.attrs.get("ImageMask", False))):
        # stencil mask: 1-bit, no colorspace; sample code 0 paints by
        # default (/Decode [0 1], ISO 32000 §8.9.6.2). Validated against
        # the 12 real-world Acrobat G4 masks in issue-203 (round 5).
        row.update(colorspace="ImageMask", channels=1, bits=1)
        cs_name, channels, palette, bits = "ImageMask", 1, None, 1
    if channels is None or bits not in (1, 2, 4, 8) or width <= 0 or height <= 0:
        return row
    try:
        data = xo.get_data(doc)
    except Exception as exc:  # noqa: BLE001 — broken stream
        from .jbig2 import JBIG2Error

        if isinstance(exc, JBIG2Error):
            return row  # unsupported JBIG2 region type (DCT-style)
        row["status"] = "error"
        return row
    # Indexed rasters carry ONE index sample per pixel regardless of the
    # base colorspace's channel count
    raw_channels = 1 if palette is not None else channels
    samples = _unpack_rows(data, width, height, raw_channels, bits)
    if samples is None:
        row["status"] = "error"
        return row
    if palette is not None:
        hival = len(palette) // channels - 1
        if hival < 0 or max(samples) > hival:
            row["status"] = "error"
            return row
        out = bytearray()
        for idx in samples:
            out += palette[idx * channels:(idx + 1) * channels]
        samples = bytes(out)
    row["samples"] = samples
    row["status"] = "ok"
    return row
