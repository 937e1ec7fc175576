"""Image XObject pixel decode (reference: pdfplumber's image handling in
``page.py`` + ``display.py``, which delegates pixel access to PIL/pypdfium2;
here the non-DCT path is implemented from scratch on the PDF stream-filter
machinery of ``pdfparse.py``).

Supported for REAL decode: 8-bit DeviceRGB / DeviceGray samples behind any
of the engine's stream filters (Flate incl. PNG predictors, LZW, A85, AHx,
RL) — i.e. everything except the entropy-coded raster families. DCT (JPEG)
/ JPX / CCITT stay classified as ``unsupported``: decoding them needs an
imaging library that is not in this container; the classification and the
stream plumbing are real, the entropy decode is the documented stub.
"""

from __future__ import annotations

from typing import List, Optional

from .pdfparse import PDFDocument, StreamObj

# filters whose output is still entropy-coded raster data, not raw samples
_UNSUPPORTED_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode",
                        "JBIG2Decode"}

_CHANNELS = {"DeviceRGB": 3, "CalRGB": 3, "DeviceGray": 1, "CalGray": 1}


def image_xobjects(data: bytes, password: str = "") -> List[dict]:
    """All page-resource image XObjects of a PDF, with decoded sample bytes
    where the format is supported.

    Returns one dict per image: ``page_number``, ``image_index`` (position
    in the page's sorted resource names — deterministic), ``name``,
    ``width``, ``height``, ``bits``, ``colorspace``, ``channels``,
    ``status`` ('ok' | 'unsupported'), and for ok images ``samples`` —
    raw interleaved row-major 8-bit bytes (width*height*channels)."""
    doc = PDFDocument(data, password=password)
    out: List[dict] = []
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


def _decode_one(doc: PDFDocument, xo: StreamObj) -> dict:
    width = int(doc.resolve(xo.attrs.get("Width", 0)) or 0)
    height = int(doc.resolve(xo.attrs.get("Height", 0)) or 0)
    bits = int(doc.resolve(xo.attrs.get("BitsPerComponent", 0)) or 0)
    cs = doc.resolve(xo.attrs.get("ColorSpace"))
    cs_name = str(cs) if cs is not None else ""
    channels: Optional[int] = _CHANNELS.get(cs_name)
    row = {
        "width": width,
        "height": height,
        "bits": bits,
        "colorspace": cs_name or None,
        "channels": channels,
        "samples": None,
        "status": "unsupported",
    }
    filters = _filter_names(doc, xo)
    if any(f in _UNSUPPORTED_FILTERS for f in filters):
        return row
    if channels is None or bits != 8 or width <= 0 or height <= 0:
        return row
    if bool(doc.resolve(xo.attrs.get("ImageMask", False))):
        return row
    try:
        data = xo.get_data(doc)
    except Exception:  # noqa: BLE001 — broken stream
        row["status"] = "error"
        return row
    need = width * height * channels
    if len(data) < need:
        row["status"] = "error"
        return row
    row["samples"] = bytes(data[:need])
    row["status"] = "ok"
    return row
