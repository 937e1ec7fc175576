"""Deterministic synthetic pages corpus (input_hint schema, FIXTURES.md §1).

Generates the Iceberg-style ``pages(url, warc_ts, html binary, text, lang)``
table as parquet. Families stress specific reference behaviors:

- ``pdf/basic``         single-column ltr text
- ``pdf/layout``        numbered transcript layout (layout=True pins)
- ``pdf/table-lattice`` ruled grid tables (lines strategies)
- ``pdf/table-stream``  unruled aligned columns (text strategy)
- ``pdf/dupchars``      double-painted chars (dedupe)
- ``pdf/mega``          one many-page document (skew fixture)
- ``pdf/images``        embedded Flate/DCT raster XObjects (pixel decode)
- ``image/file``        standalone PNG/JPEG payloads (imagefile decode)
- ``html/news``         main content in nav/footer boilerplate
- ``broken``            truncated payloads (error-row path)

Everything is seeded — same args, byte-identical corpus.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator, List, Tuple

from ..kernel.pdfgen import glyph_width, make_pdf

# bump when generated content changes — cache paths embed this
CORPUS_VERSION = 26

LOREM = (
    "the quick brown fox jumps over a lazy dog while bright vixens watch "
    "jaded zebras vex my grand sphinx of black quartz and judge the vow "
    "pack my box with five dozen liquor jugs as daft zebras quickly moved"
).split()


def _sentence(rng: random.Random, n: int) -> str:
    ws = [rng.choice(LOREM) for _ in range(n)]
    return " ".join(ws)


def _wrap_text(rng: random.Random, n_lines: int, width_chars: int = 70) -> List[str]:
    lines = []
    for _ in range(n_lines):
        line = _sentence(rng, rng.randint(6, 11))
        lines.append(line[:width_chars])
    return lines


def _pdf_basic(rng: random.Random, n_pages: int) -> bytes:
    pages = []
    for _ in range(n_pages):
        texts = []
        top = 72.0
        for line in _wrap_text(rng, rng.randint(10, 30)):
            texts.append({"x": 72.0, "top": top, "size": 12, "text": line})
            top += 14.5
        page = {"width": 612, "height": 792, "texts": texts}
        r = rng.random()
        if r < 0.2:
            page["tagged"] = True  # Tagged PDF: flat Document/P tree
        elif r < 0.4:
            page["tagged"] = "rich"  # nested Sect + RoleMap'd Heading->H1
        if rng.random() < 0.5:
            page["links"] = [
                {
                    "x0": 72.0, "top": 72.0, "x1": 200.0, "bottom": 86.0,
                    "uri": f"https://example.com/{rng.choice(LOREM)}",
                }
            ]
        pages.append(page)
    return make_pdf(pages)


def _pdf_layout(rng: random.Random, n_pages: int) -> bytes:
    """Transcript-like: line numbers in a left gutter + indented prose."""
    pages = []
    for _ in range(n_pages):
        texts = []
        top = 80.0
        for i in range(1, rng.randint(15, 25)):
            texts.append({"x": 90.0, "top": top, "size": 12, "text": str(i)})
            texts.append(
                {"x": 130.0 + (i % 3) * 18.0, "top": top, "size": 12,
                 "text": _sentence(rng, rng.randint(4, 8))}
            )
            top += 24.0
        pages.append({"width": 612, "height": 792, "texts": texts})
    return make_pdf(pages)


def _pdf_table_lattice(rng: random.Random, n_pages: int) -> bytes:
    pages = []
    for _ in range(n_pages):
        nx, ny = rng.randint(3, 5), rng.randint(3, 7)
        x0, top, cw, rh = 72.0, 100.0, 100.0, 26.0
        lines = []
        for i in range(nx + 1):
            x = x0 + i * cw
            lines.append({"x0": x, "top": top, "x1": x, "bottom": top + ny * rh})
        for j in range(ny + 1):
            y = top + j * rh
            lines.append({"x0": x0, "top": y, "x1": x0 + nx * cw, "bottom": y})
        texts = []
        for i in range(nx):
            for j in range(ny):
                texts.append(
                    {
                        "x": x0 + i * cw + 4.0,
                        "top": top + j * rh + 5.0,
                        "size": 10,
                        "text": f"c{j}{i} " + rng.choice(LOREM),
                    }
                )
        # some prose below the table
        ptop = top + ny * rh + 30.0
        for line in _wrap_text(rng, 5):
            texts.append({"x": 72.0, "top": ptop, "size": 12, "text": line})
            ptop += 14.5
        pages.append(
            {"width": 612, "height": 792, "texts": texts, "lines": lines}
        )
    return make_pdf(pages)


def _pdf_table_stream(rng: random.Random, n_pages: int) -> bytes:
    """Unruled aligned columns -> text strategy."""
    pages = []
    for _ in range(n_pages):
        texts = []
        cols = [72.0, 220.0, 360.0, 480.0]
        top = 110.0
        for j in range(rng.randint(5, 10)):
            for i, cx in enumerate(cols):
                texts.append(
                    {"x": cx, "top": top, "size": 10,
                     "text": f"r{j}c{i}" if i else rng.choice(LOREM)}
                )
            top += 18.0
        pages.append({"width": 612, "height": 792, "texts": texts})
    return make_pdf(pages)


def _pdf_dupchars(rng: random.Random, n_pages: int) -> bytes:
    pages = []
    for _ in range(n_pages):
        texts = []
        top = 72.0
        for line in _wrap_text(rng, 8):
            texts.append({"x": 72.0, "top": top, "size": 12, "text": line})
            # double paint with sub-tolerance offset (bold simulation)
            texts.append({"x": 72.4, "top": top, "size": 12, "text": line})
            top += 16.0
        pages.append({"width": 612, "height": 792, "texts": texts})
    return make_pdf(pages)


def _pdf_rotated(rng: random.Random) -> bytes:
    rot = rng.choice([90, 180, 270])
    texts = []
    top = 72.0
    for line in _wrap_text(rng, 8):
        texts.append({"x": 72.0, "top": top, "size": 12, "text": line})
        top += 16.0
    return make_pdf([{"width": 612, "height": 792, "rotate": rot, "texts": texts}])


def _pdf_ligatures(rng: random.Random) -> bytes:
    lig_words = ["ﬁnish", "ﬂood", "oﬀer", "eﬃcient", "waﬄe"]
    texts = []
    top = 72.0
    for _ in range(8):
        words = [rng.choice(LOREM + lig_words) for _ in range(7)]
        texts.append({"x": 72.0, "top": top, "size": 12, "text": " ".join(words)})
        top += 16.0
    return make_pdf([{"width": 612, "height": 792, "texts": texts}])


def _np_palette(rng: random.Random, n: int):
    import numpy as np

    return np.array(
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256),
          255) for _ in range(n)], dtype=np.uint8)


def _image_file(rng: random.Random) -> bytes:
    """Standalone image FILE payloads (round 6 — kernel/imagefile.py):
    PNGs across color types 0/2/3/4/6, bit depths 1/2/4/8/16, all five
    row filters, plain AND Adam7-interlaced; baseline + progressive
    JPEGs; real GIFs (plain/interlaced/transparent); plus the
    classification tail (WEBP header -> 'unsupported', truncated
    PNG/GIF -> 'error')."""
    import numpy as np

    from ..kernel.imagefile import gif_file_encode, png_file_encode

    kind = rng.random()
    h, w = rng.randint(4, 24), rng.randint(4, 24)
    px = np.array(
        [[(r * 31 + c * 17 + rng.randint(0, 40)) % 256 for c in range(w)]
         for r in range(h)],
        dtype=np.uint8,
    )
    interlace = 1 if rng.random() < 0.3 else 0
    if kind < 0.42:
        ft = rng.randint(0, 4)
        ct = rng.random()
        if ct < 0.3:
            return png_file_encode(px, filter_type=ft,
                                   interlace=interlace)  # gray
        if ct < 0.55:
            rgb = np.stack([px, px[::-1], (px + 80) % 256], axis=2)
            return png_file_encode(rgb.astype(np.uint8), filter_type=ft,
                                   interlace=interlace)
        if ct < 0.75:
            n_pal = rng.randint(3, 12)
            pal = [(rng.randrange(256), rng.randrange(256),
                    rng.randrange(256)) for _ in range(n_pal)]
            idx = (px % n_pal).astype(np.uint8)
            return png_file_encode(idx, palette=pal, filter_type=ft,
                                   interlace=interlace)
        rgba = np.stack([px, (px + 30) % 256, (px + 90) % 256,
                         (px + 150) % 256], axis=2)
        return png_file_encode(rgba.astype(np.uint8), filter_type=ft,
                               interlace=interlace)
    if kind < 0.55:
        # special PNG depths: sub-byte gray/palette, 16-bit gray/RGB
        ft = rng.randint(0, 4)
        dt = rng.random()
        if dt < 0.4:
            bd = rng.choice([1, 2, 4])
            sub = (px >> (8 - bd)).astype(np.uint8)
            return png_file_encode(sub, bitdepth=bd, filter_type=ft,
                                   interlace=interlace)
        if dt < 0.6:
            bd = rng.choice([1, 2, 4])
            n_pal = rng.randint(2, 1 << bd)
            pal = [(rng.randrange(256), rng.randrange(256),
                    rng.randrange(256)) for _ in range(n_pal)]
            idx = (px % n_pal).astype(np.uint8)
            return png_file_encode(idx, palette=pal, bitdepth=bd,
                                   filter_type=ft, interlace=interlace)
        px16 = (px.astype(np.uint16) << 8) | px[::-1]
        if dt < 0.8:
            return png_file_encode(px16, bitdepth=16, filter_type=ft,
                                   interlace=interlace)
        rgb16 = np.stack([px16, px16 // 3, (px16 * 7) & 0xFFFF], axis=2)
        return png_file_encode(rgb16.astype(np.uint16), bitdepth=16,
                               filter_type=ft, interlace=interlace)
    if kind < 0.72:
        from ..kernel.jpeg import (
            jpeg_encode_gray,
            jpeg_encode_gray_progressive,
        )

        if rng.random() < 0.3:
            return jpeg_encode_gray_progressive(px)
        return jpeg_encode_gray(px)
    if kind < 0.88:
        n_pal = rng.randint(2, 32)
        pal = [(rng.randrange(256), rng.randrange(256),
                rng.randrange(256)) for _ in range(n_pal)]
        idx = (px % n_pal).astype(np.uint8)
        transparent = (rng.randrange(n_pal)
                       if rng.random() < 0.3 else None)
        return gif_file_encode(idx, pal, interlace=bool(interlace),
                               transparent=transparent)
    if kind < 0.94:
        # WEBP rows (v26): half REAL VP8L lossless (kernel/webp.py —
        # plain / subtract-green / predictor / palette variants), half
        # the lossy-header 'unsupported' classification row
        if rng.random() < 0.5:
            return (b"RIFF\x10\x00\x00\x00WEBPVP8 "
                    + bytes(rng.randrange(256) for _ in range(40)))
        from ..kernel.webp import webp_encode_lossless

        style = rng.random()
        if style < 0.3:
            return webp_encode_lossless(px[:, :, None].repeat(3, axis=2))
        if style < 0.55:
            return webp_encode_lossless(
                px[:, :, None].repeat(3, axis=2), subtract_green=True)
        if style < 0.8:
            return webp_encode_lossless(
                px[:, :, None].repeat(3, axis=2),
                predictor_mode=rng.randrange(14))
        n_pal = rng.randint(2, 12)
        pal_np = _np_palette(rng, n_pal)
        return webp_encode_lossless((px % n_pal).astype("uint8"),
                                    palette=pal_np)
    # broken-payload rows: a valid PNG or GIF cut mid-stream
    if rng.random() < 0.5:
        good = png_file_encode(px)
    else:
        good = gif_file_encode((px % 4).astype(np.uint8),
                               [(0, 0, 0), (85, 85, 85),
                                (170, 170, 170), (255, 255, 255)])
    return good[: rng.randint(24, max(25, len(good) - 16))]


def _pdf_images(rng: random.Random) -> bytes:
    """Pages with embedded raster image XObjects covering the decode
    matrix of kernel/images.py: Flate 8-bit DeviceRGB/DeviceGray, sub-byte
    (1/2/4-bit) DeviceGray, Indexed(DeviceRGB) palettes, CCITT Group 4
    bi-level fax (kernel/ccitt.py, round 5), REAL baseline JPEG
    (kernel/jpeg.py, round 5), and a fake-JPEG DCT (the 'unsupported'
    classification path). Deterministic pixels via pdfgen.image_pixel."""
    pages = []
    for page_i in range(rng.randint(1, 2)):
        texts = []
        top = 72.0
        for line in _wrap_text(rng, 6):
            texts.append({"x": 72.0, "top": top, "size": 12, "text": line})
            top += 14.5
        if page_i == 0:
            # v19/v20: one run each in the embedded-CFF /F2 font and the
            # embedded-Type1 /F3 font (pdfgen make_cff_font /
            # make_type1_font) so render rows drive the FontFile3 AND
            # FontFile parse + charstring + rasterize paths under the
            # driver board
            for fkey in ("F2", "F3"):
                texts.append({
                    "x": 72.0, "top": top, "size": 13,
                    "text": _sentence(rng, 5).rstrip(".").replace(",", ""),
                    "font": fkey,
                })
                top += 16.0
        images = []
        if page_i == 0:
            # page 0 carries the FULL decode matrix deterministically —
            # random sampling at small SF was missing whole kinds (the
            # sf0.01 board slice drew zero ccitt/jpeg images)
            for col, kind in enumerate(
                ["rgb", "subbyte", "palette", "ccitt", "ccitt_g3",
                 "ccitt_mixed", "jpeg", "jpeg_prog", "dct", "cmyk",
                 "jbig2", "jpx", "jpx_rgb", "jbig2_text", "cmyk_jpeg"]
            ):
                im = {
                    "x": 72.0 + col * 57.0, "top": top + 30,
                    "w": 50.0, "h": 50.0,
                    "pw": 5 + col, "ph": 4 + col,
                    "channels": 3, "seed": rng.randint(0, 10_000),
                }
                if kind == "subbyte":
                    im["channels"] = 1
                    im["bits"] = rng.choice([1, 2, 4])
                elif kind == "palette":
                    im["palette"] = [
                        (rng.randrange(256), rng.randrange(256),
                         rng.randrange(256))
                        for _ in range(rng.randint(3, 12))
                    ]
                    im["bits"] = rng.choice([4, 8])
                elif kind in ("ccitt", "jpeg"):
                    im["format"] = kind
                    im["channels"] = 1
                elif kind == "jpeg_prog":
                    # progressive SOF2 (round 6 — kernel/jpeg.py Annex G)
                    im["format"] = "jpeg"
                    im["channels"] = 1
                    im["progressive"] = True
                elif kind in ("ccitt_g3", "ccitt_mixed"):
                    # Group 3 regimes (round 6): K=0 pure 1-D and K=2
                    # mixed 2-D, both with FILL zeros before EOLs —
                    # exercises the fill-tolerant EOL scan on engine AND
                    # oracle (kernel/ccitt.py vs expected._oracle_g3_rows)
                    im["format"] = "ccitt"
                    im["channels"] = 1
                    im["ccitt_k"] = 0 if kind == "ccitt_g3" else 2
                elif kind == "dct":
                    im["format"] = "dct"
                elif kind == "cmyk":
                    # 8-bit Flate DeviceCMYK raster (print-oriented
                    # corpora): native 4-channel samples
                    im["channels"] = 4
                elif kind == "jbig2":
                    # v21 (round 6): real embedded JBIG2 via the
                    # kernel's own MQ encoder (kernel/jbig2.py)
                    im["format"] = "jbig2"
                    im["channels"] = 1
                elif kind == "jbig2_text":
                    # v23 (round 7): JBIG2 symbol dictionary + text
                    # region (T.88 §6.4/§6.5) — the structure real
                    # scanned PDFs use
                    im["format"] = "jbig2_text"
                    im["channels"] = 1
                    im["pw"] = max(14, im["pw"])
                    im["ph"] = max(12, im["ph"])
                elif kind == "cmyk_jpeg":
                    # v23 (round 7): Adobe APP14 CMYK/YCCK JPEG
                    # (kernel/jpeg.py 4-component decode, libjpeg-pinned
                    # sign convention); seed picks transform 0 vs 2
                    im["format"] = "cmyk_jpeg"
                    im["channels"] = 4
                elif kind in ("jpx", "jpx_rgb"):
                    # v22 (round 6): real embedded JPEG 2000 via
                    # kernel/jpx.py (reversible 5/3 — decoded samples
                    # equal the shared ground truth bit-exactly); the
                    # seed varies raw-J2K vs JP2 wrap + progression
                    im["format"] = "jpx"
                    im["channels"] = 3 if kind == "jpx_rgb" else 1
                images.append(im)
        for _ in range(rng.randint(1, 3)):
            im = {
                "x": 72.0 + rng.random() * 300,
                "top": top + 20 + rng.random() * 200,
                "w": 60 + rng.random() * 120,
                "h": 40 + rng.random() * 90,
                "pw": rng.randint(4, 16),
                "ph": rng.randint(4, 16),
                "channels": rng.choice([1, 3, 3]),
                "seed": rng.randint(0, 10_000),
            }
            kind = rng.random()
            if kind < 0.1:
                im["format"] = "dct"  # fake JPEG: the unsupported path
            elif kind < 0.2:
                # real JPEG (kernel/jpeg.py): baseline, sometimes SOF2
                im["format"] = "jpeg"
                im["channels"] = 1
                if rng.random() < 0.3:
                    im["progressive"] = True
            elif kind < 0.35:
                # bi-level fax via kernel/ccitt.py: mostly G4, with G3
                # K=0 / K=2 sprinkled in (round 6)
                im["format"] = "ccitt"
                im["channels"] = 1
                im["ccitt_k"] = rng.choice([-1, -1, 0, 2])
            elif kind < 0.45:
                im["channels"] = 1
                im["bits"] = rng.choice([1, 2, 4])
            elif kind < 0.55:
                n_pal = rng.randint(3, 12)
                im["palette"] = [
                    (rng.randrange(256), rng.randrange(256),
                     rng.randrange(256))
                    for _ in range(n_pal)
                ]
                im["bits"] = rng.choice([4, 8])
            images.append(im)
        pages.append(
            {"width": 612, "height": 792, "texts": texts, "images": images}
        )
    return make_pdf(pages)


def _html_news(rng: random.Random) -> Tuple[bytes, str]:
    title = _sentence(rng, 4).title()
    paras = [_sentence(rng, rng.randint(20, 45)) + "." for _ in range(rng.randint(3, 8))]
    nav = " ".join(f'<a href="/{w}">{w}</a>' for w in rng.sample(LOREM, 5))
    aside = " ".join(f'<a href="#">{_sentence(rng, 2)}</a>' for _ in range(4))
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    html = f"""<!DOCTYPE html><html><head><title>{title}</title>
<script>window.x=1;</script><style>p{{margin:0}}</style></head>
<body><header><nav>{nav}</nav></header>
<div class="sidebar">{aside}</div>
<article><h1>{title}</h1>
{body}
</article>
<footer>copyright example corp {nav}</footer></body></html>"""
    return html.encode("utf-8"), title


def generate_rows(
    n_docs: int,
    seed: int = 42,
    mega_pages: int = 0,
) -> Iterator[dict]:
    """Yield pages-table rows. Family mix is deterministic in doc index."""
    base_ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    families = [
        ("pdf/basic", 0.24),
        ("pdf/layout", 0.14),
        ("pdf/table-lattice", 0.14),
        ("pdf/table-stream", 0.09),
        ("pdf/dupchars", 0.05),
        ("pdf/rotated", 0.04),
        ("pdf/ligatures", 0.04),
        ("pdf/encrypted", 0.06),  # empty-user-password AES/RC4 (crawl-common)
        # inserted v9 taking weight from html/news only, so every other
        # family's cumulative range — and thus its membership and payload
        # bytes per doc index — is unchanged from v8
        ("pdf/images", 0.04),
        # inserted v15 (round 6), again taking weight from html/news only:
        # standalone PNG/JPEG/GIF payloads for the image_metadata real
        # decode (kernel/imagefile.py)
        ("image/file", 0.03),
        ("html/news", 0.12),
        ("broken", 0.05),
    ]
    cum = []
    acc = 0.0
    for name, p in families:
        acc += p
        cum.append((name, acc))

    for i in range(n_docs):
        rng = random.Random(seed * 1_000_003 + i)
        u = rng.random()
        fam = next(name for name, c in cum if u <= c)
        url = f"synth://{fam}/{i:07d}"
        ts = base_ts + dt.timedelta(seconds=i * 7)
        lang = "en"
        if fam == "pdf/basic":
            payload = _pdf_basic(rng, rng.randint(1, 3))
        elif fam == "pdf/layout":
            payload = _pdf_layout(rng, rng.randint(1, 2))
        elif fam == "pdf/table-lattice":
            payload = _pdf_table_lattice(rng, 1)
        elif fam == "pdf/table-stream":
            payload = _pdf_table_stream(rng, 1)
        elif fam == "pdf/dupchars":
            payload = _pdf_dupchars(rng, 1)
        elif fam == "pdf/rotated":
            payload = _pdf_rotated(rng)
        elif fam == "pdf/ligatures":
            payload = _pdf_ligatures(rng)
        elif fam == "pdf/encrypted":
            from ..kernel.pdfcrypt import encrypt_pdf

            # R5 for the corpus: R6's hardened hash costs ~0.5s per doc at
            # both generation and parse; R6 parity is pinned in
            # tests/test_encryption.py instead
            method = rng.choice(["rc4", "aes128", "aes256r5"])
            payload = encrypt_pdf(
                _pdf_basic(rng, 1), user_pw="", owner_pw="owner",
                method=method, seed=b"corpus-%d" % i,
            )
        elif fam == "pdf/images":
            payload = _pdf_images(rng)
        elif fam == "image/file":
            payload = _image_file(rng)
        elif fam == "html/news":
            payload, _ = _html_news(rng)
        else:  # broken
            good = _pdf_basic(rng, 1)
            payload = good[: rng.randint(40, max(41, len(good) // 3))]
        yield {
            "url": url,
            "warc_ts": ts,
            "html": payload,
            "text": None,  # crawl text column intentionally dirty/absent
            "lang": lang,
        }

    if mega_pages:
        rng = random.Random(seed * 31 + 7)
        yield {
            "url": "synth://pdf/mega/0000000",
            "warc_ts": base_ts,
            "html": _pdf_basic(rng, mega_pages),
            "text": None,
            "lang": "en",
        }


def write_corpus_parquet(
    path: str, n_docs: int, seed: int = 42, mega_pages: int = 0
) -> int:
    """Write the corpus with pyarrow (no Spark needed); returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = list(generate_rows(n_docs, seed=seed, mega_pages=mega_pages))
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        ),
    )
    pq.write_table(table, path)
    return len(rows)


def corpus_path_for_sf(sf_dir: str) -> str:
    """Deterministic /tmp cache path of the synthetic pages corpus sized for
    a testdata sf directory (shared by __spark_entry__ and the materialized
    oracle so both read the SAME bytes)."""
    import os

    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    n = {"sf0.001": 30, "sf0.01": 80, "sf0.1": 400}.get(sf, 60)
    path = f"/tmp/spark_graft_pages_v{CORPUS_VERSION}_{sf}_{n}.parquet"
    if not os.path.exists(path):
        write_corpus_parquet(path, n_docs=n, seed=42)
    return path
