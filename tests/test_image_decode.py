"""PDF-embedded image XObject pixel decode (kernel/images.py +
operators/multimodal.pdf_image_stats) — round-3 verdict ask #4.

The writer (kernel/pdfgen.py) and the decoder share only the
``image_pixel`` sample definition; the decode goes through the real PDF
object graph + stream-filter pipeline.
"""

import numpy as np
import pytest

from pdfplumber_spark.kernel.images import image_xobjects
from pdfplumber_spark.kernel.pdfgen import image_pixel, image_samples, make_pdf


def _pdf(images, texts=()):
    return make_pdf(
        [
            {
                "width": 612,
                "height": 792,
                "texts": list(texts)
                or [{"x": 72, "top": 72, "size": 12, "text": "img page"}],
                "images": images,
            }
        ]
    )


def test_rgb_flate_roundtrip_exact_bytes():
    pdf = _pdf([{"x": 100, "top": 150, "w": 96, "h": 64,
                 "pw": 6, "ph": 4, "channels": 3, "seed": 7}])
    (im,) = image_xobjects(pdf)
    assert (im["status"], im["width"], im["height"], im["channels"]) == (
        "ok", 6, 4, 3)
    assert im["samples"] == image_samples(7, 6, 4, 3)
    # spot-check the layout: row-major interleaved
    arr = np.frombuffer(im["samples"], np.uint8).reshape(4, 6, 3)
    assert arr[2, 3, 1] == image_pixel(7, 2, 3, 1)


def test_gray_and_multi_image_page_ordering():
    pdf = _pdf(
        [
            {"x": 100, "top": 150, "w": 50, "h": 50, "pw": 5, "ph": 5,
             "channels": 1, "seed": 3},
            {"x": 300, "top": 150, "w": 50, "h": 50, "pw": 4, "ph": 6,
             "channels": 3, "seed": 11},
        ]
    )
    ims = image_xobjects(pdf)
    assert [(i["name"], i["image_index"]) for i in ims] == [
        ("Im0", 0), ("Im1", 1)]
    assert ims[0]["colorspace"] == "DeviceGray"
    assert ims[0]["samples"] == image_samples(3, 5, 5, 1)
    assert ims[1]["samples"] == image_samples(11, 4, 6, 3)


def test_dct_classified_unsupported():
    pdf = _pdf([{"x": 100, "top": 150, "w": 50, "h": 50, "pw": 8, "ph": 8,
                 "channels": 3, "seed": 9, "format": "dct"}])
    (im,) = image_xobjects(pdf)
    assert im["status"] == "unsupported"
    assert im["samples"] is None
    assert (im["width"], im["height"]) == (8, 8)  # header still parsed


def test_truncated_stream_is_error():
    pdf = _pdf([{"x": 100, "top": 150, "w": 50, "h": 50, "pw": 8, "ph": 8,
                 "channels": 3, "seed": 5}])
    # corrupt the flate body: find the image stream and chop bytes out
    import re

    m = re.search(rb"/Subtype/Image.*?stream\r?\n", pdf, re.S)
    start = m.end()
    broken = pdf[: start + 4] + pdf[start + 30:]
    ims = image_xobjects(broken)
    assert len(ims) == 1
    assert ims[0]["status"] in ("error", "unsupported")


def test_pdf_image_stats_operator(spark):
    """Distributed stats over a two-doc frame: exact int-sum/count means."""
    from pdfplumber_spark.operators.multimodal import pdf_image_stats

    pdf1 = _pdf([{"x": 100, "top": 150, "w": 96, "h": 64, "pw": 6, "ph": 4,
                  "channels": 3, "seed": 7}])
    pdf2 = _pdf([{"x": 100, "top": 150, "w": 50, "h": 50, "pw": 5, "ph": 5,
                  "channels": 1, "seed": 3}])
    df = spark.createDataFrame(
        [("u1", bytearray(pdf1)), ("u2", bytearray(pdf2)), ("u3", None)],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in pdf_image_stats(df).collect()}
    assert set(rows) == {"u1", "u2"}

    s = image_samples(7, 6, 4, 3)
    for ch, col in enumerate(["mean_c0", "mean_c1", "mean_c2"]):
        exp = round(sum(s[ch::3]) / 24, 6)
        assert rows["u1"][col] == exp
    assert rows["u1"]["min_val"] == min(s)
    assert rows["u1"]["max_val"] == max(s)

    g = image_samples(3, 5, 5, 1)
    assert rows["u2"]["mean_c0"] == round(sum(g) / 25, 6)
    assert rows["u2"]["mean_c1"] is None
    assert rows["u2"]["channels"] == 1


def test_corpus_images_family_present_and_decodable():
    """Corpus v9 must contain pdf/images docs whose Flate images decode."""
    import pyarrow.parquet as pq

    from pdfplumber_spark.sources.corpus import corpus_path_for_sf

    t = pq.read_table(corpus_path_for_sf("/root/testdata/sf0.01"))
    fams = [u for u in t.column("url").to_pylist() if "pdf/images" in u]
    assert fams, "corpus v9 must include the pdf/images family"
    payloads = dict(
        zip(t.column("url").to_pylist(), t.column("html").to_pylist())
    )
    n_ok = n_unsup = 0
    for u in fams:
        for im in image_xobjects(bytes(payloads[u])):
            if im["status"] == "ok":
                n_ok += 1
                assert len(im["samples"]) == (
                    im["width"] * im["height"] * im["channels"]
                )
            elif im["status"] == "unsupported":
                n_unsup += 1
    assert n_ok > 0, "decodable Flate images must exist"
    assert n_unsup > 0, "DCT 'unsupported' rows must exist"


def test_subbyte_gray_depths_roundtrip():
    """1/2/4-bit DeviceGray: MSB-first packing with per-row byte padding
    (widths chosen so every row has dangling bits)."""
    from pdfplumber_spark.kernel.pdfgen import image_codes

    specs = [(1, 7, 5, 4), (2, 9, 4, 5), (4, 5, 5, 6)]
    images = [
        {"x": 80 + 110 * i, "top": 150, "w": 60, "h": 40,
         "pw": pw, "ph": ph, "channels": 1, "bits": bits, "seed": seed}
        for i, (bits, pw, ph, seed) in enumerate(specs)
    ]
    ims = image_xobjects(_pdf(images))
    assert [i["status"] for i in ims] == ["ok"] * 3
    for im, (bits, pw, ph, seed) in zip(ims, specs):
        assert (im["bits"], im["colorspace"]) == (bits, "DeviceGray")
        assert list(im["samples"]) == image_codes(seed, pw, ph, 1, 1 << bits)


def test_indexed_palette_expands_to_base_colorspace():
    from pdfplumber_spark.kernel.pdfgen import image_codes

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30),
           (200, 200, 200)]
    ims = image_xobjects(
        _pdf([{"x": 80, "top": 300, "w": 60, "h": 40, "pw": 6, "ph": 6,
               "bits": 4, "seed": 8, "palette": pal}])
    )
    (im,) = ims
    assert im["colorspace"] == "Indexed(DeviceRGB)"
    assert im["channels"] == 3
    idx = image_codes(8, 6, 6, 1, len(pal))
    assert im["samples"] == b"".join(bytes(pal[i]) for i in idx)


def test_out_of_range_palette_index_is_error():
    """An index past hival must not crash or silently wrap."""
    from pdfplumber_spark.kernel.pdfgen import make_pdf
    import re

    pdf = _pdf([{"x": 80, "top": 300, "w": 60, "h": 40, "pw": 4, "ph": 4,
                 "bits": 8, "seed": 8,
                 "palette": [(0, 0, 0), (255, 255, 255)]}])
    # shrink the declared palette to hival 0 so generated indices overflow
    broken = pdf.replace(b"/Indexed/DeviceRGB 1 <", b"/Indexed/DeviceRGB 0 <")
    # (hival isn't even read from the dict — the lookup length rules)
    broken = broken.replace(b"000000FFFFFF", b"000000")
    (im,) = image_xobjects(broken)
    assert im["status"] == "error"
