"""Standalone image-FILE decode (kernel/imagefile.py, round 6 — replaces
the last multimodal stub). Reference analogue: PIL decode in
display.py:36-90; here the engine's own codecs are cross-checked by
encoder/decoder roundtrips and classification pins."""

import numpy as np
import pytest

from pdfplumber_spark.kernel.imagefile import (
    ImageFileError,
    UnsupportedImageError,
    decode_image,
    png_file_decode,
    png_file_encode,
    sniff_format,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_color_types(filter_type):
    rng = np.random.RandomState(filter_type + 1)
    gray = rng.randint(0, 256, (9, 7)).astype(np.uint8)
    d = png_file_decode(png_file_encode(gray, filter_type=filter_type))
    assert d["channels"] == 1 and (d["samples"][:, :, 0] == gray).all()
    for ch in (2, 3, 4):
        px = rng.randint(0, 256, (6, 11, ch)).astype(np.uint8)
        d = png_file_decode(png_file_encode(px, filter_type=filter_type))
        assert d["channels"] == ch and (d["samples"] == px).all()
    pal = [(int(a), int(b), int(c))
           for a, b, c in rng.randint(0, 256, (7, 3))]
    idx = rng.randint(0, 7, (8, 5)).astype(np.uint8)
    d = png_file_decode(png_file_encode(idx, palette=pal,
                                        filter_type=filter_type))
    assert d["channels"] == 3
    assert (d["samples"] == np.array(pal, dtype=np.uint8)[idx]).all()


def test_raster_png_writer_decodes():
    """The render sink's own PNG writer (kernel/raster.py) and the file
    decoder agree — two independent implementations of the format."""
    from pdfplumber_spark.kernel.raster import png_encode

    a = np.random.RandomState(2).randint(0, 256, (10, 6, 3)).astype(np.uint8)
    d = png_file_decode(png_encode(a))
    assert (d["samples"] == a).all() and d["channels"] == 3


def test_jpeg_file_decode():
    from pdfplumber_spark.kernel.jpeg import jpeg_encode_gray

    d = decode_image(jpeg_encode_gray(np.full((6, 6), 99, dtype=np.uint8)))
    assert (d["format"], d["width"], d["height"], d["channels"]) == (
        "jpeg", 6, 6, 1)
    assert set(d["samples"].reshape(-1).tolist()) == {99}


def test_classification_matrix():
    """ok / unsupported / error triage exactly as the metadata operator
    reports it."""
    from pdfplumber_spark.operators.multimodal import _payload_to_image_row

    png = png_file_encode(np.zeros((4, 4), dtype=np.uint8))
    row = _payload_to_image_row("u", png)
    assert row[2:] == ("png", 4, 4, 1, row[6], "ok")
    # GIF: recognized, no decoder
    row = _payload_to_image_row("u", b"GIF89a" + bytes(32))
    assert (row[2], row[7]) == ("gif", "unsupported")
    # truncated PNG: broken payload of a recognized format
    row = _payload_to_image_row("u", png[:30])
    assert (row[2], row[7]) == ("png", "error")
    # PDF payload stays unsupported for the IMAGE decoder
    row = _payload_to_image_row("u", b"%PDF-1.4 junk")
    assert (row[2], row[7]) == ("pdf", "unsupported")
    row = _payload_to_image_row("u", None)
    assert row[7] == "error"


def test_unsupported_features_raise_unsupported():
    png = bytearray(png_file_encode(np.zeros((4, 4), dtype=np.uint8)))
    png[24] = 16  # IHDR bit depth 16
    with pytest.raises(UnsupportedImageError):
        png_file_decode(bytes(png))
    png[24] = 8
    png[28] = 1  # Adam7 interlace
    with pytest.raises(UnsupportedImageError):
        png_file_decode(bytes(png))
    with pytest.raises(UnsupportedImageError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPjunk")


def test_broken_payloads_raise_error():
    png = png_file_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ImageFileError):
        png_file_decode(png[:20])  # truncated chunk
    # corrupt the IDAT zlib stream (flip bytes inside the chunk body)
    bad = bytearray(png)
    bad[45:49] = b"\x00\x01\x02\x03"
    with pytest.raises(ImageFileError):
        png_file_decode(bytes(bad))


def test_sniff_formats():
    assert sniff_format(b"\x89PNG\r\n\x1a\nxx") == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert sniff_format(b"GIF87a") == "gif"
    assert sniff_format(b"RIFF0000WEBP") == "webp"
    assert sniff_format(b"%PDF-1.7") == "pdf"
    assert sniff_format(b"\x00\x01") == "unknown"


def test_corpus_image_file_family_mix():
    """The image/file family (corpus v15) covers every classification
    path deterministically."""
    import random
    from collections import Counter

    from pdfplumber_spark.operators.multimodal import _payload_to_image_row
    from pdfplumber_spark.sources.corpus import _image_file

    c = Counter()
    for i in range(200):
        row = _payload_to_image_row(f"u{i}", _image_file(random.Random(i)))
        c[(row[2], row[7])] += 1
        if row[7] == "ok":
            assert row[3] > 0 and row[4] > 0 and row[5] in (1, 2, 3, 4)
    assert c[("png", "ok")] > 50
    assert c[("jpeg", "ok")] > 10
    assert c[("gif", "unsupported")] > 0
    assert c[("png", "error")] > 0
