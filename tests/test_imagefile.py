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

    from pdfplumber_spark.kernel.imagefile import gif_file_encode

    png = png_file_encode(np.zeros((4, 4), dtype=np.uint8))
    row = _payload_to_image_row("u", png)
    assert row[2:] == ("png", 4, 4, 1, row[6], "ok")
    # GIF decodes since round 6
    gif = gif_file_encode(np.zeros((3, 5), dtype=np.uint8),
                          [(1, 2, 3), (4, 5, 6)])
    row = _payload_to_image_row("u", gif)
    assert row[2:] == ("gif", 5, 3, 3, row[6], "ok")
    # GIF header + garbage: broken payload of a recognized format
    row = _payload_to_image_row("u", b"GIF89a" + bytes(32))
    assert (row[2], row[7]) == ("gif", "error")
    # WEBP: recognized, no decoder
    row = _payload_to_image_row("u", b"RIFF\x10\x00\x00\x00WEBPVP8 ")
    assert (row[2], row[7]) == ("webp", "unsupported")
    # truncated PNG: broken payload of a recognized format
    row = _payload_to_image_row("u", png[:30])
    assert (row[2], row[7]) == ("png", "error")
    # PDF payload stays unsupported for the IMAGE decoder
    row = _payload_to_image_row("u", b"%PDF-1.4 junk")
    assert (row[2], row[7]) == ("pdf", "unsupported")
    row = _payload_to_image_row("u", None)
    assert row[7] == "error"


def test_unsupported_and_invalid_headers():
    with pytest.raises(UnsupportedImageError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPjunk")
    png = bytearray(png_file_encode(np.zeros((4, 4), dtype=np.uint8)))
    png[24] = 16  # depth no longer unsupported — now an IDAT size lie
    with pytest.raises(ImageFileError):
        png_file_decode(bytes(png))
    png[24] = 3  # 3 is not a legal PNG bit depth for any color type
    with pytest.raises(ImageFileError):
        png_file_decode(bytes(png))
    png[24] = 16
    png[25] = 3  # palette + 16-bit: spec-invalid combination
    with pytest.raises(ImageFileError):
        png_file_decode(bytes(png))


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
    """The image/file family (corpus v17) covers every classification
    path deterministically — PNG (all depths/interlace), JPEG
    (baseline + progressive), GIF, WEBP-unsupported, truncated-error."""
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
    assert c[("gif", "ok")] > 5
    assert c[("webp", "unsupported")] > 0
    assert c[("webp", "ok")] > 0  # round-7: real VP8L rows decode
    assert c[("png", "error")] > 0
    assert c[("gif", "error")] > 0


# ---- round-6b: PNG bit depths 1/2/4/16, Adam7 interlace, GIF ----


@pytest.mark.parametrize("bitdepth", [1, 2, 4])
def test_png_subbyte_gray_scales_by_bit_replication(bitdepth):
    rng = np.random.RandomState(bitdepth)
    maxv = (1 << bitdepth) - 1
    a = rng.randint(0, maxv + 1, (11, 13)).astype(np.uint8)
    for ft in range(5):
        d = png_file_decode(png_file_encode(a, bitdepth=bitdepth,
                                            filter_type=ft))
        exp = (a.astype(np.uint16) * 255 // maxv).astype(np.uint8)
        assert (d["samples"][:, :, 0] == exp).all()


@pytest.mark.parametrize("bitdepth", [1, 2, 4])
def test_png_subbyte_palette_keeps_raw_indices(bitdepth):
    rng = np.random.RandomState(bitdepth + 7)
    n = 1 << bitdepth
    pal = [(int(a), int(b), int(c))
           for a, b, c in rng.randint(0, 256, (n, 3))]
    idx = rng.randint(0, n, (9, 14)).astype(np.uint8)
    d = png_file_decode(png_file_encode(idx, palette=pal,
                                        bitdepth=bitdepth, filter_type=2))
    assert (d["samples"] == np.array(pal, dtype=np.uint8)[idx]).all()


def test_png_16bit_takes_high_byte():
    rng = np.random.RandomState(16)
    g16 = rng.randint(0, 65536, (8, 6)).astype(np.uint16)
    d = png_file_decode(png_file_encode(g16, bitdepth=16, filter_type=3))
    assert (d["samples"][:, :, 0] == (g16 >> 8).astype(np.uint8)).all()
    rgb16 = rng.randint(0, 65536, (7, 5, 3)).astype(np.uint16)
    d = png_file_decode(png_file_encode(rgb16, bitdepth=16, filter_type=4))
    assert (d["samples"] == (rgb16 >> 8).astype(np.uint8)).all()


def test_png_16bit_differential_vs_8bit():
    """A 16-bit image whose samples are v<<8 decodes identically to the
    8-bit encode of v — two independent paths, one answer."""
    rng = np.random.RandomState(99)
    v = rng.randint(0, 256, (10, 12, 3)).astype(np.uint8)
    d8 = png_file_decode(png_file_encode(v, filter_type=1))
    d16 = png_file_decode(png_file_encode(
        (v.astype(np.uint16) << 8), bitdepth=16, filter_type=4))
    assert (d8["samples"] == d16["samples"]).all()


@pytest.mark.parametrize("shape", [(15, 17), (9, 21, 3), (16, 8, 4),
                                   (5, 5, 2), (1, 1), (3, 1, 3), (8, 8)])
def test_png_adam7_roundtrip(shape):
    rng = np.random.RandomState(sum(shape))
    a = rng.randint(0, 256, shape).astype(np.uint8)
    for ft in range(5):
        d = png_file_decode(png_file_encode(a, filter_type=ft, interlace=1))
        got = d["samples"][:, :, 0] if a.ndim == 2 else d["samples"]
        assert (got == a).all()


def test_png_adam7_subbyte_and_16bit():
    rng = np.random.RandomState(77)
    a = rng.randint(0, 16, (13, 11)).astype(np.uint8)
    d = png_file_decode(png_file_encode(a, bitdepth=4, interlace=1,
                                        filter_type=4))
    exp = (a.astype(np.uint16) * 255 // 15).astype(np.uint8)
    assert (d["samples"][:, :, 0] == exp).all()
    a16 = rng.randint(0, 65536, (12, 3, 3)).astype(np.uint16)
    d = png_file_decode(png_file_encode(a16, bitdepth=16, interlace=1,
                                        filter_type=2))
    assert (d["samples"] == (a16 >> 8).astype(np.uint8)).all()
    pal = [(i * 37 % 256, i * 11 % 256, i * 73 % 256) for i in range(4)]
    idx = rng.randint(0, 4, (14, 10)).astype(np.uint8)
    d = png_file_decode(png_file_encode(idx, palette=pal, bitdepth=2,
                                        interlace=1, filter_type=3))
    assert (d["samples"] == np.array(pal, dtype=np.uint8)[idx]).all()


@pytest.mark.parametrize("npal,shape", [(2, (7, 9)), (5, (16, 3)),
                                        (16, (11, 11)), (200, (23, 17)),
                                        (256, (8, 40)), (3, (1, 1))])
def test_gif_roundtrip(npal, shape):
    from pdfplumber_spark.kernel.imagefile import (
        gif_file_decode,
        gif_file_encode,
    )

    rng = np.random.RandomState(npal)
    pal = [(int(a), int(b), int(c))
           for a, b, c in rng.randint(0, 256, (npal, 3))]
    idx = rng.randint(0, npal, shape).astype(np.uint8)
    d = gif_file_decode(gif_file_encode(idx, pal))
    assert (d["width"], d["height"], d["channels"]) == (
        shape[1], shape[0], 3)
    assert (d["samples"] == np.array(pal, dtype=np.uint8)[idx]).all()


def test_gif_interlaced_roundtrip():
    from pdfplumber_spark.kernel.imagefile import (
        gif_file_decode,
        gif_file_encode,
    )

    rng = np.random.RandomState(4)
    pal = [(int(a), int(b), int(c))
           for a, b, c in rng.randint(0, 256, (7, 3))]
    idx = rng.randint(0, 7, (21, 13)).astype(np.uint8)
    d = gif_file_decode(gif_file_encode(idx, pal, interlace=True))
    assert (d["samples"] == np.array(pal, dtype=np.uint8)[idx]).all()


def test_gif_transparency_and_offset_compose_on_screen():
    """GCE-transparent pixels keep the background fill; the frame pastes
    at its (left, top) offset on the logical screen."""
    from pdfplumber_spark.kernel.imagefile import (
        gif_file_decode,
        gif_file_encode,
    )

    pal = [(10, 20, 30), (200, 100, 50), (0, 0, 0)]
    idx = np.array([[0, 1], [1, 2]], dtype=np.uint8)
    d = gif_file_decode(gif_file_encode(
        idx, pal, transparent=1, left=1, top=1, screen=(4, 4), bg_index=0))
    s = d["samples"]
    assert (s[0, 0] == [10, 20, 30]).all()  # background fill
    assert (s[1, 1] == [10, 20, 30]).all()  # index 0 at the offset
    assert (s[1, 2] == [10, 20, 30]).all()  # transparent -> fill kept
    assert (s[2, 2] == [0, 0, 0]).all()     # index 2
    assert (d["width"], d["height"]) == (4, 4)


def test_gif_known_tiny_transparent_pixel():
    """The canonical 43-byte 1x1 transparent GIF (public, widely
    embedded as a tracking pixel) — external validation of the LZW +
    GCE path: the single pixel is transparent, so the decode is the
    background color (black, index 0)."""
    from pdfplumber_spark.kernel.imagefile import gif_file_decode

    tiny = bytes.fromhex(
        "474946383961"      # GIF89a
        "01000100" "800000"  # 1x1, GCT of 2, bg 0
        "000000" "ffffff"    # black, white
        "21f904" "0100000000"  # GCE: transparent flag, index 0
        "2c" "000000000100010000"  # image descriptor 1x1
        "02" "024401" "00" "3b"    # LZW min 2; codes; trailer
    )
    d = gif_file_decode(tiny)
    assert (d["width"], d["height"], d["channels"]) == (1, 1, 3)
    assert d["samples"].tolist() == [[[0, 0, 0]]]


def test_gif_lzw_table_growth_and_reset():
    """Long runs exercise KwKwK + width growth; 256-color noise large
    enough to hit the 4096-entry cap exercises the Clear-code reset."""
    from pdfplumber_spark.kernel.imagefile import (
        gif_file_decode,
        gif_file_encode,
    )

    idx = np.tile(np.arange(4, dtype=np.uint8), (50, 36))[:50, :48]
    pal = [(i, i, i) for i in range(4)]
    d = gif_file_decode(gif_file_encode(idx, pal))
    assert (d["samples"][:, :, 0] == idx).all()
    rng = np.random.RandomState(8)
    idx = rng.randint(0, 256, (120, 120)).astype(np.uint8)
    pal = [(i, 255 - i, i // 2) for i in range(256)]
    d = gif_file_decode(gif_file_encode(idx, pal))
    assert (d["samples"] == np.array(pal, dtype=np.uint8)[idx]).all()


def test_gif_broken_payloads_raise_error():
    from pdfplumber_spark.kernel.imagefile import (
        gif_file_decode,
        gif_file_encode,
    )

    good = gif_file_encode(np.zeros((6, 6), dtype=np.uint8),
                           [(0, 0, 0), (255, 255, 255)])
    for cut in (8, 14, len(good) - 4):
        with pytest.raises(ImageFileError):
            gif_file_decode(good[:cut])
    with pytest.raises(ImageFileError):
        gif_file_decode(b"GIF89a" + bytes(32))


def test_decode_image_hostile_bytes_never_crash():
    """Robustness contract: arbitrary/mutated bytes must classify via
    UnsupportedImageError/ImageFileError — never any other exception
    (the operator turns those into 'unsupported'/'error' rows)."""
    from pdfplumber_spark.kernel.imagefile import (
        gif_file_encode,
        decode_image,
    )

    rng = np.random.RandomState(1234)
    seeds = []
    base = rng.randint(0, 256, (9, 7)).astype(np.uint8)
    seeds.append(png_file_encode(base, filter_type=4))
    seeds.append(png_file_encode(base, bitdepth=4, interlace=1))
    seeds.append(gif_file_encode((base % 4).astype(np.uint8),
                                 [(0, 0, 0), (80, 80, 80),
                                  (160, 160, 160), (240, 240, 240)],
                                 interlace=True))
    tried = 0
    for seed in seeds:
        for trial in range(120):
            buf = bytearray(seed)
            for _ in range(rng.randint(1, 6)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            if rng.rand() < 0.3:
                buf = buf[: rng.randint(1, len(buf))]
            try:
                decode_image(bytes(buf))
            except (ImageFileError, UnsupportedImageError):
                pass
            tried += 1
    for trial in range(150):  # pure noise, all sniff branches
        n = rng.randint(1, 200)
        buf = bytearray(rng.randint(0, 256, n).astype(np.uint8).tobytes())
        if trial % 5 == 0:
            buf[:6] = b"GIF89a"
        elif trial % 5 == 1:
            buf[:8] = b"\x89PNG\r\n\x1a\n"[: len(buf)]
        try:
            decode_image(bytes(buf))
        except (ImageFileError, UnsupportedImageError):
            pass
        tried += 1
    assert tried == 510
