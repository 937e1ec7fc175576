"""JPEG 2000 (ITU-T T.800) codec — kernel/jpx.py.

The reference fixture corpus carries NO JPX streams (surveyed round 6),
so validation is internal, the JBIG2/JPEG precedent: encoder/decoder
roundtrips across the config matrix (levels x progression x tiling x
code-block geometry, lossless bit-exact), a Table F.4 filter-tap anchor
that pins the 9/7 lifting to the PUBLISHED analysis filters (so the
lifting constants can't drift), 9/7 rate/distortion monotonicity, JP2
container handling, PDF end-to-end against the shared deterministic
pixel ground truth, and malformed/unsupported-input robustness.
"""

import io
import zlib

import numpy as np
import pytest

from pdfplumber_spark.kernel.jpx import (
    JPXError, _fwd_97, jpx_decode, jpx_encode)


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((np.sin(xx / 9.0) + np.cos(yy / 7.0)) * 60 + 128).astype(
        np.uint8
    )


def _noise(h, w, c=None, seed=11):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.randint(0, 256, shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Table F.4 anchor: the lifting implementation must equal direct
# convolution with the PUBLISHED 9/7 analysis taps (whole-sample
# symmetric extension). Low-pass lands at even interleaved indices.

_H97 = {0: 0.602949018236360, 1: 0.266864118442875,
        2: -0.078223266528990, 3: -0.016864118442875,
        4: 0.026748757410810}
_G97 = {0: 1.115087052457000, 1: -0.591271763114250,
        2: -0.057543526228500, 3: 0.091271763114250}


def test_97_lifting_matches_table_f4_taps():
    rng = np.random.RandomState(3)
    for n in (8, 10, 16, 30):
        x = rng.randn(n)
        a = _fwd_97(x.copy()[None, :], 1)[0]

        def ext(i):
            p = 2 * n - 2
            i = i % p
            return x[p - i if i >= n else i]

        low = [sum(_H97[abs(m)] * ext(2 * k + m) for m in range(-4, 5))
               for k in range((n + 1) // 2)]
        high = [sum(_G97[abs(m)] * ext(2 * k + 1 + m)
                    for m in range(-3, 4))
                for k in range(n // 2)]
        assert np.abs(a[0::2] - low).max() < 1e-12
        assert np.abs(a[1::2] - high).max() < 1e-12


# ---------------------------------------------------------------------------
# Lossless (5/3) roundtrips across the config matrix


@pytest.mark.parametrize("levels", [0, 1, 2, 3])
def test_lossless_roundtrip_levels(levels):
    img = _smooth(33, 41)
    out = jpx_decode(jpx_encode(img, levels=levels))
    assert out["width"] == 41 and out["height"] == 33
    assert out["n_components"] == 1
    assert np.array_equal(out["samples"][:, :, 0], img)


@pytest.mark.parametrize("prog", [0, 1, 2, 3, 4])
def test_lossless_roundtrip_progressions(prog):
    img = _noise(21, 26)
    out = jpx_decode(jpx_encode(img, prog=prog))
    assert np.array_equal(out["samples"][:, :, 0], img)


@pytest.mark.parametrize("cblk,segsym", [
    ((8, 8), False), ((16, 32), True), ((64, 64), False), ((4, 16), True),
])
def test_lossless_roundtrip_codeblocks(cblk, segsym):
    img = _noise(40, 40, seed=5)
    out = jpx_decode(jpx_encode(img, cblk=cblk, segsym=segsym))
    assert np.array_equal(out["samples"][:, :, 0], img)


def test_lossless_roundtrip_tiled():
    img = _noise(70, 100, seed=9)
    out = jpx_decode(jpx_encode(img, levels=2, tile_size=(32, 32)))
    assert np.array_equal(out["samples"][:, :, 0], img)


def test_tile_size_parity_enforced():
    # odd tile sizes would flip subband parity mid-image; encoder refuses
    with pytest.raises(JPXError):
        jpx_encode(_smooth(64, 64), levels=2, tile_size=(30, 30))


def test_rgb_rct_lossless_exact():
    rgb = _noise(24, 19, 3, seed=2)
    out = jpx_decode(jpx_encode(rgb, reversible=True))
    assert out["n_components"] == 3
    assert np.array_equal(out["samples"], rgb)


def test_four_components_no_mct():
    arr = _noise(13, 17, 4, seed=7)
    out = jpx_decode(jpx_encode(arr, mct=False))
    assert out["n_components"] == 4
    assert np.array_equal(out["samples"], arr)


def test_single_row_and_column_images():
    for shape in ((1, 37), (37, 1), (1, 1), (2, 3)):
        img = _noise(*shape, seed=sum(shape))
        out = jpx_decode(jpx_encode(img, levels=2))
        assert np.array_equal(out["samples"][:, :, 0], img)


# ---------------------------------------------------------------------------
# Lossy (9/7): bounded error, monotone rate/distortion in the step


def test_lossy_rate_distortion_monotone():
    img = _smooth(64, 80)
    sizes, errs = [], []
    for delta in (0.5, 2.0, 8.0):
        enc = jpx_encode(img, reversible=False, delta=delta, levels=3)
        out = jpx_decode(enc)
        err = np.abs(
            out["samples"][:, :, 0].astype(int) - img.astype(int)
        )
        sizes.append(len(enc))
        errs.append(err.max())
        # reconstruction error is bounded by a small multiple of the
        # step (midpoint dequantization + 4 wavelet levels of gain)
        assert err.max() <= 2 * delta + 1
    assert sizes == sorted(sizes, reverse=True)  # coarser -> smaller
    assert errs == sorted(errs)  # coarser -> worse


def test_lossy_rgb_ict():
    rgb = np.stack([_smooth(40, 50), _smooth(40, 50)[::-1],
                    np.roll(_smooth(40, 50), 7, 0)], axis=2)
    out = jpx_decode(jpx_encode(rgb, reversible=False, delta=1.0))
    assert np.abs(
        out["samples"].astype(int) - rgb.astype(int)
    ).max() <= 4


# ---------------------------------------------------------------------------
# JP2 container


def test_jp2_container_roundtrip():
    img = _noise(15, 22, seed=4)
    enc = jpx_encode(img, jp2=True)
    assert enc[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    out = jpx_decode(enc)
    assert np.array_equal(out["samples"][:, :, 0], img)


def test_imagefile_sniff_and_decode():
    from pdfplumber_spark.kernel.imagefile import decode_image, sniff_format

    img = _noise(9, 14, seed=6)
    for jp2 in (False, True):
        enc = jpx_encode(img, jp2=jp2)
        assert sniff_format(enc) == "jp2"
        d = decode_image(enc)
        assert d["format"] == "jp2"
        assert (d["width"], d["height"], d["channels"]) == (14, 9, 1)
        assert np.array_equal(d["samples"][:, :, 0], img)


# ---------------------------------------------------------------------------
# Robustness: truncation, garbage, unsupported styles


def test_truncated_stream_raises():
    enc = jpx_encode(_noise(20, 20, seed=8))
    for cut in (4, len(enc) // 2, len(enc) - 3):
        with pytest.raises(JPXError):
            jpx_decode(enc[:cut])


def test_garbage_rejected():
    for junk in (b"", b"\x00" * 40, b"not a codestream",
                 zlib.compress(b"x" * 100)):
        with pytest.raises(JPXError):
            jpx_decode(junk)


def test_random_bytes_never_hang():
    rng = np.random.RandomState(12)
    enc = bytearray(jpx_encode(_noise(16, 16, seed=3)))
    for _ in range(40):
        pos = rng.randint(4, len(enc))
        mut = bytes(enc[:pos]) + bytes(
            rng.randint(0, 256, 8, dtype=np.uint8).tobytes()
        ) + bytes(enc[pos:])
        try:
            jpx_decode(mut)
        except JPXError:
            pass  # any structured failure is fine; hangs/crashes are not


def test_subsampling_factor_bounds():
    # round-7: subsampling is SUPPORTED (1..4); out-of-range factors
    # still classify. Patch XRsiz of component 0 to 5.
    enc = bytearray(jpx_encode(_noise(12, 12, seed=1)))
    siz = enc.index(b"\xff\x51")
    # SIZ body: Lsiz(2) Rsiz(2) Xsiz(4) Ysiz(4) XOsiz(4) YOsiz(4)
    # XTsiz(4) YTsiz(4) XTOsiz(4) YTOsiz(4) Csiz(2) then per-comp
    # Ssiz(1) XRsiz(1) YRsiz(1)
    xrsiz_off = siz + 2 + 2 + 2 + 8 * 4 + 2 + 1
    assert enc[xrsiz_off] == 1
    enc[xrsiz_off] = 5
    with pytest.raises(JPXError, match="subsampling"):
        jpx_decode(bytes(enc))


# ---------------------------------------------------------------------------
# PDF end-to-end (shared deterministic ground truth) + corpus presence


def test_pdf_end_to_end_pixels_gray_and_rgb():
    from pdfplumber_spark.kernel.images import image_xobjects
    from pdfplumber_spark.kernel.pdfgen import (
        image_codes, image_samples, make_pdf)

    for seed in (0, 1, 2, 3, 4):  # covers both wraps + all 5 prog orders
        pdf = make_pdf([{
            "width": 612, "height": 792, "texts": [],
            "images": [
                {"x": 72, "top": 100, "w": 50, "h": 50, "pw": 9, "ph": 7,
                 "channels": 1, "seed": seed, "format": "jpx"},
                {"x": 150, "top": 100, "w": 50, "h": 50, "pw": 6,
                 "ph": 11, "channels": 3, "seed": seed + 100,
                 "format": "jpx"},
            ],
        }])
        gray, rgb = image_xobjects(pdf)
        assert gray["status"] == "ok"
        assert (gray["width"], gray["height"], gray["channels"]) == (9, 7, 1)
        assert gray["samples"] == bytes(image_codes(seed, 9, 7, 1, 256))
        assert rgb["status"] == "ok"
        assert rgb["colorspace"] == "DeviceRGB"
        assert rgb["samples"] == image_samples(seed + 100, 6, 11, 3)


def test_pdf_dimension_mismatch_flags_error():
    from pdfplumber_spark.kernel.images import image_xobjects
    from pdfplumber_spark.kernel.pdfgen import make_pdf

    pdf = make_pdf([{
        "width": 200, "height": 200,
        "images": [{"x": 10, "top": 10, "w": 50, "h": 50, "pw": 8,
                    "ph": 6, "channels": 1, "seed": 3, "format": "jpx"}],
    }])
    # corrupt the dict's /Width (codestream says 8): engine flags 'error'
    bad = pdf.replace(b"/Width 8/Height 6", b"/Width 9/Height 6")
    assert bad != pdf
    (row,) = image_xobjects(bad)
    assert row["status"] == "error"


def test_corpus_images_family_carries_jpx():
    import random as _r

    from pdfplumber_spark.sources.corpus import _pdf_images

    payload = _pdf_images(_r.Random(5))
    assert payload.count(b"/JPXDecode") >= 2  # gray + rgb matrix rows


def test_oracle_scanner_agrees_on_jpx_rows():
    """The INDEPENDENT-path contract: sources/expected.py re-decodes
    /JPXDecode streams through the shared kernel and must land on the
    same (status, channel, pixel) result the engine does."""
    from pdfplumber_spark.kernel.images import image_xobjects
    from pdfplumber_spark.kernel.pdfgen import make_pdf

    pdf = make_pdf([{
        "width": 612, "height": 792, "texts": [],
        "images": [
            {"x": 72, "top": 100, "w": 50, "h": 50, "pw": 7, "ph": 5,
             "channels": 1, "seed": 42, "format": "jpx"},
            {"x": 150, "top": 100, "w": 50, "h": 50, "pw": 5, "ph": 4,
             "channels": 3, "seed": 43, "format": "jpx"},
        ],
    }])
    import re

    from pdfplumber_spark.kernel.jpx import jpx_decode as kernel_decode

    rows = image_xobjects(pdf)
    bodies = []
    for m in re.finditer(rb"(<<[^>]*?/JPXDecode[^>]*?>>)\s*stream\r?\n",
                         pdf, re.S):
        ln = int(re.search(rb"/Length (\d+)", m.group(1)).group(1))
        bodies.append(pdf[m.end():m.end() + ln])
    assert len(bodies) == 2
    for row, body in zip(rows, bodies):
        d = kernel_decode(body)
        assert row["status"] == "ok"
        assert d["samples"].tobytes() == row["samples"]


# ---------------------------------------------------------------------------
# Selective arithmetic coding bypass (round-7; T.800 D.6)


def test_bypass_t1_roundtrip_matrix():
    """Tier-1 bypass segments vs the plain path: same values decode
    from both codings across bands, dims, and magnitude depths (deep
    enough that several raw SPP/MRP pairs engage — raw starts at pass
    10, i.e. the 5th bitplane)."""
    import random as _r

    from pdfplumber_spark.kernel.jpx import (
        t1_decode_segments,
        t1_encode_bypass,
    )

    rng = _r.Random(77)
    for trial in range(24):
        w, h = rng.randint(1, 20), rng.randint(1, 20)
        magbits = rng.randint(1, 13)  # > 5 planes engages raw passes
        vals = [rng.randint(-(1 << magbits), 1 << magbits)
                for _ in range(w * h)]
        band = rng.choice(["LL", "HL", "LH", "HH"])
        segsym = rng.random() < 0.3
        segs, npasses, planes = t1_encode_bypass(vals, w, h, band, segsym)
        if not planes:
            continue
        if planes >= 5:
            assert len(segs) > 1, "deep block must have raw segments"
        m, s = t1_decode_segments(segs, w, h, band, planes, segsym, True)
        got = [(-v if sg else v) for v, sg in zip(m, s)]
        assert got == vals, (trial, w, h, band)


def test_bypass_end_to_end_matrix():
    """Full codestream roundtrips with the bypass style flag: lossless
    bit-exact, irreversible within quantizer tolerance, across levels,
    MCT, tiles, and progression orders."""
    rng = np.random.RandomState(41)
    cases = [
        dict(shape=(21, 17), levels=1),
        dict(shape=(32, 32, 3), levels=2, prog=2),
        dict(shape=(48, 48), levels=2, segsym=True),
        dict(shape=(64, 40, 3), levels=2, tile_size=(32, 32), prog=4),
    ]
    for case in cases:
        shape = case.pop("shape")
        img = rng.randint(0, 256, shape).astype(np.uint8)
        enc = jpx_encode(img, reversible=True, bypass=True, **case)
        got = jpx_decode(enc)["samples"]
        if img.ndim == 2:
            got = got[:, :, 0]
        assert (got == img).all(), case
        enc = jpx_encode(img, reversible=False, bypass=True,
                         delta=0.5, **case)
        got = jpx_decode(enc)["samples"]
        if img.ndim == 2:
            got = got[:, :, 0]
        err = np.abs(got.astype(int) - img.astype(int)).max()
        assert err <= 3, (case, err)


def test_bypass_flag_read_from_codestream():
    """The COD cbstyle bypass bit must actually round the decoder's
    bypass path (not be ignored): flipping it off on a bypass-coded
    stream must NOT decode to the original."""
    img = (np.arange(24 * 24) * 7 % 256).astype(np.uint8).reshape(24, 24)
    enc = bytearray(jpx_encode(img, levels=1, reversible=True,
                               bypass=True))
    cod = enc.index(b"\xff\x52")
    # COD body: Lcod(2) Scod(1) SGcod(4) SPcod: levels(1) xcb(1) ycb(1)
    # cbstyle(1) ...
    cb_off = cod + 2 + 2 + 1 + 4 + 3
    assert enc[cb_off] & 1, "bypass bit expected in fixture"
    enc[cb_off] &= ~1
    try:
        got = jpx_decode(bytes(enc))["samples"][:, :, 0]
        assert not (got == img).all()
    except JPXError:
        pass  # structured failure equally proves the bit matters


def test_bypass_garbage_never_hangs():
    rng = np.random.RandomState(9)
    enc = bytearray(jpx_encode(_noise(16, 16, seed=5), bypass=True))
    for _ in range(60):
        bad = bytearray(enc)
        for _m in range(rng.randint(1, 5)):
            bad[rng.randint(4, len(bad))] = rng.randint(0, 256)
        try:
            jpx_decode(bytes(bad))
        except JPXError:
            pass


def test_all_codeblock_styles_matrix():
    """Round-7 closes the style matrix: every combination of bypass /
    termall / reset / causal roundtrips, reversible bit-exact and
    irreversible within quantizer tolerance."""
    import itertools

    rng = np.random.RandomState(63)
    img = rng.randint(0, 256, (33, 29)).astype(np.uint8)
    rgb = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    for bypass, termall, reset, causal in itertools.product(
        (False, True), repeat=4
    ):
        enc = jpx_encode(img, levels=2, reversible=True, bypass=bypass,
                         termall=termall, reset=reset, causal=causal)
        got = jpx_decode(enc)["samples"][:, :, 0]
        assert (got == img).all(), (bypass, termall, reset, causal)
        enc = jpx_encode(rgb, levels=1, reversible=False, delta=0.5,
                         bypass=bypass, termall=termall, reset=reset,
                         causal=causal)
        got = jpx_decode(enc)["samples"]
        err = np.abs(got.astype(int) - rgb.astype(int)).max()
        assert err <= 3, (bypass, termall, reset, causal, err)


@pytest.mark.parametrize("bit,name", [(2, "reset"), (4, "termall"),
                                      (8, "causal")])
def test_style_bits_change_the_coding(bit, name):
    """Each newly supported style bit must actually round the decoder's
    behaviour: clearing it on a styled stream must not decode to the
    original (or must fail structurally)."""
    img = (np.arange(28 * 28) * 11 % 256).astype(np.uint8).reshape(28, 28)
    enc = bytearray(jpx_encode(
        img, levels=1, reversible=True,
        termall=bit == 4, reset=bit == 2, causal=bit == 8,
    ))
    cod = enc.index(b"\xff\x52")
    cb_off = cod + 2 + 2 + 1 + 4 + 3
    assert enc[cb_off] & bit, name
    enc[cb_off] &= ~bit & 0xFF
    try:
        got = jpx_decode(bytes(enc))["samples"][:, :, 0]
        assert not (got == img).all(), name
    except JPXError:
        pass


def test_precinct_partitions_roundtrip_matrix():
    """Round-7: user-defined precinct partitions (Scod bit 0) — per-
    precinct packets and tag trees over the B.6 resolution-grid counts.
    Non-square precincts, multiple levels, RGB, bypass combination,
    tiled, lossless + lossy."""
    rng = np.random.RandomState(77)
    cases = [
        dict(shape=(70, 90), levels=2, precincts=(6, 6)),
        dict(shape=(64, 64, 3), levels=1, precincts=(5, 6), prog=1),
        dict(shape=(128, 100), levels=3, precincts=(7, 7), cblk=(64, 64)),
        dict(shape=(40, 200), levels=2, precincts=(6, 5), segsym=True),
        dict(shape=(90, 90), levels=2, precincts=(5, 5), bypass=True),
        dict(shape=(96, 64), levels=2, precincts=(5, 5),
             tile_size=(32, 32)),
    ]
    for case in cases:
        shape = case.pop("shape")
        img = rng.randint(0, 256, shape).astype(np.uint8)
        enc = jpx_encode(img, reversible=True, **case)
        got = jpx_decode(enc)["samples"]
        if img.ndim == 2:
            got = got[:, :, 0]
        assert (got == img).all(), case
        enc = jpx_encode(img, reversible=False, delta=0.5, **case)
        got = jpx_decode(enc)["samples"]
        if img.ndim == 2:
            got = got[:, :, 0]
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 3, case


def test_precinct_flag_and_rejections():
    img = (np.arange(48 * 48) * 5 % 256).astype(np.uint8).reshape(48, 48)
    # the Scod precinct bit must matter: stripping the per-res bytes
    # desynchronizes the codestream
    enc = bytearray(jpx_encode(img, levels=1, precincts=(5, 5)))
    cod = enc.index(b"\xff\x52")
    assert enc[cod + 4] & 1  # Scod precinct bit
    with pytest.raises(JPXError):
        jpx_encode(img, levels=1, precincts=(5, 5), prog=2)  # RPCL
    with pytest.raises(JPXError):
        jpx_encode(img, levels=1, precincts=(0, 5))  # out of range
    # sub-code-block precincts clamp the effective block size and still
    # roundtrip (B.7)
    enc2 = jpx_encode(img, levels=2, precincts=(4, 4), cblk=(64, 64))
    assert (jpx_decode(enc2)["samples"][:, :, 0] == img).all()


def test_precinct_garbage_never_hangs():
    rng = np.random.RandomState(13)
    enc = bytearray(jpx_encode(_noise(32, 32, seed=2), levels=2,
                               precincts=(5, 5)))
    for _ in range(50):
        bad = bytearray(enc)
        for _m in range(rng.randint(1, 5)):
            bad[rng.randint(4, len(bad))] = rng.randint(0, 256)
        try:
            jpx_decode(bytes(bad))
        except JPXError:
            pass


def test_component_subsampling():
    """Round-7: per-component subsampling (SIZ XRsiz/YRsiz) — each
    component codes on its own ceil(tile/factor) grid and is
    nearest-neighbour upsampled before the inverse MCT. Decimation is
    the encoder's down-filter, so 2x2-constant images roundtrip
    exactly; arbitrary images reproduce decimate-then-upsample."""
    rng = np.random.RandomState(31)
    rgb = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    subs = [(1, 1), (2, 2), (2, 2)]
    enc = jpx_encode(rgb, levels=1, reversible=True, mct=False,
                     subsampling=subs)
    got = jpx_decode(enc)["samples"]
    exp = np.zeros_like(rgb)
    for c, (xr, yr) in enumerate(subs):
        d = rgb[::yr, ::xr, c]
        exp[:, :, c] = d[(np.arange(24) // yr)[:, None],
                         (np.arange(32) // xr)[None, :]]
    assert (got == exp).all()
    # 2x2-constant blocks: decimation lossless -> exact through MCT too
    blocky = np.repeat(np.repeat(
        rng.randint(0, 256, (12, 16, 3)).astype(np.uint8), 2, 0), 2, 1)
    enc = jpx_encode(blocky, levels=1, reversible=True, mct=True,
                     subsampling=subs)
    assert (jpx_decode(enc)["samples"] == blocky).all()
    # tiled + subsampled (tile size multiple of the factors)
    enc = jpx_encode(rgb[:16, :32], levels=1, reversible=True, mct=False,
                     subsampling=subs, tile_size=(16, 16))
    got = jpx_decode(enc)["samples"]
    exp2 = np.zeros_like(rgb[:16, :32])
    for c, (xr, yr) in enumerate(subs):
        for tx in range(2):
            tile = rgb[:16, tx * 16:(tx + 1) * 16, c]
            d = tile[::yr, ::xr]
            exp2[:16, tx * 16:(tx + 1) * 16, c] = d[
                (np.arange(16) // yr)[:, None],
                (np.arange(16) // xr)[None, :]]
    assert (got == exp2).all()
    # tile size misaligned with the factor classifies unsupported
    with pytest.raises(JPXError):
        jpx_decode(jpx_encode(rgb, levels=1,
                              subsampling=[(1, 1), (4, 4), (4, 4)],
                              tile_size=(18, 18)))
