"""Pin the from-scratch JPEG codec against the SYSTEM libjpeg (the
library PIL wraps behind the reference's ``display.py:36-90``) — the one
oracle that can catch a self-consistent sign error our encoder/decoder
roundtrip tests cannot (a flipped convention on both sides still
roundtrips).

Checks, per fixture:
- gray / RGB: libjpeg decode == our decode (±2 per sample: both IDCTs
  are float approximations of T.81 Annex A).
- CMYK transform 0 (Adobe): libjpeg's JCS_CMYK output is the STORED
  (inverted) channels, so ours == 255 - libjpeg's.
- YCCK transform 2: libjpeg ycck_cmyk output = (255-R, 255-G, 255-B, K
  stored); ours applies the consumer-side Adobe inversion on top, so
  ours == 255 - libjpeg's — this pins the jccolor.c sign audit in
  ``_finish_planes``.

Skips cleanly when cc or jpeglib.h is unavailable.
"""

import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from pdfplumber_spark.kernel.jpeg import (
    jpeg_decode,
    jpeg_encode_cmyk,
    jpeg_encode_gray,
    jpeg_encode_gray_progressive,
)

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def oracle_bin():
    if shutil.which("cc") is None or not os.path.exists(
        "/usr/include/jpeglib.h"
    ):
        pytest.skip("no system cc/libjpeg")
    exe = os.path.join(tempfile.mkdtemp(prefix="jpeg_oracle_"), "jpeg_oracle")
    r = subprocess.run(
        ["cc", "-O2", "-o", exe, os.path.join(HERE, "jpeg_oracle.c"),
         "-ljpeg"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"jpeg_oracle build failed: {r.stderr[:200]}")
    return exe


def _oracle_decode(exe: str, data: bytes) -> np.ndarray:
    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        r = subprocess.run([exe, path], capture_output=True, timeout=60)
        assert r.returncode == 0, r.stderr[:200]
        head, _, raw = r.stdout.partition(b"\n")
        w, h, n = (int(x) for x in head.split())
        return np.frombuffer(raw, np.uint8).reshape(h, w, n)
    finally:
        os.unlink(path)


def _smooth(h, w, c, seed):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = [
        np.clip(
            128 + 90 * np.sin(xx / (5 + i) + seed) * np.cos(yy / (7 + i)),
            0, 255,
        )
        for i in range(c)
    ]
    return np.stack(chans, axis=2).astype(np.uint8)


def test_gray_matches_libjpeg(oracle_bin):
    img = _smooth(33, 41, 1, 0.3)[:, :, 0]
    data = jpeg_encode_gray(img)
    ours = jpeg_decode(data)["samples"][:, :, 0]
    ref = _oracle_decode(oracle_bin, data)[:, :, 0]
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_gray_progressive_matches_libjpeg(oracle_bin):
    img = _smooth(24, 24, 1, 1.1)[:, :, 0]
    data = jpeg_encode_gray_progressive(img)
    ours = jpeg_decode(data)["samples"][:, :, 0]
    ref = _oracle_decode(oracle_bin, data)[:, :, 0]
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


@pytest.mark.parametrize("transform", [0, 2])
def test_cmyk_convention_matches_libjpeg(oracle_bin, transform):
    """ours (true CMYK) == 255 - libjpeg JCS_CMYK (stored convention)."""
    img = _smooth(25, 38, 4, 2.0 + transform)
    data = jpeg_encode_cmyk(img, transform=transform)
    ours = jpeg_decode(data)["samples"]
    ref = _oracle_decode(oracle_bin, data)
    assert ref.shape == ours.shape == (25, 38, 4)
    diff = np.abs(ours.astype(int) - (255 - ref.astype(int))).max()
    assert diff <= 2, diff


def test_cmyk_no_adobe_raw_passthrough(oracle_bin):
    """Without the Adobe marker both sides agree the data is raw CMYK:
    libjpeg passes the stored channels through and so do we (no
    inversion) — ours == libjpeg's directly."""
    img = _smooth(16, 16, 4, 5.0)
    data = jpeg_encode_cmyk(img, transform=0, adobe=False)
    ours = jpeg_decode(data)["samples"]
    ref = _oracle_decode(oracle_bin, data)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2
