"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode step is STUBBED behind a deterministic fake (clearly marked) — the
Spark-side plumbing (schemas, batching, partitioning, UDF signatures) is
real and tested. On a real cluster, swap ``_decode_image_stub`` for a
Pillow/ffmpeg call with the same signature; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def _sniff_format(data: bytes) -> str:
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


def _decode_image_stub(data: bytes):
    """STUB: deterministic fake decode (no imaging libs in this container).

    Real deployment: replace body with e.g. PIL.Image.open(BytesIO(data));
    signature and callers stay identical.
    """
    fmt = _sniff_format(data)
    if fmt in ("png", "jpeg", "gif", "webp"):
        # dims parsed from real headers where trivially possible (png)
        if fmt == "png" and len(data) >= 24:
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            return fmt, w, h
        return fmt, None, None
    raise NotImplementedError(f"decode not available for format={fmt}")


def _payload_to_image_row(url, payload) -> tuple:
    """Per-payload metadata row (IMAGE_META_SCHEMA order) — shared by the
    Spark operator and the materialized single-process oracle."""
    if payload is None:
        return (url, 0, None, None, None, None, "error")
    data = bytes(payload)
    sha = hashlib.sha256(data).hexdigest()
    try:
        fmt, w, h = _decode_image_stub(data)
        return (url, len(data), fmt, w, h, sha, "ok")
    except NotImplementedError:
        return (url, len(data), _sniff_format(data), None, None, sha,
                "unsupported")


def image_metadata(df: DataFrame, url_col: str = "url", bin_col: str = "html") -> DataFrame:
    """binary column -> typed metadata rows (mapInPandas, Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                _payload_to_image_row(url, payload)
                for url, payload in zip(b[url_col], b[bin_col])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select(url_col, bin_col).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def binary_features(
    df: DataFrame, url_col: str = "url", bin_col: str = "html", dim: int = 16
) -> DataFrame:
    """Deterministic byte-histogram feature vector per payload — the fake
    stand-in for an image-embedding model, with the real batch shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for url, payload in zip(b[url_col], b[bin_col]):
                if payload is None:
                    rows.append((url, None, "error"))
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(arr) == 0:
                    rows.append((url, [0.0] * dim, "ok"))
                    continue
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                feat = (hist / max(1, len(arr))).astype(np.float32)
                rows.append((url, feat.tolist(), "ok"))
            yield pd.DataFrame(rows, columns=["url", "feature", "status"])

    return df.select(url_col, bin_col).mapInPandas(run, schema=FEATURE_SCHEMA)
