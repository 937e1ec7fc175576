"""Structured Streaming ingestion: arriving crawl batches -> extracted
text, exactly-once across restarts (checkpoint)."""

import os
import shutil

import pytest

from pdfplumber_spark.sources.corpus import write_corpus_parquet
from pdfplumber_spark.streaming.ingest import stream_extract_text


def test_stream_extract_incremental(spark, tmp_path):
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    # batch 1 arrives
    write_corpus_parquet(os.path.join(indir, "batch1.parquet"), n_docs=8, seed=31)
    q = stream_extract_text(spark, indir, outdir, ckpt)
    q.awaitTermination(300)
    n1 = spark.read.parquet(outdir).count()
    assert n1 > 0

    # batch 2 arrives; restart drains ONLY the new file (checkpoint)
    write_corpus_parquet(os.path.join(indir, "batch2.parquet"), n_docs=5, seed=32)
    q = stream_extract_text(spark, indir, outdir, ckpt)
    q.awaitTermination(300)
    out = spark.read.parquet(outdir)
    n2 = out.count()
    # exactly-once: only batch2's pages were appended on restart
    from pdfplumber_spark.plans.extract import extract_text, read_pages

    batch2_rows = extract_text(
        read_pages(spark, os.path.join(indir, "batch2.parquet"))
    ).count()
    assert n2 == n1 + batch2_rows

    # a third restart with no new data appends nothing
    q = stream_extract_text(spark, indir, outdir, ckpt)
    q.awaitTermination(300)
    assert spark.read.parquet(outdir).count() == n2


def _write_pages(path, rows):
    """rows: list of (url, payload_bytes)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    table = pa.Table.from_pylist(
        [
            {"url": u, "warc_ts": ts, "html": p, "text": None, "lang": "en"}
            for u, p in rows
        ],
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


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """Stateful streaming dedup (applyInPandasWithState): within-batch
    dups collapse to the min-url row; cross-batch dups are dropped by
    state RESTORED FROM THE CHECKPOINT on restart; new content passes."""
    from pdfplumber_spark.streaming.ingest import stream_dedup_first_seen

    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    pay_a, pay_b, pay_c = b"payload-A" * 10, b"payload-B" * 10, b"payload-C" * 10
    # batch 1: A twice (u1, u2) and B once
    _write_pages(
        os.path.join(indir, "b1.parquet"),
        [("u2", pay_a), ("u1", pay_a), ("u3", pay_b)],
    )
    q = stream_dedup_first_seen(spark, indir, outdir, ckpt)
    q.awaitTermination(300)
    out1 = {r["url"] for r in spark.read.parquet(outdir).collect()}
    assert out1 == {"u1", "u3"}  # min url per hash, one row per content

    # batch 2: A again (must be dropped by restored state) + new C
    _write_pages(
        os.path.join(indir, "b2.parquet"),
        [("u9", pay_a), ("u4", pay_c)],
    )
    q = stream_dedup_first_seen(spark, indir, outdir, ckpt)
    q.awaitTermination(300)
    out2 = {r["url"] for r in spark.read.parquet(outdir).collect()}
    assert out2 == {"u1", "u3", "u4"}

    # restart with nothing new: no extra rows
    q = stream_dedup_first_seen(spark, indir, outdir, ckpt)
    q.awaitTermination(300)
    assert spark.read.parquet(outdir).count() == 3
