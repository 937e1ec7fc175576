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
