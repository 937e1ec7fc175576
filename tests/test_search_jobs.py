"""Search plan + jobs CLI surfaces."""

import json
import os
import subprocess
import sys

import pytest

from pdfplumber_spark.plans.extract import extract_text, read_pages
from pdfplumber_spark.plans.search import extract_text_lines, search_pages
from pdfplumber_spark.sources.corpus import write_corpus_parquet


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("s") / "pages.parquet"
    write_corpus_parquet(str(p), n_docs=20, seed=5)
    return str(p)


def test_search_matches_have_bboxes(spark, corpus):
    pages = read_pages(spark, corpus)
    m = search_pages(pages, r"[a-z]{6,}", num_partitions=4).toPandas()
    assert len(m) > 0
    assert (m["x1"] > m["x0"]).all()
    assert (m["bottom"] > m["top"]).all()
    assert m["text"].str.match(r"[a-z]{6,}").all()


def test_text_lines_match_extracted_text(spark, corpus):
    pages = read_pages(spark, corpus)
    lines = extract_text_lines(pages, num_partitions=4).toPandas()
    assert len(lines) > 0
    # every extracted line must appear in the page's plain text
    ext = extract_text(pages, num_partitions=4).where("status='ok'").toPandas()
    text_by_key = {
        (r.url, r.page_number): r.text for r in ext.itertuples()
    }
    sample = lines.head(50)
    for r in sample.itertuples():
        page_text = text_by_key.get((r.url, r.page_number))
        if page_text is None:
            continue
        # layout-mode lines collapse to space-joined words in plain mode
        for w in r.text.split()[:3]:
            assert w in page_text, (r.url, w)


def test_jobs_cli_roundtrip(corpus, tmp_path):
    out = str(tmp_path / "cli")
    res = subprocess.run(
        [sys.executable, "-m", "pdfplumber_spark.jobs", "extract",
         "--input", corpus, "--output", out, "--local-cores", "2",
         "--buckets", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["buckets_done"] == 2
    assert summary["pages_ok"] > 0
