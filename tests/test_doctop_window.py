"""Doc-level doctop window recompute (pdf.py:135-144 semantics) over the
salted objects path."""

import pytest

from pdfplumber_spark.plans.extract import (
    extract_objects,
    extract_page_meta,
    read_pages,
    with_doc_doctop,
)
from pdfplumber_spark.sources.corpus import write_corpus_parquet


def test_doctop_window_matches_parse(spark, tmp_path):
    p = str(tmp_path / "pages.parquet")
    write_corpus_parquet(p, n_docs=10, seed=21)
    pages = read_pages(spark, p)
    objs = extract_objects(pages, num_partitions=4)
    meta = extract_page_meta(pages, num_partitions=4)
    # strip doctop, recompute via the window, compare to the parse's value
    recomputed = with_doc_doctop(
        objs.select("url", "page_number", "obj_index", "object_type", "top",
                    objs.doctop.alias("doctop_parse")),
        meta,
    ).toPandas()
    assert len(recomputed) > 0
    diff = (recomputed["doctop"] - recomputed["doctop_parse"]).abs()
    assert diff.max() < 1e-9
    multi = recomputed[recomputed["page_number"] > 1]
    assert len(multi) > 0  # fixture includes multi-page docs
