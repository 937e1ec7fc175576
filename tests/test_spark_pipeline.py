"""Spark-path vs oracle byte-identity on the synthetic corpus, plus plan
shape checks (shuffle count, partition locality)."""

import os

import pandas as pd
import pytest

from pdfplumber_spark.plans import extract as X
from pdfplumber_spark.sources.corpus import generate_rows, write_corpus_parquet


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "pages.parquet"
    n = write_corpus_parquet(str(p), n_docs=40, seed=7)
    assert n == 40
    return str(p)


@pytest.fixture(scope="module")
def pages_df(spark, corpus_path):
    return X.read_pages(spark, corpus_path)


def test_extract_text_matches_oracle_byte_identical(spark, pages_df, corpus_path):
    got = (
        X.extract_text(pages_df, num_partitions=8)
        .toPandas()
        .sort_values(["url", "page_number"])
        .reset_index(drop=True)
    )
    oracle_rows = [(r["url"], r["html"]) for r in generate_rows(40, seed=7)]
    exp = (
        X.oracle_extract_text(oracle_rows)
        .sort_values(["url", "page_number"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["url"] == exp["url"]).all()
    assert (got["status"] == exp["status"]).all()
    ok = exp["status"] == "ok"
    # BYTE identity of extracted text per (url, page)
    assert (
        got.loc[ok, "text"].fillna("") == exp.loc[ok, "text"].fillna("")
    ).all()
    # broken family produced error rows, not job failure
    assert (exp["status"] == "error").any()


def test_extract_text_layout_matches_oracle(spark, pages_df):
    got = (
        X.extract_text(pages_df, layout=True, num_partitions=8)
        .where("status = 'ok'")
        .toPandas()
        .sort_values(["url", "page_number"])
        .reset_index(drop=True)
    )
    oracle_rows = [(r["url"], r["html"]) for r in generate_rows(40, seed=7)]
    exp = X.oracle_extract_text(oracle_rows, layout=True)
    exp = exp[exp["status"] == "ok"].sort_values(["url", "page_number"]).reset_index(drop=True)
    assert (got["text"].fillna("") == exp["text"].fillna("")).all()


def test_document_text_joins_pages(spark, pages_df):
    ext = X.extract_text(pages_df, num_partitions=8)
    doc = X.document_text(ext).toPandas()
    multi = ext.where("status='ok'").groupBy("url").count().where("count > 1").toPandas()
    if len(multi):
        u = multi["url"].iloc[0]
        assert X.PAGE_SEP in doc[doc["url"] == u]["text"].iloc[0]


def test_extract_words_nonempty(spark, pages_df):
    words = X.extract_words(pages_df, num_partitions=8).toPandas()
    assert len(words) > 100
    assert set(words["direction"].unique()) <= {"ltr", "rtl", "ttb", "btt"}
    assert (words["x1"] >= words["x0"]).all()


def test_extract_tables_lattice(spark, pages_df):
    tables = X.extract_tables(pages_df, num_partitions=8).toPandas()
    lat = tables[tables["url"].str.contains("table-lattice")]
    assert len(lat) > 0
    # cell texts look like the written c{row}{col} markers
    assert lat["text"].str.match(r"c\d+\d+ \w+").any()


def test_single_shuffle_plan(spark, pages_df):
    """The text plan must contain exactly one Exchange (the url repartition).

    At 100 TB every extra exchange is hours — pin the plan shape.
    """
    plan = X.extract_text(pages_df, num_partitions=8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
