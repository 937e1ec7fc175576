"""Mega-document page salting: exploded path must equal the plain path."""

import pytest

from pdfplumber_spark.plans.extract import (
    extract_text,
    extract_text_salted,
    read_pages,
)
from pdfplumber_spark.sources.corpus import write_corpus_parquet


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("skew") / "pages.parquet"
    write_corpus_parquet(str(p), n_docs=12, seed=9, mega_pages=80)
    return str(p)


def test_salted_equals_plain(spark, corpus):
    pages = read_pages(spark, corpus)
    plain = (
        extract_text(pages, num_partitions=8)
        .toPandas()
        .sort_values(["url", "page_number"])
        .reset_index(drop=True)
    )
    salted = (
        extract_text_salted(pages, page_threshold=20, num_partitions=8)
        .toPandas()
        .sort_values(["url", "page_number"])
        .reset_index(drop=True)
    )
    assert len(plain) == len(salted)
    assert (plain["url"] == salted["url"]).all()
    assert (plain["page_number"] == salted["page_number"]).all()
    assert (plain["text"].fillna("") == salted["text"].fillna("")).all()
    # the mega doc (80 pages) was actually exploded
    mega = salted[salted["url"].str.contains("mega")]
    assert len(mega) == 80


def test_explode_partition_spread(spark, corpus):
    """Exploded mega pages land in many partitions, not one."""
    from pyspark.sql import functions as F

    from pdfplumber_spark.plans.extract import explode_skewed

    exploded = explode_skewed(read_pages(spark, corpus), page_threshold=20)
    exploded = exploded.repartition(8, F.xxhash64("url", "page_base"))
    pid = exploded.withColumn("pid", F.spark_partition_id())
    mega = pid.where("url like '%mega%'").select("pid").distinct().count()
    assert mega >= 4  # 80 pages spread over >= half the partitions
