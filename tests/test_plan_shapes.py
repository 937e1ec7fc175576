"""Physical-plan shape audit for the round-4 operators: the plan you'd
want at 100 TB, pinned so a refactor can't silently regress it.

- no CartesianProduct anywhere (every pair generation is an equi-join on
  a bucket/fingerprint/cluster key);
- predicate pushdown reaches the parquet scan for the sliced board rows;
- the LSH candidate join carries ids only (vectors are NOT in the
  self-join output columns before dedup).
"""

import pytest

import __spark_entry__ as E
from conftest import SF_CORRECT


def _plan(spark, name: str) -> str:
    df = E.queries()[name](spark, SF_CORRECT)
    return df._jdf.queryExecution().executedPlan().toString()


NO_CARTESIAN = [
    "winnow_overlap",
    "minhash_pairs",
    "minhash_dedup_cc",
    "simhash_pairs",
    "jaccard_pairs",
    "quality",  # carries the repetition join since the round-6 board merge
    "ngram_counts",
    "quality_filter",
]


@pytest.mark.parametrize("name", NO_CARTESIAN)
def test_no_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
    import pdfplumber_spark

    pdfplumber_spark.unpersist_all()


def test_sliced_rows_push_id_filter_to_scan(spark):
    """doc_id < 300 must reach the parquet scan as a pushed filter, not a
    post-scan Filter over full rows."""
    plan = _plan(spark, "minhash_dedup")
    assert "PushedFilters: [" in plan
    assert "LessThan(doc_id,300)" in plan.replace(" ", "")
    import pdfplumber_spark

    pdfplumber_spark.unpersist_all()


def test_lsh_candidate_join_carries_ids_only(spark):
    """The round-4 fix pinned: the cosine-LSH bucket self-join's
    dropDuplicates operates on two long columns — the dim-wide vector
    arrays must rejoin only AFTER dedup (they appear in later joins, not
    in the pre-dedup exchange)."""
    from pdfplumber_spark.operators.similarity import cosine_near_pairs

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    df = cosine_near_pairs(emb, threshold=0.4, method="lsh")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # the aggregate implementing dropDuplicates(doc_a, doc_b) must key on
    # exactly the two id columns and carry no array column through it
    m = re.search(r"HashAggregate\(keys=\[doc_a[^\]]*doc_b[^\]]*\]", plan)
    assert m, "dedup aggregate on (doc_a, doc_b) not found"
    assert "_v#" not in m.group(0) and "va#" not in m.group(0)
    import pdfplumber_spark

    pdfplumber_spark.unpersist_all()


def test_mis_fallback_plan_routes_by_size_without_cartesian(spark):
    """The independent_set keeper's mega-component backstop (round-5):
    the losers plan must contain the grouped-MIS stage
    (FlatMapGroupsInPandas) fed only by sub-cap components, the
    component_min branch for over-cap ones, and no cartesian product."""
    from pdfplumber_spark.operators.dedup import (
        _mis_with_fallback,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    cc = connected_components(pairs)
    losers = _mis_with_fallback(pairs, cc, "doc_id", 2)
    plan = losers._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
