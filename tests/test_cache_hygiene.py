"""Persisted-intermediate hygiene (round-3 ADVICE): operator caches must be
evictable after the terminal action — no persisted-RDD leak across queries.

Covers every persist site: minhash signature table, simhash hash table,
jaccard token table, cosine-LSH keyed table, and ivf_train's vector cache
(which unpersists itself in-function because training's terminal actions
are internal)."""

import pytest

import __spark_entry__ as E
import pdfplumber_spark
from conftest import SF_CORRECT


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


CACHING_QUERIES = [
    "minhash_pairs",
    "simhash_pairs",
    "jaccard_pairs",
    "cosine_near_pairs",
    "lsh_topk",
    "quality",  # carries the repetition join since the round-6 board merge
    "quality_filter",
    "winnow_overlap",
    # round 7: connected_components releases superseded per-round
    # localCheckpoint blocks explicitly and registers the FINAL
    # checkpoint with the eviction registry, so the CC query is now
    # covered by the same unpersist_all contract as everything else
    # (the GC-reclamation design leaked across long sessions — soak
    # finding: 5 checkpoint RDDs survived blocking unpersist + 10 s of
    # forced GC)
    "minhash_dedup_cc",
]


def _start_clean(spark):
    """Evict registry caches AND any lingering localCheckpoint blocks from
    earlier tests (ContextCleaner reclaims those on GC, asynchronously —
    without this the module is order-dependent vs test_cc_dedup)."""
    import gc
    import time

    pdfplumber_spark.unpersist_all(blocking=True)
    spark.catalog.clearCache()
    for _ in range(60):
        if _n_persistent(spark) == 0:
            return
        gc.collect()  # drop Py4J handles so the JVM refs become weak
        spark.sparkContext._jvm.System.gc()  # let ContextCleaner see them
        time.sleep(0.25)
    assert _n_persistent(spark) == 0


@pytest.mark.parametrize("name", CACHING_QUERIES)
def test_no_persisted_rdds_after_unpersist_all(spark, name):
    _start_clean(spark)

    df = E.queries()[name](spark, SF_CORRECT)
    df.count()  # terminal action
    pdfplumber_spark.unpersist_all(blocking=True)
    assert _n_persistent(spark) == 0, name


def test_ivf_train_unpersists_its_vector_cache(spark):
    from pyspark.sql import functions as F

    from pdfplumber_spark.operators.similarity import ivf_train

    _start_clean(spark)
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    cents = ivf_train(emb, n_clusters=4, iters=2)
    assert cents.shape == (4, 64)
    # training evicts in-function (try/finally), no registry entry needed
    assert _n_persistent(spark) == 0


def test_unpersist_all_reports_count(spark):
    from pdfplumber_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    _start_clean(spark)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").where(
        "doc_id < 50"
    )
    pairs = minhash_lsh_candidates(minhash_signatures(docs, "doc_id", "text"))
    pairs.count()
    assert pdfplumber_spark.unpersist_all(blocking=True) == 1
    assert _n_persistent(spark) == 0
