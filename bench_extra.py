#!/usr/bin/env python3
"""Round-8 auxiliary benchmarks (guide §1.4) — NOT the driver's harness.

``bench.py`` stays frozen for measurement; this file holds the extra
methodology used during the optimization round:

- ``--isolate``: per-query noop-sink timing with WARM repeats in one
  session (bench.py times each query once, cold — warm repeats separate
  per-query compute from first-run planning/codegen, which on this guest
  is ~1-2 s per query).
- ``--stress``: the 10x scale-holding probe for the operators
  restructured in round 8 (per-bucket cosine LSH, winnow inverted-index
  overlap, duplicate-invariant cluster windows) over synthetic inputs
  ~10x the sf0.1 tables — guards against super-linear blowups hiding
  below the bench SF.

Usage:
  python3 bench_extra.py --isolate [query ...]   # default: the heavy rows
  python3 bench_extra.py --stress
Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEAVY = [
    "cosine_near_pairs_lsh", "jaccard_pairs", "winnow_overlap",
    "cluster_1d", "ivf_topk", "minhash_dedup_cc", "render_png",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _spark():
    from pdfplumber_spark.session import get_spark

    return get_spark(app_name="bench-extra", cores=CPUS,
                     shuffle_partitions=max(CPUS, 8))


def isolate(names: list[str], reps: int = 3) -> None:
    import __spark_entry__ as E
    import pdfplumber_spark

    spark = _spark()
    E._corpus_path(SF_DIR)
    qs = E.queries()
    out: dict = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"isolate: {name}")
        samples = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            samples.append(round(time.time() - t0, 3))
            pdfplumber_spark.unpersist_all()
        out[name] = {"samples": samples, "warm_min": min(samples[1:] or samples)}
        log(f"{name}: {samples}")
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"mode": "isolate", "sf_dir": SF_DIR, "cores": CPUS,
                      "queries": out}))


def stress() -> None:
    import numpy as np
    import pandas as pd
    import pdfplumber_spark
    from pyspark.sql import functions as F

    base = "/tmp/spark_graft_stress10x"
    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(99)
    emb_p = f"{base}/embeddings.parquet"
    if not os.path.exists(emb_p):
        core = rng.standard_normal((2000, 64))
        emb = np.repeat(core, 10, axis=0) + 0.35 * rng.standard_normal(
            (20000, 64))
        pd.DataFrame({
            "vec_id": np.arange(20000, dtype=np.int64),
            "embedding": [r.astype(np.float32).tolist() for r in emb],
        }).to_parquet(emb_p)
    docs_p = f"{base}/documents.parquet"
    if not os.path.exists(docs_p):
        words = np.array([f"w{i}" for i in range(5000)])
        texts = [" ".join(rng.choice(words, size=int(rng.integers(30, 90))))
                 for _ in range(5000)]
        docs = [texts[i % 5000] if i % 7 else texts[0] for i in range(50000)]
        pd.DataFrame({"doc_id": np.arange(50000, dtype=np.int64),
                      "text": docs}).to_parquet(docs_p)
    ev_p = f"{base}/events.parquet"
    if not os.path.exists(ev_p):
        n = 1_000_000
        pd.DataFrame({
            "event_type": rng.choice(list("abcde"), size=n),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.uniform(0, 5000, n),
        }).to_parquet(ev_p)

    from pdfplumber_spark.operators.clustering import with_cluster_id
    from pdfplumber_spark.operators.similarity import cosine_near_pairs
    from pdfplumber_spark.operators.text_analysis import (
        winnow_overlap,
        winnow_table,
    )

    spark = _spark()
    emb = spark.read.parquet(emb_p)
    docs = spark.read.parquet(docs_p)
    ev = spark.read.parquet(ev_p)
    out = {}

    def t(label, df):
        spark.sparkContext.setJobDescription(f"stress: {label}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out[label] = round(time.time() - t0, 2)
        pdfplumber_spark.unpersist_all()
        log(f"{label}: {out[label]}s")

    t("cosine_lsh_prod_20k",
      cosine_near_pairs(emb, threshold=0.90, method="lsh",
                        n_planes=8, n_tables=16))
    t("winnow_overlap_50k",
      winnow_overlap(winnow_table(docs, "doc_id", "text"), threshold=0.2,
                     assume_distinct=True))
    t("cluster1d_1m",
      with_cluster_id(
          ev.select("event_type", F.round("value", 2).alias("v")),
          "v", 1.0, ["event_type"],
      ).groupBy("event_type", "cluster_id").count())
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"mode": "stress10x", "cores": CPUS, "walls_sec": out}))


if __name__ == "__main__":
    if "--stress" in sys.argv:
        stress()
    else:
        names = [a for a in sys.argv[1:] if not a.startswith("--")] or HEAVY
        isolate(names)
