#!/usr/bin/env python3
"""Protocol-grade two-cluster-size measurement (BASELINE.md north rule:
throughput scaling efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so the rule is evidenced by the
same job at two parallelism levels on the same input (local[N] vs
local[4N]) with walls long enough (>= ~25 s) to amortize session and
scheduling overhead. Prints one JSON line; paste results into
BENCH/BASELINE.md.

Usage: python3 BENCH/scaling_protocol.py [n_docs_total]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TOTAL = (int(sys.argv[1]) if len(sys.argv) > 1
           and not sys.argv[1].startswith("--") else 64_000)
BASE_DOCS = 600


def log(m):
    print(m, file=sys.stderr, flush=True)


def big_corpus() -> str:
    from pdfplumber_spark.sources.corpus import (
        CORPUS_VERSION,
        write_corpus_parquet,
    )

    path = f"/tmp/spark_graft_scale_v{CORPUS_VERSION}_{N_TOTAL}.parquet"
    if os.path.exists(path):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_path = f"/tmp/spark_graft_scale_base_v{CORPUS_VERSION}.parquet"
    if not os.path.exists(base_path):
        t0 = time.time()
        write_corpus_parquet(base_path, n_docs=BASE_DOCS, seed=42, mega_pages=30)
        log(f"base corpus in {time.time()-t0:.1f}s")
    base = pq.read_table(base_path)
    reps = max(1, N_TOTAL // base.num_rows)
    urls = base.column("url").to_pylist()
    tables = []
    for r in range(reps):
        t = base.set_column(
            0, "url", pa.array([f"{u}#rep{r}" for u in urls])
        )
        tables.append(t)
    big = pa.concat_tables(tables)
    pq.write_table(big, path)
    log(f"replicated corpus: {big.num_rows} docs at {path}")
    return path


def run_once(spark, path: str) -> float:
    from pdfplumber_spark.plans.extract import extract_text, read_pages

    pages = read_pages(spark, path)
    t0 = time.time()
    extract_text(pages, num_partitions=256).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.time() - t0


def main_quick(small: int, big: int):
    """ONE warm+measured leg per level, big first — built to fit inside
    a short host fast-window (round-5 finding: fast windows can be
    briefer than one full interleaved cycle). Total wall ~2 min at 64k
    docs. Report is a single-cycle efficiency, clearly labeled quick."""
    from pdfplumber_spark.session import get_spark

    path = big_corpus()
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(path).num_rows
    dps = {}
    for cores in (big, small):  # big leg FIRST, while the window holds
        spark = get_spark(app_name=f"scale-q{cores}", cores=cores,
                          shuffle_partitions=max(cores * 2, 8))
        run_once(spark, path)  # warm
        wall = run_once(spark, path)
        spark.stop()
        dps[cores] = n_docs / wall
        log(f"quick local[{cores}]: {wall:.1f}s {dps[cores]:.0f} docs/s")
    eff = dps[big] / ((big / small) * dps[small])
    print(json.dumps({
        "n_docs": n_docs, "mode": f"quick {small}->{big} (big leg first)",
        "small_dps": round(dps[small]), "big_dps": round(dps[big]),
        "efficiency": round(eff, 3), "criterion": ">=0.8",
        "note": "single-cycle window-chasing mode; the interleaved "
                "protocol remains the standard evidence",
    }))


def main_interleaved(small: int, big: int, cycles: int = 3):
    """Drift-robust N->4N measurement: alternate local[small] and
    local[big] sessions A/B/A/B so each efficiency ratio compares runs
    minutes (not tens of minutes) apart. The host's DRAM ceiling drifts on
    the tens-of-minutes scale (documented in BENCH/BASELINE.md); sequential
    per-level sweeps alias that drift into the ratio in either direction —
    round-3 measured 0.45x and 2.25x for the SAME code this way. Reports
    per-cycle efficiency and the median."""
    from pdfplumber_spark.session import get_spark

    path = big_corpus()
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(path).num_rows
    pairs = []
    warm_done = set()
    for c in range(cycles):
        cycle = {}
        for cores in (small, big):
            spark = get_spark(app_name=f"scale-i{cores}-{c}", cores=cores,
                              shuffle_partitions=max(cores * 2, 8))
            if cores not in warm_done:
                run_once(spark, path)
                warm_done.add(cores)
            wall = run_once(spark, path)
            spark.stop()
            cycle[cores] = n_docs / wall
            log(f"cycle {c} local[{cores}]: {wall:.1f}s {cycle[cores]:.0f} docs/s")
        eff = cycle[big] / ((big / small) * cycle[small])
        pairs.append({
            "small_dps": round(cycle[small], 0),
            "big_dps": round(cycle[big], 0),
            "efficiency": round(eff, 3),
        })
        log(f"cycle {c} efficiency {small}->{big}: {eff:.3f}")
    effs = sorted(p["efficiency"] for p in pairs)
    out = {
        "n_docs": n_docs,
        "mode": f"interleaved {small}->{big}",
        "cycles": pairs,
        "median_efficiency": effs[len(effs) // 2],
        "criterion": ">=0.8",
    }
    print(json.dumps(out))


def main():
    from pdfplumber_spark.session import get_spark

    path = big_corpus()
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(path).num_rows
    results = {}
    for cores in (4, 8, 16, 32):
        spark = get_spark(app_name=f"scale-{cores}", cores=cores,
                          shuffle_partitions=max(cores * 2, 8))
        run_once(spark, path)  # warmup (JVM/codegen/Arrow)
        walls = [run_once(spark, path) for _ in range(2)]
        spark.stop()
        wall = min(walls)
        results[cores] = {
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(n_docs / wall, 0),
        }
        log(f"local[{cores}]: {wall:.1f}s  {n_docs/wall:.0f} docs/s")

    def eff(a, b):
        return round(
            results[b]["docs_per_sec"]
            / ((b / a) * results[a]["docs_per_sec"]),
            3,
        )

    out = {
        "n_docs": n_docs,
        "results": results,
        "efficiency_4_to_16": eff(4, 16),
        "efficiency_8_to_32": eff(8, 32),
        "criterion": ">=0.8",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    # usage: scaling_protocol.py [n_docs] [--interleave [small big [cycles]]]
    if "--quick" in sys.argv:
        i = sys.argv.index("--quick")
        rest = [int(x) for x in sys.argv[i + 1:]]
        small, big = (rest[0], rest[1]) if len(rest) >= 2 else (8, 32)
        main_quick(small, big)
    elif "--interleave" in sys.argv:
        i = sys.argv.index("--interleave")
        rest = [int(x) for x in sys.argv[i + 1:]]
        small, big = (rest[0], rest[1]) if len(rest) >= 2 else (8, 32)
        cycles = rest[2] if len(rest) >= 3 else 3
        main_interleaved(small, big, cycles)
    else:
        main()
