"""STREAM-like host memory-bandwidth microbench (round-7 verdict ask
#5): measure the aggregate DRAM bandwidth this host grants N concurrent
workers, at N=8 vs N=32, to make the 8->32 scaling pass/fail window
story falsifiable (BENCH/BASELINE.md pins the numbers).

Each worker runs the classic STREAM triad a[:] = b + s*c over arrays
far larger than L3 (64 MiB per array), counting 3 arrays x 8 bytes
moved per element per iteration (STREAM counting: 2 reads + 1 write).
Workers are separate PROCESSES (like Spark's python workers), started
together after a barrier so the measurement window is fully
concurrent.

Usage: python BENCH/stream_bw.py [workers ...]   (default: 1 8 32)
Prints one JSON line: {"triad_gbs": {"1": .., "8": .., "32": ..}}
"""

import json
import multiprocessing as mp
import sys
import time

N = 8 * 1024 * 1024  # doubles per array -> 64 MiB each, 192 MiB triad set
ITERS = 12


def _worker(barrier, out, idx):
    import numpy as np

    a = np.zeros(N)
    b = np.random.default_rng(idx).random(N)
    c = np.random.default_rng(idx + 1).random(N)
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        # triad; NOTE the un-fused 3.0*c materializes a temporary, so
        # true DRAM traffic is ~5 arrays/elem (read c, write tmp, read b,
        # read tmp, write a) while the GB/s formula below counts the
        # conventional 3 — pinned absolute numbers UNDERSTATE traffic by
        # ~5/3; the 8-vs-32 worker RATIO (what the scaling story uses)
        # is unaffected since the convention is constant across runs.
        np.add(b, 3.0 * c, out=a)
    dt = time.perf_counter() - t0
    out[idx] = (3 * 8 * N * ITERS) / dt / 1e9  # GB/s this worker (3-array convention)


def run(workers: int) -> float:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(workers)
    out = ctx.Array("d", workers)
    procs = [ctx.Process(target=_worker, args=(barrier, out, i))
             for i in range(workers)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return sum(out[:])


if __name__ == "__main__":
    counts = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    res = {}
    for n in counts:
        res[str(n)] = round(run(n), 2)
    print(json.dumps({"triad_gbs": res}))
