"""Session-scoped registry of operator-persisted DataFrames.

Several operators materialize an intermediate (LSH signature tables, the
k-means vector cache) so that self-join branches / Lloyd iterations don't
re-run the upstream text-scan kernel per branch. The operator's RESULT
DataFrame is lazy and still depends on that cache, so the operator itself
cannot unpersist — the terminal action happens at the caller. Without an
eviction hook the cached working sets would accumulate in executor storage
for the lifetime of the session across repeated queries (round-3 ADVICE).

This registry makes the retention explicit (strong references — the JVM
cache entry outlives the Python object, so weak refs would leak) and gives
callers one-call eviction AFTER their terminal action:

    result.collect()            # or .write..., .count(), toPandas()
    pdfplumber_spark.unpersist_all()

``bench.py`` evicts between queries; the board hygiene test asserts zero
persisted RDDs remain. At cluster scale the same call belongs after each
pipeline stage's write (SCALE.md §persisted-intermediates).
"""

from __future__ import annotations

from typing import List

_TRACKED: List = []


def persist_tracked(df, level=None):
    """persist() + register for later ``unpersist_all()``."""
    from pyspark import StorageLevel

    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    return track(df)


def track(df):
    """Register an already-persisted DataFrame for ``unpersist_all()``."""
    _TRACKED.append(df)
    return df


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every operator-cached DataFrame; returns how many."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return n
