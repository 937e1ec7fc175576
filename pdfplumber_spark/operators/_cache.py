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

Long-lived sessions that never call ``unpersist_all()`` are bounded two
ways (round-4 ADVICE): registration is thread-safe (operators may run from
concurrent driver threads), and the registry is capped — when it exceeds
``_MAX_TRACKED`` entries the oldest are evicted (unpersisted) on insert,
so neither the Python list nor executor storage can grow without bound.
"""

from __future__ import annotations

import threading
from typing import List

_TRACKED: List = []
_LOCK = threading.Lock()
# Oldest entries are force-evicted past this point. Generous: a single
# query tracks 1-3 intermediates, so 64 covers dozens of in-flight queries.
_MAX_TRACKED = 64


def persist_tracked(df, level=None):
    """persist() + register for later ``unpersist_all()``."""
    from pyspark import StorageLevel

    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    return track(df)


def track(df):
    """Register an already-persisted DataFrame for ``unpersist_all()``."""
    overflow = []
    with _LOCK:
        _TRACKED.append(df)
        while len(_TRACKED) > _MAX_TRACKED:
            overflow.append(_TRACKED.pop(0))
    for old in overflow:
        try:
            old.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return df


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every operator-cached DataFrame; returns how many."""
    with _LOCK:
        drained, _TRACKED[:] = _TRACKED[:], []
    n = 0
    for df in drained:
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return n
