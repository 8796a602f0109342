"""Tracked DataFrame caching — unpersist discipline for
build-then-probe plans.

Many catalog queries materialize an intermediate frame once and probe
it from both sides of a self-join (gram inverted indexes, MinHash
signatures, SimHash bit tables, clustered embeddings, winnowing
fingerprint indexes).  The cache MUST outlive the query's action —
evaluation is lazy, so the builder cannot unpersist before the caller
collects — which historically meant every cache leaked into the
session's CacheManager for its lifetime: invisible at bench scale,
executor-storage creep in a resident 100 TB pipeline.

Discipline: every build-then-probe cache goes through
:func:`tracked_cache`; the catalog's ``queries()`` surface wraps each
query so that BUILDING one releases the caches of its predecessors.  A
sequential catalog run (the driver, bench.py) therefore holds at most
one query's caches at any time, and direct callers can release
explicitly (``release_tracked_caches()``) when a result has been fully
consumed.  The registry holds strong references — a cache entry lives
in the JVM CacheManager regardless of Python GC, so the handle must
stay reachable to be unpersistable.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for deferred release."""
    df.cache()
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_tracked_caches() -> int:
    """Unpersist every tracked cache; returns how many were released.

    Safe to call at any query boundary: blocking=False, and a frame
    re-cached later simply re-materializes on first use.
    """
    with _LOCK:
        frames, _TRACKED[:] = list(_TRACKED), []
    released = 0
    for df in frames:
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return released
