"""Session-scope registry of DataFrames the extension operators persist.

Operators like MinHash banding and embedding LSH persist narrow derived
frames (hashed shingles, postings, band signatures) because several
downstream joins consume them. The frames are returned LAZY — callers
have not executed anything when the operator returns — so the operator
cannot unpersist at its own exit without defeating the persist. Instead
every such persist is registered here, and session owners (bench
harness, pipeline mains, tests, notebook users) call
:func:`release_persisted` once the results are materialized.

Spark's CacheManager de-duplicates by canonicalized plan, so repeated
calls over the SAME input share one entry; the registry exists for the
DISTINCT-inputs case, where entries would otherwise accumulate for the
life of the session (and skew any warm-cache timing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register for later :func:`release_persisted`."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_persisted(blocking: bool = True) -> int:
    """Unpersist every tracked frame; returns the count. Blocking by
    default so the block-removal cost lands HERE (on the workload that
    created the cache) instead of bleeding into whatever runs next —
    async removal measurably pollutes back-to-back timings. Safe to call
    at any time; consumers that re-execute afterwards just recompute."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist(blocking=blocking)
        except Exception:  # session already stopped — nothing to release
            pass
    _TRACKED.clear()
    return n
