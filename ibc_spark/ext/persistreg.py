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

from pyspark.sql import DataFrame, SparkSession
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


def release_checkpoints(spark: SparkSession | None = None, blocking: bool = True) -> int:
    """Unpersist EVERY persistent RDD still registered with the
    SparkContext — this is what frees ``localCheckpoint`` blocks, which
    :func:`release_persisted` cannot see (a checkpointed DataFrame's
    storage belongs to its internal RDD, not to the DataFrame cache).

    SESSION-OWNER ONLY, between workloads (bench/sweep harnesses,
    pipeline mains): a released local checkpoint has no lineage to
    recompute from, so any still-live DataFrame built on one dies on its
    next action. Found the hard way (r12): the suffix-array family
    leaves ~2 slim int64 checkpoint frames per build; back-to-back
    entries in one sweep session accumulated them until the third sf3
    entry OOMed an 8 GB heap mid-``localCheckpoint`` — exactly the
    0-byte-sweep failure mode of r11. Returns the number of RDDs swept."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        return 0
    try:
        # py4j converts the Java map to a dict-like view; snapshot it
        # before unpersisting mutates the underlying registry
        rdds = list(spark.sparkContext._jsc.getPersistentRDDs().values())
    except Exception:  # context already stopped
        return 0
    n = 0
    swept: list[str] = []
    for jrdd in rdds:
        try:
            # capture identity BEFORE unpersist so a mid-pipeline misuse is
            # diagnosable from the log (ADVICE r12: this sweeps EVERY
            # persistent RDD, including third-party caches — the JVM does
            # not expose checkpoint-origin filtering)
            try:
                swept.append(f"rdd_{jrdd.id()}:{jrdd.name() or jrdd.toString()}")
            except Exception:
                swept.append("rdd_?")
            jrdd.unpersist(blocking)
            n += 1
        except Exception:
            pass
    if n:
        import logging

        logging.getLogger(__name__).info(
            "release_checkpoints swept %d persistent RDD(s): %s", n, "; ".join(swept)
        )
    return n
