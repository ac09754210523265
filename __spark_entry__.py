"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke). ``queries()``
exposes every implemented operator from SURVEY.md §2 (+ §7.7 extensions);
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each
SQL-expressible entry. The driver hash-compares the two at sf0.01.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from ibc_spark.registry import ORACLES, QUERIES  # noqa: E402


def _last_green_round() -> dict[str, int]:
    """Map query name → the LATEST round whose CORRECTNESS_r*.json carries a
    green row for it.

    The driver snapshots only the first 50 entries of ``queries()`` per
    round, so we rotate. Round 5's rotation (never-checked first, then
    REGISTRY position) re-attested the same early block every round while
    the tail went stale (58 entries' last row was r3-); sorting checked
    entries by last-green round ASCENDING instead drains the stale pool
    oldest-first, so every entry's attestation is refreshed on a bounded
    cadence.
    """
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and (row.get("hash_match") or row.get("rows_match")):
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


# Entries whose SEMANTICS (or candidate/pruning path — the round-5 lesson)
# changed after their last green driver row — they jump the rotation queue.
# Clear once the next CORRECTNESS snapshot carries them. Round-5 set
# (corpus_dedup_materialize, split_leakage_safe, quota_per_source) cleared:
# all three green in CORRECTNESS_r05.json.
_FORCE_RECHECK: set[str] = {
    # candidate path rewritten to adaptive PPJoin in round 5; last driver row r1
    "dedup_ngram_jaccard",
    # round 6: candidate stage switched from blocked all-pairs to banded LSH
    "dedup_cluster_components",
    # round 6: self-pair masking switched from positional to id-equality
    "knn_graph_topk",
    # round 6: zero-survivor groups added to the shortfall fallback
    "quota_per_source",
    # exact siblings of the rows-only approximate family — re-attest them in
    # the same snapshot as their waivered twins (VERDICT r5 #7)
    "dedup_minhash_verified",
    "ann_topk_bruteforce",
}


# Entries ADDED in the current round, deferred to the NEXT round's snapshot
# so the 50-entry driver window can spend its slots on the stale
# re-attestation backlog. They are fully hash-checked by the STRICTER local
# parity suite every pytest run (tests/test_oracle_parity.py).
#
# Currently EMPTY on purpose: no CORRECTNESS snapshot has landed since the
# round-6 additions, so every round-6 entry is still unattested and flows
# through the never-green bucket below — with 168 registry entries that
# bucket (47) plus _FORCE_RECHECK (6) overfills the 50 snapshot slots by
# 3, so the three newest never-green entries roll to the next snapshot
# (they are parity-proven locally every pytest run). External attestation
# of never-checked entries beats re-attesting greens the local parity
# suite already re-hashes.
_DEFER_TO_NEXT_ROUND: set[str] = set()


def _ordered(mapping: dict) -> dict:
    green = _last_green_round()
    pos = {k: i for i, k in enumerate(mapping)}

    def sort_key(k: str):
        if k in _FORCE_RECHECK:
            bucket = 0  # semantics changed / sibling pairing — attest first
        elif k in _DEFER_TO_NEXT_ROUND:
            bucket = 3  # new this round, parity-proven locally — next round
        elif k not in green:
            bucket = 1  # rows-only family (never acquires a green row) + new
        else:
            bucket = 2  # previously green: drain oldest-first
        return (bucket, green.get(k, 0), pos[k])

    keys = sorted(mapping, key=sort_key)
    return {k: mapping[k] for k in keys}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered for the driver's 50-entry snapshot window (see ``_ordered``:
    force-recheck, then never-green, then oldest-green-first, with this
    round's additions deferred to the next snapshot).
    """
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _ordered(ORACLES)
