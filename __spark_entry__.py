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
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from ibc_spark.registry import ORACLES, QUERIES  # noqa: E402


def _driver_checked() -> set[str]:
    """Query names that already have a green row in any prior CORRECTNESS_r*.json.

    The driver snapshots only the first 50 entries of ``queries()`` per round,
    so we rotate: entries without a prior green driver row sort first, giving
    every registered query a driver-verified row within a round or two.
    """
    seen: set[str] = set()
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and (row.get("hash_match") or row.get("rows_match")):
                seen.add(name)
    return seen


# Entries whose SEMANTICS changed after their last green driver row — they
# must jump the rotation queue and be re-verified this round. Clear once the
# next CORRECTNESS snapshot carries them.
_FORCE_RECHECK: set[str] = {
    # round 5: candidate path switched from blocked all-pairs to banded LSH
    "corpus_dedup_materialize",
    "split_leakage_safe",
    # round 5: shortfall fallback added to the quota pre-filter
    "quota_per_source",
}


def _ordered(mapping: dict) -> dict:
    checked = _driver_checked() - _FORCE_RECHECK
    pos = {k: i for i, k in enumerate(mapping)}
    keys = sorted(mapping, key=lambda k: (k in checked, pos[k]))
    return {k: mapping[k] for k in keys}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered never-driver-checked first (see ``_driver_checked``).
    """
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _ordered(ORACLES)
