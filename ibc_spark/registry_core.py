"""Registry core — the QUERIES/ORACLES dicts and the ``query`` decorator.

LEAF module (no imports from the entry modules) so any registry_* module
can be imported DIRECTLY without triggering the whole aggregation chain:
previously every entry module pulled ``query`` from ``ibc_spark.registry``,
whose module body ends by importing all entry modules — so a direct
``import ibc_spark.registry_lakehouse`` re-entered the half-initialized
module graph and crashed on decoration-time cross-references (the SemDeDup
and funnel oracles compose fragments registered by other modules).
``ibc_spark.registry`` re-exports everything here, so existing imports are
unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dec(c: Column | str, precision: int = 10, scale: int = 2) -> Column:
    """Pin a float column to an exact decimal for order-insensitive sums."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal({precision},{scale})")
