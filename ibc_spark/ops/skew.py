"""Skew-mitigation operators: salted aggregation and salted broadcast-free
joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on in
ibc_spark.session) handles most runtime skew; these operators are the
explicit tools for the cases AQE can't fix:

- a single hot GROUP BY key whose partial states all land on one reducer →
  :func:`salted_agg` splits every key across ``n_salts`` reducers and
  re-combines (two shuffles, both balanced — strictly better than one
  shuffle with a straggler when skew is heavy).
- a fact⋈dim join where the dim is too big to broadcast and a few fact keys
  dominate → :func:`salted_join` replicates each dim row ``n_salts``× and
  routes fact rows to deterministic salt buckets, bounding any task's share
  of a hot key to 1/n_salts.

Results are bit-identical to the unsalted plans (oracle-checked in the
registry); only the physical distribution changes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Decomposable aggregates: (partial expr builder, final expr builder).
_REAGG: dict[str, tuple[Callable[[Column], Column], Callable[[Column], Column]]] = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    *,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: partial per (keys, salt), final per keys.

    ``aggs`` maps output column → (agg kind, input expression); kinds must
    be decomposable (sum/count/min/max — the re-aggregation is kind-aware:
    partial counts re-combine with SUM). ``salt_on`` defaults to a
    deterministic spread of the full row via ``spark_partition_id`` +
    monotonic id; pass a column (e.g. a line number) for reproducible tests.
    """
    for kind, _ in aggs.values():
        if kind not in _REAGG:
            raise ValueError(f"non-decomposable agg kind: {kind}")
    salt = (
        F.pmod(salt_on, F.lit(n_salts))
        if salt_on is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _REAGG[kind][0](expr).alias(f"__pt_{out}")
                for out, (kind, expr) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _REAGG[kind][1](F.col(f"__pt_{out}")).alias(out)
            for out, (kind, _) in aggs.items()
        ]
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    on: str,
    n_salts: int = 8,
    fact_salt_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key load split ``n_salts`` ways: each fact row
    gets a deterministic salt; every dim row is replicated once per salt;
    the join key becomes (on, salt). Dim-side cost is n_salts× rows — use
    only when the dim is modest but above the broadcast threshold and the
    fact keys are skewed.

    Only ``inner``/``left`` (and their aliases) are allowed: with a right or
    full join, every unmatched dim row would survive once per salt replica,
    silently inflating the result n_salts×."""
    normalized = how.lower().replace("_", "").replace("outer", "")
    if normalized not in ("inner", "left", "leftsemi", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"(inner/left/semi/anti), got {how!r}: right/full would "
            "duplicate unmatched dim rows per salt"
        )
    salt = (
        F.pmod(fact_salt_on, F.lit(n_salts))
        if fact_salt_on is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    f = facts.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, on=[on, "__salt"], how=how).drop("__salt")
