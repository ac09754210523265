"""Key-resolution joins J1–J6 (SURVEY.md §2.5).

Every lookup in the reference is a per-row indexed SQL probe — an N+1
nested-loop join over the network (e.g. ``get_user_id_by_email``
``staffing-roster-pipeline.py:153-158``, netid probes
``projects-pipeline.py:104-128``). The engine replaces each probe family
with ONE set-based join:

- dim side broadcast when small (`F.broadcast`) — zero shuffle;
- fact side never broadcast; at scale Catalyst/AQE picks shuffled hash or
  sort-merge on the key, with skew splitting.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resolve_fk(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    payload: Mapping[str, str],
    broadcast: bool = True,
) -> DataFrame:
    """J1/J2 — left-join key resolution: attach ``payload`` (dim_col →
    out_col) to facts; unmatched facts keep NULL payload (drives the
    insert-vs-update branch like ``get_user_id_by_email`` returning None).
    """
    d = dim.select(F.col(dim_key).alias("__dim_key"), *[F.col(s).alias(t) for s, t in payload.items()])
    if broadcast:
        d = F.broadcast(d)
    return facts.join(d, on=facts[fact_key] == d["__dim_key"], how="left").drop("__dim_key")


def dangling_keys(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    broadcast: bool = True,
) -> DataFrame:
    """J3 — facts whose non-NULL key has no dim match (anti-join). The
    reference raises ``InvalidFormatError`` per dangling netid
    (``projects-pipeline.py:124-125``); the engine quarantines them instead
    of failing the job."""
    d = dim.select(F.col(dim_key).alias("__dim_key")).dropDuplicates()
    if broadcast:
        d = F.broadcast(d)
    return (
        facts.where(F.col(fact_key).isNotNull())
        .join(d, on=facts[fact_key] == d["__dim_key"], how="left_anti")
    )


def exists_in(
    probe: DataFrame,
    dim: DataFrame,
    *,
    probe_key: str,
    dim_key: str,
    negate: bool = False,
    broadcast: bool = True,
) -> DataFrame:
    """J4/F4 — existence predicate as semi/anti join (replaces
    ``SELECT 1 FROM ... WHERE key=%s`` probes,
    ``staffing-roster-pipeline.py:183-184``, ``projects-pipeline.py:207-211``)."""
    d = dim.select(F.col(dim_key).alias(probe_key)).dropDuplicates()
    if broadcast:
        d = F.broadcast(d)
    return probe.join(d, on=probe_key, how="left_anti" if negate else "left_semi")


def resolve_roles(
    facts: DataFrame,
    dim: DataFrame,
    *,
    role_keys: Mapping[str, str],
    dim_key: str,
    dim_id: str,
    broadcast: bool = True,
) -> DataFrame:
    """J5 — multi-role resolution: for each ``fact_col → out_col`` in
    ``role_keys``, resolve ``fact_col`` against the same dim and attach the
    dim id as ``out_col``.

    The reference does this as 5 separate per-row probes
    (``projects-pipeline.py:241-245,282-286``) and, for change detection, a
    5-way aliased LEFT JOIN (``projects-pipeline.py:226-238``). Idiomatic
    Spark: N aliased broadcast joins of ONE dim — with a broadcast dim this
    is N map-side hash probes, no shuffle of the fact side at all.
    """
    d = dim.select(F.col(dim_key).alias("__rk"), F.col(dim_id).alias("__rv")).dropDuplicates(["__rk"])
    if broadcast:
        d = F.broadcast(d)
    out = facts
    for fact_col, out_col in role_keys.items():
        alias = d.select(F.col("__rk").alias(f"__rk_{out_col}"), F.col("__rv").alias(out_col))
        out = out.join(alias, on=out[fact_col] == alias[f"__rk_{out_col}"], how="left").drop(
            f"__rk_{out_col}"
        )
    return out


def changed_rows(
    new: DataFrame,
    old: DataFrame,
    *,
    key: str | list[str],
    compare: list[str],
) -> DataFrame:
    """J6 — SCD change detection: new rows whose key exists in ``old`` but
    where any compared column differs (null-safe). Mirrors the reference's
    skip-UPDATE-when-unchanged tuple comparison
    (``projects-pipeline.py:247-260``) as a set operation.
    """
    keys = [key] if isinstance(key, str) else list(key)
    o = old.select(keys + [F.col(c).alias(f"__old_{c}") for c in compare])
    cond = None
    for c in compare:
        diff = ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))
        cond = diff if cond is None else (cond | diff)
    return (
        new.join(o, on=keys, how="inner")
        .where(cond)
        .drop(*[f"__old_{c}" for c in compare])
    )
