"""Conditional / dependent mutations U1, U2, U4 (SURVEY §2.6).

The reference applies these as per-row UPDATE statements inside a sequential
loop; the engine derives each mutation as a set operation. The one place
sequential semantics leak in is U1's last-write-wins-in-row-order conflict
rule — made explicit here with an ingest row index + window rank.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_write_wins(df: DataFrame, *, key: str | list[str], order_col: str) -> DataFrame:
    """Collapse conflicting assignments to the LAST one in ingest order —
    the implicit semantics of the reference's sequential UPDATE loop
    (``projects-pipeline.py:241-245`` firing ``update_user_role_if_needed``
    row by row). The only window function on the parity surface."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def reconcile_column(
    dim: DataFrame,
    assignments: DataFrame,
    *,
    key: str,
    target_col: str,
    new_col: str,
) -> DataFrame:
    """U1 — role reconciliation: set ``target_col`` to the assigned value
    where it differs; untouched rows pass through
    (``update_user_role_if_needed`` ``projects-pipeline.py:150-164``).
    ``assignments`` must already be conflict-resolved (one row per key)."""
    a = F.broadcast(assignments.select(F.col(key), F.col(new_col).alias("__new")))
    return (
        dim.join(a, on=key, how="left")
        .withColumn(
            target_col,
            F.when(
                F.col("__new").isNotNull() & ~F.col("__new").eqNullSafe(F.col(target_col)),
                F.col("__new"),
            ).otherwise(F.col(target_col)),
        )
        .drop("__new")
    )


def mark_where_in(
    dim: DataFrame,
    keys_df: DataFrame,
    *,
    key: str,
    updates: Mapping[str, object],
) -> DataFrame:
    """U2 — set literal column values for rows whose key appears in
    ``keys_df`` (``mark_consultant_returning`` ``projects-pipeline.py:167-183``:
    status='returning' for SM/PM/SC1/SC2 of newly inserted projects only).
    Semi-join-shaped: implemented as a broadcast left join on the distinct
    key set + conditional assignment, so the dim is scanned once."""
    k = F.broadcast(
        keys_df.select(F.col(key)).where(F.col(key).isNotNull()).dropDuplicates()
        .withColumn("__hit", F.lit(True))
    )
    out = dim.join(k, on=key, how="left")
    for col, val in updates.items():
        out = out.withColumn(
            col, F.when(F.col("__hit"), F.lit(val)).otherwise(F.col(col))
        )
    return out.drop("__hit")


def bulk_mutate(df: DataFrame, updates: Mapping[str, object], increments: Mapping[str, int]) -> DataFrame:
    """U4/K6 — whole-table mutation: literal sets + arithmetic increments
    (``end-semester-pipeline.py:50-58``: status='Deferred',
    semesters_in_ibc += 1). Narrow projection — no shuffle; at 100 TB this
    is a pure map stage + overwrite."""
    out = df
    for col, val in updates.items():
        out = out.withColumn(col, F.lit(val))
    for col, delta in increments.items():
        out = out.withColumn(col, F.col(col) + F.lit(delta))
    return out


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    compare: list[str],
    effective_date,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD Type-2: apply ``updates`` to a versioned dimension, KEEPING
    history. The reference's upserts are Type-1 (overwrite, K3–K5); Type-2
    is the warehouse-grade variant the engine adds:

    - current rows whose compared attributes changed (null-safe ``<=>``)
      are CLOSED: ``valid_to = effective_date``, ``is_current = false``;
    - a new open version is inserted per changed or brand-new key;
    - unchanged current rows and already-closed history pass through.

    One shuffle on ``key``; history rows never rejoin anything. On a
    lakehouse this whole dataset op is the MERGE source for ``MERGE INTO``.
    ``current`` must carry ``from_col``/``to_col``/``current_col``;
    ``updates`` carries ``key`` + ``compare``.
    """
    eff = F.lit(effective_date).cast(current.schema[from_col].dataType)
    hist = current.where(~F.col(current_col))
    open_rows = current.where(F.col(current_col))

    u = updates.select(
        F.col(key),
        F.lit(True).alias("__in_updates"),
        *[F.col(c).alias(f"__u_{c}") for c in compare],
    )
    joined = open_rows.join(u, on=key, how="full_outer")
    cond = None  # any compared attribute differs (null-safe)
    for c in compare:
        term = ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        cond = term if cond is None else (cond | term)
    in_updates = F.col("__in_updates").isNotNull()
    is_new_key = F.col(from_col).isNull()  # no current row for this key
    is_changed = in_updates & ~is_new_key & cond

    kept_open = joined.where(~is_new_key & (~in_updates | ~is_changed)).select(
        key, *compare, from_col, to_col, current_col
    )
    closed = joined.where(is_changed).select(
        key,
        *compare,
        F.col(from_col),
        eff.alias(to_col),
        F.lit(False).alias(current_col),
    )
    new_versions = joined.where(is_changed | is_new_key).select(
        key,
        *[F.col(f"__u_{c}").alias(c) for c in compare],
        eff.alias(from_col),
        F.lit(None).cast(current.schema[to_col].dataType).alias(to_col),
        F.lit(True).alias(current_col),
    )
    return hist.select(key, *compare, from_col, to_col, current_col).unionAll(
        kept_open
    ).unionAll(closed).unionAll(new_versions)
