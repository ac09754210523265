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
