"""E3 — end-of-semester pipeline (reference ``end-semester-pipeline.py:23-82``):
whole-table bulk mutation, rowcount reported. Two narrow projections + a
count — no shuffle; at 100 TB this is a pure map job + overwrite."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ibc_spark.ops.mutate import bulk_mutate


@dataclass(frozen=True)
class EndSemesterResult:
    consultants: DataFrame
    metrics: DataFrame  # one row: rows_updated


def run(consultants: DataFrame) -> EndSemesterResult:
    updated = bulk_mutate(
        consultants,
        updates={"status": "Deferred"},
        increments={"semesters_in_ibc": 1},
    )
    metrics = updated.agg(F.count(F.lit(1)).alias("rows_updated"))
    return EndSemesterResult(consultants=updated, metrics=metrics)
