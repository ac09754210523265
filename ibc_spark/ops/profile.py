"""Table profiling: one-pass per-column statistics.

The first step of any 100 TB ingest is a cheap profile (null rates,
cardinalities, ranges) to choose partition keys, spot skew, and catch
schema drift. This computes ALL columns' stats in a single aggregation pass
(one job, no per-column scans), then unpivots to a tidy (column, stat)
frame.

``n_distinct`` is exact here (oracle-checkable); switch ``approx=True`` for
HyperLogLog at scale — same output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(
    df: DataFrame, columns: list[str], *, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per numeric
    column — all computed in ONE aggregate over the input."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        distinct = (
            F.approx_count_distinct(c).alias(f"__d_{c}")
            if approx
            else F.countDistinct(c).alias(f"__d_{c}")
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            distinct,
            F.min(c).cast("double").alias(f"__mn_{c}"),
            F.max(c).cast("double").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nn_{c}").alias("n_nulls"),
                        F.col(f"__d_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_val"),
                        F.col(f"__mx_{c}").alias("max_val"),
                    )
                    for c in columns
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")
