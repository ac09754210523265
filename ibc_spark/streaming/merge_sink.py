"""``foreachBatch`` MERGE sink — the streaming face of pipeline E1.

The batch pipelines end in :func:`ibc_spark.io_.sinks.merge_upsert`; streaming
reuses the exact same dataset op inside ``foreachBatch``: each micro-batch is
deduped (last-write-wins within the batch) and merged into the keyed target.
``foreachBatch`` gives at-least-once batch delivery; the MERGE is idempotent
by key, so the end-to-end result is effectively exactly-once — the engine-wide
replacement for the reference's per-row transactional upserts
(``staffing-roster-pipeline.py:269-298``).

The target here is a parquet directory (rewritten per batch — fine for dim-
sized targets). On a lakehouse the body becomes ``MERGE INTO`` (Delta/
Iceberg) which rewrites only matched files; the dataset semantics are
identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ibc_spark.io_.sinks import merge_upsert
from ibc_spark.ops.mutate import last_write_wins


def foreach_batch_merge(
    spark: SparkSession,
    target_path: str,
    *,
    key: str,
    order_col: str,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` body: read current target state, MERGE the
    (deduped) micro-batch, rewrite. Batch 0 bootstraps the target."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        batch = last_write_wins(batch_df, key=key, order_col=order_col)
        try:
            old = spark.read.parquet(target_path)
        except Exception:  # first batch: no target yet
            batch.write.mode("overwrite").parquet(target_path)
            return
        merged = merge_upsert(old, batch.select(*old.columns), key=key)
        # localCheckpoint breaks lineage back to the files being overwritten.
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)

    return body


def run_merge_stream(
    spark: SparkSession,
    events: DataFrame,
    target_path: str,
    checkpoint_path: str,
    *,
    key: str = "event_id",
    order_col: str = "ts",
) -> None:
    """Run the merge stream to completion over currently-available input
    (``availableNow`` trigger — batch-sized backfill through the streaming
    engine, the standard pattern for catch-up runs)."""
    q = (
        events.writeStream.foreachBatch(
            foreach_batch_merge(spark, target_path, key=key, order_col=order_col)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
