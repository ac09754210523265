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


def foreach_batch_db_upsert(
    *,
    table: str,
    key_cols: str | list[str],
    connection_factory: Callable,
    paramstyle: str = "format",
    batch_size: int = 500,
    quarantine_table: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body that lands each micro-batch in a DB-API
    database through the keyed-upsert sink — the streaming face of the
    reference's Postgres writes. ``foreachBatch`` delivers batches
    at-least-once (a failed/replayed batch re-runs whole); because
    :func:`ibc_spark.io_.sinks.dbapi_upsert` is an idempotent keyed MERGE
    (INSERT .. ON CONFLICT DO UPDATE), replays converge to the same
    database state — effectively exactly-once for the keyed tables.
    Quarantine INSERTs remain at-least-once (see ``dbapi_upsert``'s
    contract); dedupe downstream if exact quarantine accounting matters.

    Proven against a REAL Postgres in ``tests/test_pgwire_integration.py``
    (availableNow run + a from-scratch checkpoint replay leaving the
    database unchanged)."""
    from ibc_spark.io_.sinks import dbapi_upsert

    def body(batch_df: DataFrame, batch_id: int) -> None:
        dbapi_upsert(
            batch_df,
            table=table,
            key_cols=key_cols,
            connection_factory=connection_factory,
            paramstyle=paramstyle,
            batch_size=batch_size,
            quarantine_table=quarantine_table,
        )

    return body
