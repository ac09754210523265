"""Event-time windowed aggregations with watermarks.

The tumbling rollup is the streaming face of the batch query
``events_hourly_rollup`` (registry) — same grouping keys, same aggregates.
Watermarks bound state: late rows beyond the watermark are dropped instead of
growing executor state forever (the 100 TB posture for unbounded streams).

``approx_count_distinct`` replaces ``countDistinct`` in streaming mode
(exact distinct per window needs unbounded per-window sets; HLL state is
O(KB) per window regardless of cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window × event_type rollup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value", "approx_users")
    )


def sliding_window_stream(
    events: DataFrame, *, length: str = "1 hour", slide: str = "15 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sliding window counts — each row lands in length/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "event_type", "n_events")
    )


def session_window_stream(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. State is one open session per user key, merged by Spark's
    session-window operator (no custom state code needed)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
