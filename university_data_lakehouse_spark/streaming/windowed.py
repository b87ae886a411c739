"""Watermarked windowed aggregations on the events schema.

The streaming twin of ``operators/events.events_windowed_agg``:
tumbling/sliding event-time windows with late-data handling. The
watermark bounds state size — without it, a 100 TB stream's window
state grows without limit; with it, windows older than the watermark
are finalized and evicted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import DEC


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window: counts + value sum per
    (window, event_type); rows later than the watermark are dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``operators/dedup.dedup_exact``:
    ``dropDuplicatesWithinWatermark`` keeps the first arrival per key
    and discards replays that arrive within the watermark horizon.
    The watermark bounds the dedup state exactly like it bounds
    window state — keys older than the horizon are evicted, so state
    is O(keys per watermark window), not O(stream length). This is
    the at-least-once → effectively-once repair stage a landing
    pipeline runs before bronze."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def sliding_value_sum(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding window (overlapping buckets) per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len, slide).alias("w"), F.col("event_type"))
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "total_value",
        )
    )
