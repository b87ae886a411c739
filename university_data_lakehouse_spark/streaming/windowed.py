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


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (``F.session_window``): per-user
    sessions close after ``gap`` of event-time silence. The DECLARATIVE
    twin of streaming/stateful.py's ``applyInPandasWithState``
    sessionizer — same semantics, but expressed as a windowed
    aggregation so Catalyst plans it (merging session state is
    engine-managed and watermark-evicted; prefer this form unless the
    session logic genuinely needs imperative per-group code)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_delay: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM event-time interval join (the ad-attribution
    shape: a right-stream event joins a left-stream event by key when
    it happens within ``max_delay`` AFTER it). Both sides carry
    watermarks and the join condition bounds event-time distance, so
    Spark can evict buffered state on BOTH sides — the state-boundedness
    requirement for any stream-stream join at 100 TB (an unbounded
    condition would buffer both streams forever).

    Column convention: the left stream's ts/event_id arrive prefixed
    ``l_``, the right stream's ``r_``.
    """
    l = left.select(
        F.col(key),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    ).withWatermark("l_ts", left_watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    ).withWatermark("r_ts", right_watermark)
    cond = (
        (F.col(key) == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond).select(
        key, "l_event_id", "l_ts", "r_event_id", "r_ts",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("delay_us"),
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
