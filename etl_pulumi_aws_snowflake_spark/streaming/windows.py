"""Streaming window/dedup builders (SURVEY.md §2.9 EXT surface).

These wrap the exact expressions the batch queries use, applied to a
streaming DataFrame with a watermark — the engine's contract is that
batch and streaming agree on window contents (verified in
tests/test_streaming.py against the oracle-checked batch queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    size: str = "1 hour",
    watermark: str = "1 hour",
    ts: str = "ts",
) -> DataFrame:
    """Tumbling count+sum per (window, event_type); the watermark bounds
    state so a continuous run never accumulates unbounded windows."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(ts, size), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "1 hour",
    ts: str = "ts",
) -> DataFrame:
    """Session windows per user (built-in session_window state merge)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(ts, gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key stream: dropDuplicates scoped by watermark
    so the dedup state is dropped once keys age out — the unbounded
    variant would OOM a long-running job."""
    return events.withWatermark(ts, watermark).dropDuplicates(keys)


def sliding_counts(
    events: DataFrame,
    size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
    ts: str = "ts",
) -> DataFrame:
    """Sliding count per (window, event_type): each event lands in
    size/slide overlapping windows (state grows accordingly — watermark
    sizing matters twice as much as for tumbling)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(ts, size, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
