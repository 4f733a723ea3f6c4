"""Stream-stream join (SURVEY.md §2.9 EXT surface — the remaining
Structured Streaming op family after windows/dedup/arbitrary state).

Spark buffers BOTH sides in the state store until the watermark plus
the join's time bound says a row can no longer match — so an
unbounded-time condition would buffer forever.  The interval join here
is the canonical safe shape: equi-key + a bounded event-time range.
State size ≈ input rate × (watermark + interval) per side; that, not
throughput, is what to capacity-plan at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Pairs of (left, right) rows with equal ``key`` where the right
    event lands inside [left.ts, left.ts + within] — e.g. "purchase
    within 30 minutes of a signup".  Output columns are prefixed
    l_/r_ to keep the join self-describing."""
    l = left.withWatermark(left_ts, watermark).select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select(
        F.col("l_key").alias("user_id"), "l_event_id", "r_event_id", "l_ts", "r_ts"
    )
