"""Time-window operators (SURVEY.md §2.9): tumbling, sliding, session.

Registered here in batch form (same ``F.window``/``F.session_window``
expressions Structured Streaming uses — Spark evaluates them identically
in both modes, so the oracle check covers the streaming semantics; the
live readStream path is exercised in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import ints, sql_ints, sql_scaled_sum, scaled_sum, t
from .registry import query

_VAL_I = sql_ints("value", 10000)


@query(
    "win_tumbling",
    oracle=f"""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           CAST(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_scaled_sum(_VAL_I, 'total_value', 10000)}
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def win_tumbling(spark, sf_dir):
    """1-hour tumbling windows — in streaming this becomes
    ``withWatermark + groupBy(window(...))`` with identical results."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            scaled_sum(ints("value", 10000), "total_value", 10000),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "win_sliding",
    oracle=f"""
    SELECT window_start,
           CAST(window_start + INTERVAL '1 hour' AS TIMESTAMP) AS window_end,
           COUNT(*) AS n_events,
           {sql_scaled_sum(_VAL_I, 'total_value', 10000)}
    FROM (SELECT CAST(time_bucket(INTERVAL '30 minutes', ts)
                      - k.k * INTERVAL '30 minutes' AS TIMESTAMP) AS window_start,
                 value
          FROM events CROSS JOIN (VALUES (0), (1)) k(k))
    GROUP BY 1, 2
    """,
)
def win_sliding(spark, sf_dir):
    """1-hour windows sliding every 30 min: each event lands in exactly
    two windows (size/slide = 2) — the oracle materializes that
    assignment with an explicit offset join."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            scaled_sum(ints("value", 10000), "total_value", 10000),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "win_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           CAST(MAX(ts) + INTERVAL '10 minutes' AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def win_session(spark, sf_dir):
    """Gap-based sessionization (10-min inactivity closes a session).
    Spark's built-in session_window ends sessions at last-event + gap;
    the oracle reproduces that with the classic lag/cumsum island SQL
    (DuckDB has no session windows)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
