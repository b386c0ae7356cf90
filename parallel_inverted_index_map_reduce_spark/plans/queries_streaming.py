"""Batch twins of the streaming window operators (oracle-checked).

``F.window`` / ``F.session_window`` evaluate identically over batch
DataFrames, so these specs exercise the exact expressions the streaming
plans use while remaining SQL-oracle-checkable; the true streaming
variants (file source, watermark, availableNow trigger) are asserted
equal to these in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "time_window_stats",
    oracle="""
SELECT 'tumbling' AS win_kind,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(round(value, 6) AS DECIMAL(38,8))) AS VARCHAR) AS sum_value
FROM events
GROUP BY 2, 3
UNION ALL
SELECT 'sliding',
       CAST(date_trunc('hour', ts) - to_hours(o) AS TIMESTAMP),
       NULL,
       count(*),
       NULL
FROM events, unnest([0, 1]) AS t(o)
GROUP BY 2
""",
    tags=("streaming", "window"),
    doc="Time-window aggregates in one labeled result: hourly tumbling "
    "per event_type (streaming twin: streaming/events.py "
    "tumbling_counts_stream) and a 2h window sliding by 1h (every "
    "event lands in two windows).",
)
def q_time_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tumbling = (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(38,8)"))
            .cast("string")
            .alias("sum_value"),
        )
        .select(
            F.lit("tumbling").alias("win_kind"),
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sliding = (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.lit("sliding").alias("win_kind"),
            F.col("win.start").alias("win_start"),
            F.lit(None).cast("string").alias("event_type"),
            "n_events",
            F.lit(None).cast("string").alias("sum_value"),
        )
    )
    return tumbling.unionByName(sliding)


@register(
    "session_window_stats",
    oracle="""
WITH flags AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flags
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
""",
    tags=("streaming", "window"),
    doc="Gap-based (30 min) session windows per user — native "
    "session_window vs a gaps-and-islands oracle.",
)
def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
