"""Batch twins of the streaming window operators (oracle-checked).

``F.window`` / ``F.session_window`` evaluate identically over batch
DataFrames, so these specs exercise the exact expressions the streaming
plans use while remaining SQL-oracle-checkable; the true streaming
variants (file source, watermark, availableNow trigger) are asserted
equal to these in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _stateful_totals_store(
    spark: SparkSession, sf_dir: str, events: DataFrame
) -> str:
    """Drain the CUSTOM STATEFUL operator (streaming/stateful.py
    running_totals_exact, applyInPandasWithState) over the events table
    split into three micro-batches and return the committed sink dir
    (session-memoized — plans/stores.py). The measure is pre-rounded IN
    SPARK (round(value, 6)) so the Python state only ever sums exact
    decimals; cumulative totals are order- and split-independent, so
    maxFilesPerTrigger batching needs no deterministic file order here
    (unlike the prep pipeline)."""
    from ..streaming import sinks as eo
    from ..streaming import stateful
    from .stores import drain, session_store

    def build(tmp: str) -> str:
        src = os.path.join(tmp, "events_in")
        out = os.path.join(tmp, "totals")
        ckpt = os.path.join(tmp, "ckpt")
        staged = events.select(
            "event_type", F.round(F.col("value"), 6).alias("value6")
        )
        staged.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(staged.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        drain(
            eo.start_exactly_once_parquet(
                stateful.running_totals_exact(stream),
                out,
                ckpt,
                output_mode="update",
            ),
            "stateful totals stream",
        )
        return out

    return session_store("stateful_totals", sf_dir, build)


# stateful_totals oracle envelope: DuckDB's CAST(round(value,6) AS
# DECIMAL(38,8)) rounds the binary double directly, while Spark/Python
# go through the double's shortest decimal repr; the two agree in the
# 8th decimal only while |value| stays below ~3.3e7 (there the double's
# ulp crosses 5e-9). tests/test_streaming.py::
# test_events_fixture_value_envelope pins the fixture inside that bound
# (and NaN-free — see streaming/stateful.py), so a generator change
# fails the test loudly instead of turning this row confusingly red.
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
UNION ALL
SELECT 'stateful_totals',
       CAST(NULL AS TIMESTAMP),
       event_type,
       count(*),
       CAST(SUM(CAST(round(value, 6) AS DECIMAL(38,8))) AS VARCHAR)
FROM events
GROUP BY event_type
""",
    tags=("streaming", "window"),
    doc="Time-window aggregates in one labeled result: hourly tumbling "
    "per event_type (streaming twin: streaming/events.py "
    "tumbling_counts_stream) and a 2h window sliding by 1h (every "
    "event lands in two windows). 'stateful_totals' rows driver-verify "
    "the CUSTOM STATEFUL operator (streaming/stateful.py "
    "running_totals_exact — applyInPandasWithState, the extension "
    "point for semantics Spark's built-in windows/dedup cannot "
    "express): the events stream drains as three availableNow "
    "micro-batches through the exactly-once sink, per-key state "
    "carries (count, exact decimal sum) ACROSS batches, and the final "
    "emission per event_type must equal the whole-table aggregate — "
    "if state were lost between batches the counts would be per-batch "
    "and the row would go red. The measure is pre-rounded in Spark "
    "(round(value, 6)) and the Python state sums decimal.Decimal over "
    "the rounded doubles' exact decimal values, so the cumulative sum "
    "is order- and batch-split-independent and renders identically to "
    "the oracle's DECIMAL(38,8) sum at scale 8.",
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
    # custom stateful operator, drained through the exactly-once sink:
    # update mode emits one row per key per batch, each carrying the
    # cumulative state, so the LAST emission per key (max batch_id) is
    # the final total — compared against the whole-table aggregate
    from pyspark.sql import Window

    from ..streaming.sinks import read_exactly_once_parquet

    store = _stateful_totals_store(spark, sf_dir, _events(spark, sf_dir))
    w_last = Window.partitionBy("event_type").orderBy(F.col("batch_id").desc())
    stateful_rows = (
        read_exactly_once_parquet(spark, store)
        .withColumn("_rn", F.row_number().over(w_last))
        .where(F.col("_rn") == 1)
        .select(
            F.lit("stateful_totals").alias("win_kind"),
            F.lit(None).cast("timestamp").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return tumbling.unionByName(sliding).unionByName(stateful_rows)


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
