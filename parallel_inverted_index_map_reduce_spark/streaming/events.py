"""Structured Streaming over the events table (SURVEY.md §7 Phase 5).

The reference is strictly batch (barrier-separated phases,
/root/reference/src/main.cpp:143,155,207); this module re-expresses the
engine's windowed aggregations as streams: file source -> event-time
windows (+ watermark for late data) -> sink. The batch twins of these
plans live in plans/queries_streaming.py and go through the DuckDB
oracle; the streaming variants are asserted equal to their batch twins
in tests (same data, complete output mode).

At scale the source would be Kafka/object-store file streams; the state
store bounds memory via the watermark, and session windows use Spark's
native session_window (state merged per key, no custom stateful op
needed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_raw_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based streaming source over the events parquet, normalized
    to the same schema as the batch loader (ts -> timestamp micros).

    ``readStream`` needs an explicit schema, but the file's physical ts
    type varies by generator version (TIMESTAMP(NANOS) vs micros). Peek
    at the batch-inferred schema once — with nanosAsLong on, NANOS files
    surface ts as int64 — and stream with whichever ts type the file
    actually has, converting nanos -> micros only when needed (the same
    truncation DuckDB applies, see sources/tables.py).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    ts_type = spark.read.parquet(path).schema["ts"].dataType
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_type))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(ts_type, LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # Watermarks demand TIMESTAMP (LTZ): EVENT_TIME_IS_NOT_ON_
        # TIMESTAMP_TYPE for NTZ event-time columns. The session runs in
        # UTC, so the NTZ -> LTZ cast keeps the wall-clock instant; the
        # window operators cast their outputs back to NTZ to stay
        # type-identical with the batch twins.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Hourly tumbling counts/sums with a watermark for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(38,8)")).alias("sum_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """2h windows sliding by 1h (every event lands in two windows) —
    streaming twin of time_window_stats' 'sliding' branch."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("win_start"),
            "n_events",
        )
    )


def session_counts_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based) — native session_window."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup on event_id within the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain a (bounded) file stream into an in-memory table and return
    the query handle; caller awaits termination of available data."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
