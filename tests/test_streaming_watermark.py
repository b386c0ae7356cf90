"""Watermark late-data semantics: a row older than (max event time -
watermark delay) must be dropped from the windowed aggregation, while
an on-time row in the same micro-batch still updates its window. This
is the behavior that distinguishes a watermarked stream from its batch
twin (the batch oracle would count the late row).

Empirical Spark detail the test layout encodes: the stateful operator
filters late input with the watermark committed as of the PREVIOUS
batch (one-batch lag). A row arriving in the very next batch after the
watermark passes it is still admitted (and its stale window finalized);
arriving two batches later, it is dropped. Hence three files -> three
micro-batches (maxFilesPerTrigger=1, ordered by file mtime)."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from parallel_inverted_index_map_reduce_spark.streaming import events as sev

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch micros
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

MIN_US = 60_000_000
T12 = 1_704_110_400_000_000  # 2024-01-01 12:00:00 UTC in epoch micros
T08 = T12 - 4 * 60 * MIN_US


def _write(path: str, rows: list[tuple]) -> None:
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.int64()),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
            }
        ),
        path,
    )


def test_watermark_drops_late_rows(spark, tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    # batch 1: 12:00/12:01 events -> watermark after it = 11:01
    _write(str(d / "a.parquet"), [(1, T12, 1, "click", 1.0), (2, T12 + MIN_US, 1, "view", 2.0)])
    time.sleep(1.1)  # file source orders batches by modification time
    # batch 2: on-time event; watermark 11:01 is now committed for batch 3
    _write(str(d / "b.parquet"), [(5, T12 + 20 * MIN_US, 3, "view", 9.0)])
    time.sleep(1.1)
    # batch 3: one event 4h behind the committed watermark (dropped) and
    # one on-time event (admitted)
    _write(
        str(d / "c.parquet"),
        [(3, T08, 2, "click", 100.0), (4, T12 + 45 * MIN_US, 2, "click", 3.0)],
    )
    os.utime(str(d / "c.parquet"))

    raw = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    agg = sev.tumbling_counts_stream(
        raw.withColumn("ts", F.timestamp_micros(F.col("ts")))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish within 420s"

    rows = spark.sql("SELECT * FROM t_late").collect()
    assert rows, "stream produced no output"
    # the late 08:00 event's window must never appear
    assert all(r.win_start.hour != 8 for r in rows), rows
    # update mode re-emits a key on change; the final (max) count for the
    # 12:00 click window must include the on-time batch-3 event only
    click_counts = [
        r.n_events
        for r in rows
        if r.event_type == "click" and r.win_start.hour == 12
    ]
    assert max(click_counts) == 2, rows
