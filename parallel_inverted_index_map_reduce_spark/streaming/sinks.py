"""Exactly-once streaming sink via foreachBatch.

Spark's file sinks are at-least-once on retry unless the writer is
idempotent; the standard pattern is foreachBatch keyed by ``batch_id``:
each micro-batch lands in its own directory, a commit marker records
completion, and a replayed batch (same id) either overwrites its own
directory (before marker) or is skipped (after marker). Either way the
dataset never double-counts a batch — the property "exactly-once"
actually means for a file sink.

At scale the same pattern drives MERGE-into-table-format sinks; the
directory-per-batch layout here is the dependency-free equivalent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def start_exactly_once_parquet(
    stream_df: DataFrame, path: str, checkpoint: str
):
    """Start the stream writing parquet under ``path/batch_id=N/``.

    Returns the StreamingQuery; callers await it. Restarting with the
    same checkpoint resumes after the last committed batch; a batch
    replayed by failure recovery rewrites only its own directory.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(path, f"batch_id={batch_id}")
        marker = os.path.join(path, f"_committed_{batch_id}")
        if os.path.exists(marker):
            return  # replay of a committed batch: drop it
        batch_df.write.mode("overwrite").parquet(target)
        open(marker, "w").close()

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_exactly_once_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read everything the sink committed (batch_id becomes a column)."""
    return spark.read.option("basePath", path).parquet(
        os.path.join(path, "batch_id=*")
    )
