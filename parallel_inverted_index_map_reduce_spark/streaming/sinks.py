"""Exactly-once streaming sink via foreachBatch.

Spark's file sinks are at-least-once on retry unless the writer is
idempotent; the standard pattern is foreachBatch keyed by ``batch_id``:
each micro-batch lands in its own directory, a commit marker records
completion, and a replayed batch (same id) either overwrites its own
directory (before marker) or is skipped (after marker). Either way the
dataset never double-counts a batch — the property "exactly-once"
actually means for a file sink.

The marker is load-bearing on BOTH sides: writers skip committed ids,
and readers must read ONLY committed directories — a crash between the
data write and the marker leaves a partial directory that readers have
to ignore until the restarted stream rewrites it.

At scale the same pattern drives MERGE-into-table-format sinks; the
directory-per-batch layout here is the dependency-free equivalent.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def batch_dir(path: str, batch_id: int) -> str:
    return os.path.join(path, f"batch_id={batch_id}")


def marker_path(path: str, batch_id: int) -> str:
    return os.path.join(path, f"_committed_{batch_id}")


def is_committed(path: str, batch_id: int) -> bool:
    return os.path.exists(marker_path(path, batch_id))


def commit(path: str, batch_id: int) -> None:
    open(marker_path(path, batch_id), "w").close()


def committed_batch_dirs(path: str) -> list[str]:
    """Directories whose commit marker exists — the only ones a reader
    may trust. Partial directories from a crash mid-write are excluded
    until their batch is replayed and committed."""
    out = []
    for d in sorted(glob.glob(os.path.join(path, "batch_id=*"))):
        try:
            bid = int(d.rsplit("=", 1)[1])
        except ValueError:
            continue
        if is_committed(path, bid):
            out.append(d)
    return out


def start_exactly_once_parquet(
    stream_df: DataFrame, path: str, checkpoint: str, output_mode: str | None = None
):
    """Start the stream writing parquet under ``path/batch_id=N/``.

    Returns the StreamingQuery; callers await it. Restarting with the
    same checkpoint resumes after the last committed batch; a batch
    replayed by failure recovery rewrites only its own directory.

    ``output_mode`` — set to ``"update"`` for stateful upstream
    operators (applyInPandasWithState requires the sink mode to match
    the operator's declared mode); the default leaves Spark's append.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if is_committed(path, batch_id):
            return  # replay of a committed batch: drop it
        batch_df.write.mode("overwrite").parquet(batch_dir(path, batch_id))
        commit(path, batch_id)

    writer = stream_df.writeStream.foreachBatch(write_batch)
    if output_mode is not None:
        writer = writer.outputMode(output_mode)
    return (
        writer.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_exactly_once_parquet(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Read everything the sink COMMITTED (batch_id becomes a column).
    Uncommitted (crash-partial) directories are excluded.

    A committed batch whose DataFrame was empty leaves a directory with
    a _SUCCESS marker but no part files; such directories are legal
    (the batch IS committed — it contributed zero rows) but poison
    schema inference when they are the only committed ones. They are
    skipped, and when nothing data-bearing remains the reader returns
    an empty frame under ``schema`` (required in that case: with zero
    files there is nothing to infer from).
    """
    dirs = committed_batch_dirs(path)
    if not dirs:
        raise FileNotFoundError(f"no committed batches under {path}")
    data_dirs = [d for d in dirs if glob.glob(os.path.join(d, "*.parquet"))]
    if not data_dirs:
        if schema is None:
            raise FileNotFoundError(
                f"all committed batches under {path} are empty; pass an "
                "explicit schema to read them as an empty DataFrame"
            )
        empty = spark.createDataFrame([], schema)
        if "batch_id" not in empty.columns:
            # the normal read path appends batch_id from the directory
            # names (partition-inferred as int); the fallback must match
            from pyspark.sql import functions as F

            empty = empty.withColumn("batch_id", F.lit(None).cast("int"))
        return empty
    reader = spark.read.option("basePath", path)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*data_dirs)
