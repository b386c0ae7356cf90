"""Incremental inverted-index maintenance from a document stream.

The reference builds its index in one batch run over a fixed manifest
(/root/reference/src/main.cpp:49-320, end-to-end); this maintains the
SAME artifact incrementally: each micro-batch of new documents folds
into the stored chunked index via
:func:`operators.index.merge_index_chunked` (re-chunking only the words
the batch touches), and each resulting index VERSION lands
exactly-once under the commit-marker protocol (streaming/sinks.py).

Consistency story: a version directory is complete-or-invisible — a
crash between the data write and the marker leaves an uncommitted
directory that readers ignore and the replayed batch overwrites; the
reader always sees the LATEST COMMITTED version, which is by
construction a full, consistent index of every committed batch's
documents. Re-ingested doc_ids are idempotent at the postings level
(per-word ids are distinct-merged).

Space trade, stated plainly: each version is a full snapshot —
at 100 TB you retain the latest few and call
:func:`prune_index_versions` from the same maintenance cadence that
compacts small files; the merge itself only RECOMPUTES affected words,
the snapshot write is what a table format with copy-on-write file
reuse would amortize.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators import index as ix
from . import sinks as eo


def read_index_version(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The latest COMMITTED index version, or None before the first
    commit. Uncommitted (crash-partial) versions are never visible."""
    dirs = eo.committed_batch_dirs(index_dir)
    if not dirs:
        return None
    latest = max(dirs, key=lambda d: int(d.rsplit("=", 1)[1]))
    return spark.read.parquet(latest)


def start_incremental_index(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint: str,
    chunk_size: int = 4096,
):
    """Start maintaining the chunked index over a document stream;
    returns the StreamingQuery (callers await it)."""

    def process_batch(batch_docs: DataFrame, batch_id: int) -> None:
        if eo.is_committed(index_dir, batch_id):
            return  # replay of a committed batch: drop it
        spark = batch_docs.sparkSession
        prev = read_index_version(spark, index_dir)
        if prev is None:
            new_index = ix.build_index_chunked(batch_docs, chunk_size=chunk_size)
        else:
            new_index = ix.merge_index_chunked(
                prev, batch_docs, chunk_size=chunk_size
            )
        new_index.write.mode("overwrite").parquet(eo.batch_dir(index_dir, batch_id))
        eo.commit(index_dir, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def prune_index_versions(index_dir: str, keep: int = 1) -> int:
    """Delete all but the newest ``keep`` committed versions; uncommitted
    directories are left for their replaying batch. Returns the number
    of versions removed.

    Deletion order is the invariant: the MARKER goes first, the data
    directory second. A crash between the two then leaves an
    uncommitted (invisible) directory — the state the protocol already
    tolerates — instead of a marker without data, which would make
    ``is_committed`` lie and let the replay guard silently drop a
    redelivered batch.
    """
    import os

    dirs = sorted(
        eo.committed_batch_dirs(index_dir),
        key=lambda d: int(d.rsplit("=", 1)[1]),
    )
    removed = 0
    for d in dirs[:-keep] if keep else dirs:
        bid = int(d.rsplit("=", 1)[1])
        try:
            os.remove(eo.marker_path(index_dir, bid))
        except FileNotFoundError:
            pass
        shutil.rmtree(d, ignore_errors=True)
        removed += 1
    return removed
