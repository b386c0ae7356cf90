"""Incremental training-data preparation: the streaming twin of
pipeline.prepare_training_data.

New document files land in a directory; each micro-batch runs the full
batch pipeline (scrub -> filter -> dedup -> chunk -> pack) on the new
documents and writes its output exactly-once through the commit-marker
protocol in streaming/sinks.py (one implementation, shared — writers
skip committed ids, readers trust only committed directories, so a
crash-replayed batch can neither double-land nor see its own partial
output).

Semantics note, stated rather than hidden: near-dup dedup runs WITHIN
each micro-batch; exact duplicates of already-landed documents are
dropped cross-batch by anti-joining on the COMMITTED landed doc_ids.
Cross-batch NEAR-dup suppression needs a persistent signature store
(the landed MinHash table as the anti-join side) — the batch pipeline
remains the ground truth for full-corpus dedup, and the checkpointed
re-run is the correction mechanism, exactly how production pipelines
reconcile.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import pipeline as batch_pipeline
from . import sinks as eo


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File stream over the documents parquet (schema from a batch peek,
    same physical-type sniffing rationale as the events stream)."""
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def start_incremental_prep(
    docs_stream: DataFrame, out_dir: str, checkpoint: str, **prep_kwargs
):
    """Start the incremental prep stream; returns the StreamingQuery."""

    def process_batch(batch_docs: DataFrame, batch_id: int) -> None:
        if eo.is_committed(out_dir, batch_id):
            return
        spark = batch_docs.sparkSession
        fresh = batch_docs
        # Anti-join against COMMITTED output only: a replay of a batch
        # that crashed after writing data but before its marker must NOT
        # see its own partial directory, or it would drop its whole
        # input and commit an empty batch (silent data loss).
        landed_ids = _landed_doc_ids(spark, out_dir)
        if landed_ids is not None:
            fresh = batch_docs.join(landed_ids, "doc_id", "left_anti")
        packed = batch_pipeline.prepare_training_data(fresh, **prep_kwargs)
        packed.write.mode("overwrite").parquet(eo.batch_dir(out_dir, batch_id))
        eo.commit(out_dir, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _landed_doc_ids(spark: SparkSession, out_dir: str):
    dirs = eo.committed_batch_dirs(out_dir)
    if not dirs:
        return None
    return (
        spark.read.option("basePath", out_dir)
        .parquet(*dirs)
        .select("doc_id")
        .distinct()
    )


def read_prepared(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed output only (see streaming/sinks.py)."""
    return eo.read_exactly_once_parquet(spark, out_dir)
