"""Incremental training-data preparation: the streaming twin of
pipeline.prepare_training_data.

New document files land in a directory; each micro-batch runs the full
batch pipeline (scrub -> filter -> dedup -> chunk -> pack) on the new
documents and writes its output exactly-once through the commit-marker
protocol in streaming/sinks.py (one implementation, shared — writers
skip committed ids, readers trust only committed directories, so a
crash-replayed batch can neither double-land nor see its own partial
output).

Cross-batch dedup semantics:

- EXACT duplicates of already-landed documents are dropped by
  anti-joining on the committed landed doc_ids.
- NEAR duplicates of already-landed documents are suppressed against a
  persistent MinHash SIGNATURE STORE: each batch lands the 16-long
  signatures of the documents it kept (next to its output, gated by
  the SAME commit marker, so store and output stay atomic), and new
  documents whose banded candidates against the store carry a MinHash
  agreement estimate >= the threshold are dropped. The estimator
  (operators/dedup.py minhash_estimate) has ~0.1 std error at 16
  permutations — a suppressor biased to keep, not an exact verifier;
  the batch pipeline over the full corpus remains the ground truth and
  the checkpointed re-run the correction mechanism, exactly how
  production pipelines reconcile. Within a batch, the full
  shingle-exact near-dup flow still runs.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import pipeline as batch_pipeline
from ..operators import dedup as dd
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


def _sig_store(out_dir: str) -> str:
    return out_dir.rstrip("/") + "_sigs"


def start_incremental_prep(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    cross_batch_threshold: float | None = 0.8,
    **prep_kwargs,
):
    """Start the incremental prep stream; returns the StreamingQuery.

    ``cross_batch_threshold`` — estimated-Jaccard cutoff for suppressing
    near-duplicates of ALREADY-LANDED documents (None disables, leaving
    only within-batch near-dup and cross-batch exact dedup).
    """

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
        batch_sigs = None
        if cross_batch_threshold is not None:
            landed_sigs = _landed_signatures(spark, out_dir)
            if landed_sigs is not None:
                # pin the signature table: it feeds the candidate join,
                # the estimator (twice), and the final store write —
                # without the checkpoint the shingle->minhash aggregation
                # re-executes per consumer
                batch_sigs = dd.minhash_table(fresh).localCheckpoint(
                    eager=False
                )
                cand = dd.lsh_cross_candidates(batch_sigs, landed_sigs)
                near = (
                    dd.minhash_estimate(batch_sigs, landed_sigs, cand)
                    .where(F.col("est_jaccard") >= cross_batch_threshold)
                    .select("doc_id")
                    .distinct()
                )
                fresh = fresh.join(near, "doc_id", "left_anti")
        # pin the suppressed batch input: prepare_training_data fans it
        # into several independent actions (quality semi-join, keep-list
        # checkpoints, chunk/pack), each of which would otherwise replay
        # the anti-joins AND the whole cross-batch probe chain above —
        # measured 3x the per-batch wall at sf0.01 (BENCH_NOTES round 8)
        fresh = fresh.localCheckpoint(eager=False)
        packed = batch_pipeline.prepare_training_data(fresh, **prep_kwargs)
        packed.write.mode("overwrite").parquet(eo.batch_dir(out_dir, batch_id))
        # signature store: 16 longs per KEPT doc, written before the
        # marker so store and output commit (or vanish) together. Kept
        # ids come from the parquet JUST WRITTEN — not from `packed`,
        # whose semi-join would re-execute the whole prep lineage a
        # second time — and the batch's signatures are reused when the
        # cross-batch stage already computed them (a superset of the
        # kept docs; the semi-join narrows it).
        # Explicit schema: a batch whose every doc was suppressed writes
        # a data-less directory (marker only), and a schemaless read-back
        # would fail inference and crash the stream BEFORE its commit —
        # wedging the checkpoint on a legal zero-row batch.
        kept_ids = (
            spark.read.schema(packed.schema)
            .parquet(eo.batch_dir(out_dir, batch_id))
            .select("doc_id")
            .distinct()
        )
        if batch_sigs is None:
            batch_sigs = dd.minhash_table(fresh)
        batch_sigs.join(kept_ids, "doc_id", "left_semi").write.mode(
            "overwrite"
        ).parquet(eo.batch_dir(_sig_store(out_dir), batch_id))
        eo.commit(out_dir, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _landed_doc_ids(spark: SparkSession, out_dir: str):
    # A committed batch may have landed ZERO docs (every input doc
    # suppressed as a duplicate) — its directory holds only the success
    # marker and would poison schema inference if it were the only one
    # (same failure class read_exactly_once_parquet guards against).
    dirs = [
        d
        for d in eo.committed_batch_dirs(out_dir)
        if glob.glob(os.path.join(d, "*.parquet"))
    ]
    if not dirs:
        return None
    return (
        spark.read.option("basePath", out_dir)
        .parquet(*dirs)
        .select("doc_id")
        .distinct()
    )


def _landed_signatures(spark: SparkSession, out_dir: str):
    """Signatures of every doc landed by a COMMITTED batch — the store
    shares out_dir's markers (written before them), so a crash-partial
    store directory is exactly as invisible as its output twin."""
    sig_dir = _sig_store(out_dir)
    dirs = [
        os.path.join(sig_dir, os.path.basename(d))
        for d in eo.committed_batch_dirs(out_dir)
    ]
    dirs = [d for d in dirs if glob.glob(os.path.join(d, "*.parquet"))]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def read_prepared(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed output only (see streaming/sinks.py)."""
    return eo.read_exactly_once_parquet(spark, out_dir)
