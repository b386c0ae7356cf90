"""Incremental inverted-index maintenance from a document stream —
delta versions.

The reference builds its index in one batch run over a fixed manifest
(/root/reference/src/main.cpp:49-320, end-to-end); this maintains the
SAME artifact incrementally: each micro-batch re-chunks ONLY the words
it touches (:func:`operators.index.merge_index_chunked` with
``delta_only=True``) and writes those words' complete new rows as its
DELTA, plus a ``_MANIFEST.json`` listing the live deltas that compose
the version (streaming/deltas.py, mode ``lww`` keyed by word: a later
delta's rows supersede every earlier row for the same word). Per-batch
write cost is O(affected vocabulary) — never O(index) — which is the
shape a 100 TB daily ingest needs; the pre-round-11 protocol rewrote
the full chunk table every batch.

Consistency story is unchanged (streaming/sinks.py): deltas + manifest
land before the commit marker, so a version is complete-or-invisible —
a crash mid-write leaves an uncommitted directory that readers ignore
and the replayed batch overwrites; the reader always sees the LATEST
COMMITTED version, a full, consistent index of every committed batch's
documents. Re-ingested doc_ids are idempotent at the postings level
(per-word ids are distinct-merged).

Compaction (:func:`compact_index_store`) and pruning
(:func:`prune_index_versions`) are the offline maintenance pair: the
compactor materializes the latest version's composition into one
``compact=V`` directory and atomically repoints V's manifest at it;
pruning then deletes any directory no retained manifest references.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index as ix
from . import deltas as dv
from . import sinks as eo

# every delta reads under one pinned schema: a zero-row batch's empty
# directory has no part files to infer from, and LWW composition needs
# type-identical deltas (doc ids normalize to long on the way in — the
# schema-drift contract)
CHUNK_SCHEMA = (
    "letter string, word string, chunk_id bigint, df bigint, "
    "postings array<bigint>"
)


def _read_delta(spark: SparkSession):
    def read_one(path: str) -> DataFrame:
        return spark.read.schema(CHUNK_SCHEMA).parquet(path)

    return read_one


def _compose_version(
    spark: SparkSession, index_dir: str, man: dict
) -> DataFrame:
    return dv.read_artifact(index_dir, man, "index", _read_delta(spark))


def read_index_version(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The latest COMMITTED index version (manifest-composed), or None
    before the first commit. Uncommitted (crash-partial) versions are
    never visible."""
    latest = dv.latest_committed_dir(index_dir)
    if latest is None:
        return None
    return _compose_version(spark, index_dir, dv.read_manifest(latest))


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
        batch = batch_docs.withColumn("doc_id", F.col("doc_id").cast("long"))
        prev_dir = dv.latest_committed_dir(index_dir)
        prev_man = dv.read_manifest(prev_dir) if prev_dir else None
        if prev_man is None:
            delta = ix.build_index_chunked(batch, chunk_size=chunk_size)
        else:
            delta = ix.merge_index_chunked(
                _compose_version(spark, index_dir, prev_man),
                batch,
                chunk_size=chunk_size,
                delta_only=True,
            )
        out = eo.batch_dir(index_dir, batch_id)
        delta.write.mode("overwrite").parquet(out)
        dv.write_manifest(
            out,
            batch_id,
            {
                "index": dv.extend_deltas(
                    prev_man, "index", os.path.basename(out), "lww",
                    key="word",
                )
            },
        )
        eo.commit(index_dir, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_index_store(spark: SparkSession, index_dir: str) -> int:
    """Offline maintenance: materialize the latest committed version's
    LWW composition as one ``compact=V`` directory, commit its marker,
    and atomically repoint version V's manifest at it (content-equal by
    construction). Returns V; follow with :func:`prune_index_versions`
    to free the superseded per-batch deltas."""
    latest = dv.latest_committed_dir(index_dir)
    if latest is None:
        raise FileNotFoundError(f"no committed index version in {index_dir}")
    version = int(latest.rsplit("=", 1)[1])
    man = dv.read_manifest(latest)
    composed = _compose_version(spark, index_dir, man)
    cdir = dv.compact_dir(index_dir, version)
    composed.write.mode("overwrite").parquet(cdir)
    dv.finish_compaction(
        index_dir, version, {"index": os.path.basename(cdir)}
    )
    return version


def prune_index_versions(index_dir: str, keep: int = 1) -> int:
    """Delete committed directories no retained version's manifest
    references (streaming/deltas.py's rule: markers first, data second,
    uncommitted directories left for their replaying batch). Under the
    delta protocol a delta stays live while any retained manifest lists
    it — run :func:`compact_index_store` first to supersede old deltas,
    then prune to actually free them. Returns directories removed."""
    return dv.prune_versions(index_dir, keep=keep)
