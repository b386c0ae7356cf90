"""Streamed maintenance of the full SERVING layout.

streaming/index_stream.py maintains the chunked index incrementally;
this module maintains everything a QUERY needs — positional postings,
doclen, chunks, and the BM25 stats row — so the streamed artifact can
serve bm25/phrase/boolean/NEAR directly, with no batch job in between.

Consistency is the same commit-marker protocol (streaming/sinks.py):
each micro-batch writes a complete versioned snapshot directory
(``batch_id=N/{positions,doclen,chunks,stats}``) and then its marker,
so a version is complete-or-invisible; readers always see the latest
COMMITTED version, which is by construction a full, consistent serving
layout of every committed batch's documents. A crash between the data
write and the marker leaves an ignored partial directory that the
replayed batch overwrites — proven by the crash-injection test.

Space trade, same as index_stream: each version is a full snapshot
(prune with :func:`index_stream.prune_index_versions` pointed at this
directory — the layout matches); the chunk merge only RECOMPUTES
affected words, and the positions/doclen parts of the snapshot are
pass-through unions of already-written parquet. Doc ids must be unique
across the stream (append-only corpus), the same contract as
operators/serving.py extend_search_index.

The snapshot's positions are letter-partitioned parquet, so the
query-side pruning (PartitionFilters + pushed word IN) matches the
stored-table path; queries run through the SAME frame-parameterized
bodies (serving.bm25_from_frames / phrase_from_frames), so streamed
answers are the stored path's answers by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index as ix
from ..operators.index import positional_postings
from . import sinks as eo

# artifact -> explicit read schema: a committed snapshot of an EMPTY
# corpus prefix has directories with no part files, where schema
# inference raises — explicit schemas keep every committed version
# readable (the same empty-directory lesson as sinks.py's reader)
ARTIFACTS = {
    "positions": "word string, doc_id bigint, positions array<int>, letter string",
    "doclen": "doc_id long, dl bigint",
    "docterms": "doc_id long, word string, tf bigint",
    "chunks": (
        "word string, chunk_id bigint, df bigint, "
        "postings array<bigint>, letter string"
    ),
    "stats": "n_docs long, avgdl double",
}


def read_serving_version(
    spark: SparkSession, store_dir: str
) -> dict[str, DataFrame] | None:
    """The latest COMMITTED serving snapshot as {artifact: DataFrame},
    or None before the first commit."""
    dirs = eo.committed_batch_dirs(store_dir)
    if not dirs:
        return None
    latest = max(dirs, key=lambda d: int(d.rsplit("=", 1)[1]))
    return {
        a: spark.read.schema(schema).parquet(os.path.join(latest, a))
        for a, schema in ARTIFACTS.items()
    }


def start_incremental_serving(
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    chunk_size: int = 4096,
):
    """Maintain the serving layout over a document stream; returns the
    StreamingQuery (callers await it)."""

    def process_batch(batch_docs: DataFrame, batch_id: int) -> None:
        if eo.is_committed(store_dir, batch_id):
            return  # replay of a committed batch: drop it
        spark = batch_docs.sparkSession
        batch = batch_docs.localCheckpoint()
        prev = read_serving_version(spark, store_dir)

        # ONE tokenization of the batch: the pinned positional frame
        # feeds positions, doclen, AND the chunk build/merge pairs
        new_pos = (
            positional_postings(batch)
            # a regenerated corpus can carry int32 doc ids (the
            # schema-drift contract); normalize to the snapshot's
            # declared bigint so every committed version reads under
            # the one ARTIFACTS schema
            .withColumn("doc_id", F.col("doc_id").cast("long"))
            .withColumn("letter", F.substring("word", 1, 1))
            .localCheckpoint(eager=False)
        )
        new_pairs = new_pos.select("word", "doc_id")
        new_dl = new_pos.groupBy("doc_id").agg(
            F.sum(F.size("positions")).cast("long").alias("dl")
        )
        new_dt = new_pos.select(
            "doc_id", "word", F.size("positions").cast("long").alias("tf")
        )
        n_batch = batch.count()
        if prev is None:
            pos, dl, dt = new_pos, new_dl, new_dt
            chunks = ix.chunk_pairs(new_pairs, chunk_size=chunk_size)
            n_docs = n_batch
        else:
            pos = prev["positions"].unionByName(new_pos)
            dl = prev["doclen"].unionByName(new_dl)
            dt = prev["docterms"].unionByName(new_dt)
            chunks = ix.merge_index_chunked(
                prev["chunks"], batch, chunk_size=chunk_size,
                new_pairs=new_pairs,
            )
            n_docs = int(prev["stats"].first()["n_docs"]) + n_batch

        out = eo.batch_dir(store_dir, batch_id)
        pos.write.mode("overwrite").partitionBy("letter").parquet(
            os.path.join(out, "positions")
        )
        dl.write.mode("overwrite").parquet(os.path.join(out, "doclen"))
        # doc-major transpose, a pass-through union like doclen — norms
        # are NOT snapshotted: they bake idf, which every batch moves,
        # so the streamed MLT recomputes them at query time (the same
        # stale-norms fallback the batch store uses between compactions)
        dt.write.mode("overwrite").parquet(os.path.join(out, "docterms"))
        chunks.write.mode("overwrite").partitionBy("letter").parquet(
            os.path.join(out, "chunks")
        )
        # stats from the WRITTEN doclen (reading it back avoids
        # re-executing the union plan a second time); the EXPLICIT
        # schema keeps a zero-row batch's empty directory readable —
        # schema inference over no part files raises, which would wedge
        # the stream on every replay of that batch
        stats = spark.read.schema(ARTIFACTS["doclen"]).parquet(
            os.path.join(out, "doclen")
        ).agg(
            F.lit(n_docs).cast("long").alias("n_docs"),
            F.coalesce(F.avg("dl"), F.lit(1.0)).alias("avgdl"),
        )
        stats.write.mode("overwrite").parquet(os.path.join(out, "stats"))
        eo.commit(store_dir, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def bm25_search_version(
    spark: SparkSession,
    store_dir: str,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k served from the latest committed streamed snapshot —
    the same frame-parameterized body as the stored-table path."""
    from ..operators.serving import bm25_from_frames

    v = read_serving_version(spark, store_dir)
    if v is None:
        raise FileNotFoundError(f"no committed serving version in {store_dir}")
    st = v["stats"].first()
    return bm25_from_frames(
        v["positions"],
        v["doclen"],
        int(st["n_docs"]),
        float(st["avgdl"]),
        query,
        k1=k1,
        b=b,
        k=k,
    )


def phrase_search_version(
    spark: SparkSession, store_dir: str, phrase: str
) -> DataFrame:
    """Exact-phrase match served from the latest committed snapshot."""
    from ..operators.serving import phrase_from_frames

    v = read_serving_version(spark, store_dir)
    if v is None:
        raise FileNotFoundError(f"no committed serving version in {store_dir}")
    return phrase_from_frames(v["positions"], phrase)


def mlt_search_version(
    spark: SparkSession, store_dir: str, doc_id: int, k: int = 10
) -> DataFrame:
    """More-like-this served from the latest committed streamed
    snapshot — the same frame-parameterized body as the stored-table
    path (serving.mlt_from_frames); norms recompute from the docterms
    snapshot at query time (idf moves every batch, so a norms snapshot
    would be stale the moment the next batch lands)."""
    from ..operators.serving import mlt_from_frames

    v = read_serving_version(spark, store_dir)
    if v is None:
        raise FileNotFoundError(f"no committed serving version in {store_dir}")
    return mlt_from_frames(
        v["docterms"],
        v["positions"],
        int(v["stats"].first()["n_docs"]),
        doc_id,
        k=k,
    )
