"""Streaming incremental index maintenance: the stream of document
batches must converge to exactly the batch-built chunked index, survive
restarts without recomputation, and prune old versions safely."""

from __future__ import annotations

import glob

from pyspark.sql import Window
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.index import (
    build_index,
    build_index_chunked,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table
from parallel_inverted_index_map_reduce_spark.streaming import index_stream as ixs

from .conftest import SF_ORACLE

CHUNK = 32


def _rows(df):
    return sorted(
        (r.letter, r.word, r.chunk_id, r.df, tuple(r.postings))
        for r in df.collect()
    )


def test_index_stream_crash_before_marker_recovers(spark, tmp_path, monkeypatch):
    """Crash injected between the version write and its commit marker:
    readers keep serving the previous committed version (the partial
    one is invisible), and a restart from the SAME checkpoint — the
    protocol's only supported resume — redelivers the failed batch,
    overwrites its own partial directory, and converges."""
    from parallel_inverted_index_map_reduce_spark.streaming import sinks as eo_mod

    docs = load_table(spark, SF_ORACLE, "documents")
    src = str(tmp_path / "docs_in")
    docs.repartition(2).write.parquet(src)
    index_dir = str(tmp_path / "index_versions")
    ckpt = str(tmp_path / "ckpt")

    real_commit = eo_mod.commit
    state = {"crashed": False}

    def commit_once_crashing(path, batch_id):
        if batch_id == 1 and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash before commit marker")
        real_commit(path, batch_id)

    monkeypatch.setattr(eo_mod, "commit", commit_once_crashing)

    def _stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = ixs.start_incremental_index(_stream(), index_dir, ckpt, chunk_size=CHUNK)
    try:
        q.awaitTermination(420)
    except Exception:
        pass  # the injected crash fails the query mid-stream
    assert state["crashed"]

    # only batch 0 committed; its version is a complete index of batch 0
    dirs = ixs.eo.committed_batch_dirs(index_dir)
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["0"]
    assert ixs.read_index_version(spark, index_dir) is not None

    # same-checkpoint restart: offsets never advanced past the failed
    # batch, so it redelivers, overwrites its partial dir, and commits
    q2 = ixs.start_incremental_index(_stream(), index_dir, ckpt, chunk_size=CHUNK)
    assert q2.awaitTermination(420)
    final = ixs.read_index_version(spark, index_dir)
    want = build_index_chunked(docs, chunk_size=CHUNK)
    assert _rows(final) == _rows(want)


def test_streamed_index_converges_to_batch_build(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents")
    src = str(tmp_path / "docs_in")
    # three input files -> three micro-batches (maxFilesPerTrigger=1)
    docs.repartition(3).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 3

    index_dir = str(tmp_path / "index_versions")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ixs.start_incremental_index(stream, index_dir, ckpt, chunk_size=CHUNK)
    assert q.awaitTermination(420), "stream did not finish"

    versions = ixs.eo.committed_batch_dirs(index_dir)
    assert len(versions) == 3  # one committed version per micro-batch

    final = ixs.read_index_version(spark, index_dir)
    want = build_index_chunked(docs, chunk_size=CHUNK)
    assert _rows(final) == _rows(want)

    # restart with the same checkpoint: no new files -> no new versions
    q2 = ixs.start_incremental_index(
        (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        ),
        index_dir,
        ckpt,
        chunk_size=CHUNK,
    )
    assert q2.awaitTermination(420)
    assert len(ixs.eo.committed_batch_dirs(index_dir)) == 3

    # under the delta protocol every delta the latest manifest lists is
    # LIVE: pruning alone must refuse to remove them
    assert ixs.prune_index_versions(index_dir, keep=1) == 0
    assert len(ixs.eo.committed_batch_dirs(index_dir)) == 3
    assert _rows(ixs.read_index_version(spark, index_dir)) == _rows(want)

    # compact (content-equal rewrite, atomic manifest repoint), THEN
    # prune frees the superseded per-batch deltas; the surviving
    # version is still complete
    assert ixs.compact_index_store(spark, index_dir) == 2
    assert _rows(ixs.read_index_version(spark, index_dir)) == _rows(want)
    removed = ixs.prune_index_versions(index_dir, keep=1)
    assert removed == 2
    assert len(ixs.eo.committed_batch_dirs(index_dir)) == 1
    assert _rows(ixs.read_index_version(spark, index_dir)) == _rows(want)
    # protocol invariant after pruning: no marker without its data dir
    # (a marker-only state would make is_committed lie to the replay
    # guard and silently drop a redelivered batch)
    import glob as _glob
    import os as _os

    markers = {
        m.rsplit("_", 1)[1]
        for m in _glob.glob(_os.path.join(index_dir, "_committed_*"))
    }
    data = {
        d.rsplit("=", 1)[1]
        for d in _glob.glob(_os.path.join(index_dir, "batch_id=*"))
    }
    assert markers <= data, (markers, data)

    # and the streamed artifact serves the same queries as the plain
    # batch index (spot-check via the df ranking source of truth)
    top_words = {
        r.word
        for r in build_index(docs).where(F.col("rank") <= 3).collect()
    }
    streamed_top = {
        r.word
        for r in ixs.read_index_version(spark, index_dir)
        .select("word", "df", "letter")
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("letter").orderBy(F.desc("df"), F.asc("word"))
            ),
        )
        .where(F.col("rank") <= 3)
        .collect()
    }
    assert streamed_top == top_words


def test_session_store_key_tracks_input_content(spark, tmp_path):
    """The session-memoized stream stores key on (path, CONTENT
    fingerprint) — regenerating the input table at the SAME path within
    one session must trigger a rebuild, never serve the stale snapshot;
    unchanged content must still hit the memo."""
    from parallel_inverted_index_map_reduce_spark.plans.queries_index import (
        _streamed_index_store,
    )

    path = str(tmp_path / "docs.parquet")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows = [
        (0, "spark query engine", "en", "t", 18),
        (1, "hash join probe side", "en", "t", 20),
        (2, "sort merge join build", "en", "t", 21),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    s1 = _streamed_index_store(spark, path, spark.read.parquet(path))
    # unchanged content -> memo hit (no second stream build)
    assert _streamed_index_store(spark, path, spark.read.parquet(path)) == s1
    # regenerated AT THE SAME PATH with different content -> rebuild
    rows2 = rows + [(3, "bloom filter pushdown", "en", "t", 21)]
    spark.createDataFrame(rows2, schema).write.mode("overwrite").parquet(path)
    s2 = _streamed_index_store(spark, path, spark.read.parquet(path))
    assert s2 != s1
