"""Streamed ANN-layout maintenance: the stream of embedding batches
must converge to a snapshot whose answers equal the in-session IVF over
the full corpus with the stream's own (first-batch-fitted) centroids,
and survive a crash injected before the commit marker."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.similarity import ivf_topk
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table
from parallel_inverted_index_map_reduce_spark.streaming import ann_stream as avs

from .conftest import SF_ORACLE

N_LIST, NPROBE, K, NQ = 4, 2, 3, 5


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _emb(spark):
    return load_table(spark, SF_ORACLE, "embeddings")


def test_streamed_ann_converges_and_serves(spark, tmp_path):
    emb = _emb(spark)
    src = str(tmp_path / "emb_in")
    # one file per micro-batch; whichever batch arrives first seeds the
    # quantizer (the test compares against the stream's OWN centroids,
    # so it does not depend on arrival order)
    emb.repartition(3).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 3

    store = str(tmp_path / "ann_versions")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = avs.start_incremental_ann(
        stream, store, ckpt, n_list=N_LIST, n_iters=1
    )
    assert q.awaitTermination(420), "stream did not finish"
    assert len(avs.eo.committed_batch_dirs(store)) >= 2

    v = avs.read_ann_version(spark, store)
    assert v["vectors"].count() == emb.count()
    queries = emb.where(F.col("vec_id") < NQ)
    got = avs.ann_search_version(spark, store, queries, k=K, nprobe=NPROBE)
    want = ivf_topk(
        emb,
        k=K,
        n_queries=NQ,
        nprobe=NPROBE,
        centroids=avs._version_centroids(v),
    )
    assert _rows(got) == _rows(want) and _rows(got)

    # snapshot vectors keep the list_id partitioning -> pruned probes
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert (
        "PartitionFilters" in plan
        and "list_id" in plan.split("PartitionFilters")[1][:200]
    )


def test_streamed_ann_crash_before_marker_recovers(spark, tmp_path, monkeypatch):
    from parallel_inverted_index_map_reduce_spark.streaming import sinks as eo_mod

    emb = _emb(spark)
    src = str(tmp_path / "emb_in")
    emb.repartition(2).write.parquet(src)
    store = str(tmp_path / "ann_versions")
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
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = avs.start_incremental_ann(_stream(), store, ckpt, n_list=N_LIST, n_iters=1)
    try:
        q.awaitTermination(420)
    except Exception:
        pass
    assert state["crashed"]
    # only batch 0 committed; it still serves (complete-or-invisible)
    assert [
        d.rsplit("=", 1)[1] for d in avs.eo.committed_batch_dirs(store)
    ] == ["0"]
    assert avs.read_ann_version(spark, store) is not None

    # same-checkpoint restart redelivers the failed batch and converges
    q2 = avs.start_incremental_ann(_stream(), store, ckpt, n_list=N_LIST, n_iters=1)
    assert q2.awaitTermination(420)
    v = avs.read_ann_version(spark, store)
    assert v["vectors"].count() == emb.count()
    queries = emb.where(F.col("vec_id") < NQ)
    got = avs.ann_search_version(spark, store, queries, k=K, nprobe=N_LIST)
    want = ivf_topk(
        emb,
        k=K,
        n_queries=NQ,
        nprobe=N_LIST,
        centroids=avs._version_centroids(v),
    )
    assert _rows(got) == _rows(want) and _rows(got)
