"""The delta-versioned streaming store protocol (streaming/deltas.py):
composition modes, compaction's content-equal atomic repoint, pruning's
reference rule, and — the property the round-11 rewrite exists for —
that a stream CONTINUED after compaction inherits the compacted
composition instead of the superseded per-batch deltas."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.sources.tables import load_table
from parallel_inverted_index_map_reduce_spark.streaming import ann_stream as avs
from parallel_inverted_index_map_reduce_spark.streaming import deltas as dv
from parallel_inverted_index_map_reduce_spark.streaming import serving_stream as svs

from .conftest import SF_ORACLE


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_compose_lww_last_listed_delta_wins(spark):
    a = spark.createDataFrame(
        [("w1", 1, [1]), ("w2", 0, [2])], "word string, c int, p array<int>"
    )
    b = spark.createDataFrame(
        [("w2", 0, [2, 3]), ("w3", 0, [4])], "word string, c int, p array<int>"
    )
    got = _rows(dv.compose([a, b], "lww", "word"))
    assert got == [("w1", 1, [1]), ("w2", 0, [2, 3]), ("w3", 0, [4])]
    # and list order is the tie-break: reversed lists resolve to a
    assert ("w2", 0, [2]) in _rows(dv.compose([b, a], "lww", "word"))


def test_ann_delta_writes_are_per_batch_and_compaction_is_content_equal(
    spark, tmp_path
):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    src = str(tmp_path / "emb_in")
    emb.repartition(3).write.parquet(src)
    store = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")
    q = avs.start_incremental_ann(
        (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        ),
        store,
        ckpt,
        n_list=4,
        n_iters=1,
    )
    assert q.awaitTermination(420)

    # DELTA property: per-batch vector rows sum to the corpus — no
    # batch rewrote the store (the O(store)-per-increment shape this
    # protocol replaces)
    per_batch = [
        spark.read.parquet(os.path.join(d, "vectors")).count()
        for d in sorted(glob.glob(os.path.join(store, "batch_id=*")))
    ]
    assert sum(per_batch) == emb.count()
    assert all(n < emb.count() for n in per_batch)

    v = avs.read_ann_version(spark, store)
    before = _rows(v["vectors"].select("vec_id", "list_id"))
    queries = emb.where(F.col("vec_id") < 5)
    ans_before = _rows(avs.ann_search_version(spark, store, queries, k=3))

    version = avs.compact_ann_store(spark, store)
    man = dv.read_manifest(os.path.join(store, f"batch_id={version}"))
    assert man["artifacts"]["vectors"]["deltas"] == [
        f"compact={version}/vectors"
    ]
    v2 = avs.read_ann_version(spark, store)
    assert _rows(v2["vectors"].select("vec_id", "list_id")) == before
    assert _rows(avs.ann_search_version(spark, store, queries, k=3)) == (
        ans_before
    )

    # pruning frees every superseded per-batch delta; the version dir
    # itself survives (manifest + version-local centroids)
    removed = dv.prune_versions(store, keep=1)
    assert removed == version  # batches 0..version-1
    assert _rows(avs.read_ann_version(spark, store)["vectors"].select(
        "vec_id", "list_id"
    )) == before


def test_stream_continued_after_compaction_inherits_compact(spark, tmp_path):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    first, second = (
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
    )
    src = str(tmp_path / "emb_in")
    store = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        q = avs.start_incremental_ann(
            (
                spark.readStream.schema(
                    "vec_id bigint, embedding array<float>"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            ),
            store,
            ckpt,
            n_list=4,
            n_iters=1,
        )
        assert q.awaitTermination(420)

    first.repartition(2).write.mode("append").parquet(src)
    _run()
    cv = avs.compact_ann_store(spark, store)
    dv.prune_versions(store, keep=1)
    second.repartition(1).write.mode("append").parquet(src)
    _run()

    latest = dv.latest_committed_dir(store)
    man = dv.read_manifest(latest)
    deltas = man["artifacts"]["vectors"]["deltas"]
    # the new version references the compact plus ONLY its own delta(s)
    assert deltas[0] == f"compact={cv}/vectors"
    assert all(d.startswith("batch_id=") for d in deltas[1:])
    v = avs.read_ann_version(spark, store)
    assert v["vectors"].count() == emb.count()
    # and still answers under the stream's own fixed centroids
    queries = emb.where(F.col("vec_id") < 5)
    assert _rows(
        avs.ann_search_version(spark, store, queries, k=3, nprobe=4)
    )


def test_serving_compaction_preserves_queries_and_stats(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents").where(
        F.col("doc_id") < 120
    )
    src = str(tmp_path / "docs_in")
    docs.repartition(3).write.parquet(src)
    store = str(tmp_path / "serv")
    ckpt = str(tmp_path / "ckpt")
    q = svs.start_incremental_serving(
        (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        ),
        store,
        ckpt,
        chunk_size=32,
    )
    assert q.awaitTermination(420)

    v = svs.read_serving_version(spark, store)
    st = v["stats"].first()
    # the incremental counters reproduce AVG over the composed doclen
    # and the corpus count exactly
    assert st["n_docs"] == docs.count()
    want_avg = v["doclen"].agg(F.avg("dl")).first()[0]
    assert st["avgdl"] == want_avg
    bm25_before = _rows(svs.bm25_search_version(spark, store, "the world"))
    phrase_before = _rows(
        svs.phrase_search_version(spark, store, "of the")
    )

    version = svs.compact_serving_store(spark, store)
    man = dv.read_manifest(os.path.join(store, f"batch_id={version}"))
    for a in ("positions", "doclen", "docterms", "chunks"):
        assert man["artifacts"][a]["deltas"] == [f"compact={version}/{a}"]
    # stats stays version-local (O(1), never chained)
    assert man["artifacts"]["stats"]["deltas"] == [
        f"batch_id={version}/stats"
    ]
    assert dv.prune_versions(store, keep=1) == version
    assert _rows(
        svs.bm25_search_version(spark, store, "the world")
    ) == bm25_before
    assert _rows(
        svs.phrase_search_version(spark, store, "of the")
    ) == phrase_before


def test_manifest_is_json_and_invisible_to_parquet_reads(spark, tmp_path):
    """The manifest lands atomically as an underscore file, so Spark's
    parquet listing ignores it inside a delta directory."""
    d = str(tmp_path / "v")
    dv.write_manifest(d, 7, {"x": {"mode": "append", "deltas": ["a"]}})
    with open(os.path.join(d, "_MANIFEST.json")) as f:
        man = json.load(f)
    assert man["version"] == 7 and man["artifacts"]["x"]["deltas"] == ["a"]
    spark.createDataFrame([(1,)], "i int").write.mode("overwrite").parquet(d)
    # overwrite dropped the manifest with the dir (the replay contract);
    # rewrite and confirm the parquet read still sees only data rows
    dv.write_manifest(d, 7, {"x": {"mode": "append", "deltas": ["a"]}})
    assert spark.read.parquet(d).count() == 1
