"""Incremental prep stream equals the batch pipeline on bounded data,
and a checkpointed restart lands nothing twice."""

from __future__ import annotations

from parallel_inverted_index_map_reduce_spark import pipeline as bp
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table
from parallel_inverted_index_map_reduce_spark.streaming import pipeline as sp

from .conftest import SF_ORACLE


def test_incremental_prep_matches_batch_and_is_idempotent(spark, tmp_path):
    out, ckpt = str(tmp_path / "prep"), str(tmp_path / "ckpt")

    q = sp.start_incremental_prep(
        sp.read_documents_stream(spark, SF_ORACLE), out, ckpt
    )
    assert q.awaitTermination(420), "stream did not finish"

    got = sp.read_prepared(spark, out).drop("batch_id")
    want = bp.prepare_training_data(load_table(spark, SF_ORACLE, "documents"))
    # packing bin ids depend on partitioning; compare the chunk surface
    cols = ["doc_id", "chunk_id", "n_tokens", "chunk"]
    grows = sorted(map(tuple, got.select(*cols).collect()))
    wrows = sorted(map(tuple, want.select(*cols).collect()))
    assert grows == wrows

    # restart with the same checkpoint: nothing new, nothing doubled
    q2 = sp.start_incremental_prep(
        sp.read_documents_stream(spark, SF_ORACLE), out, ckpt
    )
    assert q2.awaitTermination(420)
    assert sp.read_prepared(spark, out).count() == len(grows)


def test_cross_batch_near_dup_suppressed_via_signature_store(spark, tmp_path):
    """A later batch's NEAR duplicate of an already-landed document is
    dropped against the persistent MinHash signature store; distinct
    documents in the same batch land normally."""
    from parallel_inverted_index_map_reduce_spark.operators import dedup as dd

    base = " ".join(f"w{i}" for i in range(200))
    near = " ".join(f"w{i}" for i in range(199)) + " CHANGED"
    other = " ".join(f"x{i} y{i}" for i in range(60))

    # the estimator must actually fire for this pair — sanity-check the
    # data property the test depends on, so a hashing change fails loud
    two = spark.createDataFrame([(1, base), (2, near)], ["doc_id", "text"])
    sigs = dd.minhash_table(two)
    est = dd.minhash_estimate(
        sigs.where("doc_id = 2"),
        sigs.where("doc_id = 1"),
        spark.createDataFrame([(2, 1)], ["doc_id", "landed_id"]),
    ).first()
    assert est.est_jaccard >= 0.8, est

    src = str(tmp_path / "in")
    spark.createDataFrame([(1, base)], ["doc_id", "text"]).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(2, near), (3, other)], ["doc_id", "text"]
    ).coalesce(1).write.mode("append").parquet(src)

    out, ckpt = str(tmp_path / "prep"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sp.start_incremental_prep(stream, out, ckpt, min_quality=0.0)
    assert q.awaitTermination(420)

    # the input really split into two micro-batches — otherwise the
    # within-batch dedup could mask the cross-batch mechanism under test
    dirs = sp.eo.committed_batch_dirs(out)
    assert len(dirs) == 2, dirs
    batch0_ids = {
        r.doc_id
        for r in spark.read.parquet(dirs[0]).select("doc_id").distinct().collect()
    }
    assert batch0_ids == {1}  # doc 1 landed alone before docs 2/3 arrived

    landed = {
        r.doc_id for r in sp.read_prepared(spark, out).select("doc_id").distinct().collect()
    }
    assert landed == {1, 3}  # near-dup doc 2 suppressed, doc 3 kept

    # the signature store carries exactly the landed docs' signatures
    store = sp._landed_signatures(spark, out)
    assert {r.doc_id for r in store.select("doc_id").collect()} == {1, 3}


def test_crash_between_write_and_marker_recovers(spark, tmp_path):
    """The reviewed failure mode: a batch that wrote data but died
    before its commit marker. Readers must not see the partial
    directory, and the replay must re-process the full input (not
    anti-join against its own partial output and land empty)."""
    out, ckpt = str(tmp_path / "prep"), str(tmp_path / "ckpt")

    # simulate the crash: run once, then delete the marker but keep the
    # data directory — the on-disk state a mid-write crash leaves
    q = sp.start_incremental_prep(
        sp.read_documents_stream(spark, SF_ORACLE), out, ckpt
    )
    assert q.awaitTermination(420)
    full = sp.read_prepared(spark, out)
    n_rows = full.count()
    assert n_rows > 0
    import os

    os.remove(os.path.join(out, "_committed_0"))

    # uncommitted directory is invisible to readers
    try:
        sp.read_prepared(spark, out)
        assert False, "reader must refuse uncommitted-only output"
    except FileNotFoundError:
        pass

    # replay with a FRESH checkpoint redelivers batch 0; it must land
    # the full result again, not an empty batch
    q2 = sp.start_incremental_prep(
        sp.read_documents_stream(spark, SF_ORACLE), out, str(tmp_path / "ckpt2")
    )
    assert q2.awaitTermination(420)
    assert sp.read_prepared(spark, out).count() == n_rows

def test_empty_batch_commits_and_later_batches_land(spark, tmp_path):
    """A batch whose EVERY document is suppressed (exact dup of an
    already-landed doc) must still commit — data-less directory, marker
    present — and must not wedge the stream: the read-back uses an
    explicit schema (no inference over zero files) and later batches'
    landed-id anti-join skips marker-only directories."""
    text_a = " ".join(f"w{i}" for i in range(120))
    text_c = " ".join(f"z{i} q{i}" for i in range(60))

    src = str(tmp_path / "in")
    spark.createDataFrame([(1, text_a)], ["doc_id", "text"]).coalesce(
        1
    ).write.parquet(src)
    # exact duplicate of doc 1 -> the whole batch suppresses to zero rows
    spark.createDataFrame([(2, text_a)], ["doc_id", "text"]).coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame([(3, text_c)], ["doc_id", "text"]).coalesce(
        1
    ).write.mode("append").parquet(src)

    out, ckpt = str(tmp_path / "prep"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sp.start_incremental_prep(stream, out, ckpt, min_quality=0.0)
    assert q.awaitTermination(420), "stream did not finish"

    dirs = sp.eo.committed_batch_dirs(out)
    assert len(dirs) == 3, dirs  # the empty batch IS committed

    # doc 2's batch committed zero rows (whether Spark wrote an empty
    # part file or none at all is a partitioning detail — the guards in
    # _landed_doc_ids / the schema'd read-back cover the no-file case)
    assert spark.read.parquet(dirs[1]).count() == 0

    landed = {
        r.doc_id
        for r in sp.read_prepared(spark, out).select("doc_id").distinct().collect()
    }
    assert landed == {1, 3}  # dup suppressed, later doc still lands
