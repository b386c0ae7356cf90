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
    assert q.awaitTermination(180), "stream did not finish"

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
    assert q2.awaitTermination(180)
    assert sp.read_prepared(spark, out).count() == len(grows)


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
    assert q.awaitTermination(180)
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
    assert q2.awaitTermination(180)
    assert sp.read_prepared(spark, out).count() == n_rows
