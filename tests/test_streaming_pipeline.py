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
