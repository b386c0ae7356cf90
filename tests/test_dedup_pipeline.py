"""End-to-end near-dup keep-list: invariants of the one-pass policy."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import dedup as dd
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE

THRESHOLD = 0.5  # low enough that the fixture actually has near-dups


def test_keep_list_invariants(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    kl = dd.near_dup_keep_list(docs, threshold=THRESHOLD).cache()

    # total partition: every doc appears exactly once
    assert kl.count() == docs.count()
    assert kl.select("doc_id").distinct().count() == docs.count()

    kept = kl.where("keep").select("doc_id")
    n_kept, n_total = kept.count(), docs.count()
    assert 0 < n_kept <= n_total

    # no two KEPT docs share identical text
    kept_docs = docs.join(kept, "doc_id", "left_semi")
    n_texts = kept_docs.select("text").distinct().count()
    assert n_texts == n_kept

    # no verified near-dup pair survives with both sides kept
    pairs = dd.jaccard_verify(
        dd.lsh_candidate_pairs(kept_docs),
        dd.shingles(kept_docs, distinct=True),
    ).where(F.col("jaccard").cast("double") >= THRESHOLD)
    assert pairs.count() == 0

    # the fixture must actually exercise the drop path
    assert kl.where(~F.col("keep")).count() > 0


def test_lsh_banding_tuner_properties():
    """The S-curve and its tuner: monotone collision probability,
    correct limits, sensible (b, r) movement with the threshold, and
    the engine's own default justified."""
    from parallel_inverted_index_map_reduce_spark.functions.hashing import (
        LSH_BANDS,
        LSH_ROWS,
        NUM_PERM,
    )
    from parallel_inverted_index_map_reduce_spark.operators.dedup import (
        lsh_banding,
        lsh_collision_probability,
    )

    # monotone in s; limits pinned
    probs = [lsh_collision_probability(s / 20, 4, 4) for s in range(21)]
    assert probs == sorted(probs)
    assert probs[0] == 0.0 and abs(probs[-1] - 1.0) < 1e-12

    # valid factorization for every threshold; rows grow with threshold
    # (sharper, later curve for stricter thresholds)
    picks = {t: lsh_banding(16, t) for t in (0.2, 0.5, 0.8)}
    for b, r in picks.values():
        assert b * r == 16
    assert picks[0.2][1] <= picks[0.5][1] <= picks[0.8][1]
    assert picks[0.2][1] < picks[0.8][1]

    # the engine's shipped banding is the recall-biased pick at 0.5
    assert lsh_banding(NUM_PERM, 0.5, beta=4) == (LSH_BANDS, LSH_ROWS)
