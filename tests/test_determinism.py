"""Determinism under parallelism: the reference checker runs every M×R
thread-count combination and requires byte-identical output
(/root/reference/checker/checker.sh:141-144). The Spark analog of
"different thread counts" is different shuffle-partition counts — every
result below must be invariant to them, or a 1000-executor run would
not reproduce a 4-executor run.
"""

from __future__ import annotations

import pytest

from parallel_inverted_index_map_reduce_spark.plans.registry import all_specs

from .conftest import SF_ORACLE

# Spark analog of the checker's M×R matrix.
PARTITION_COUNTS = (2, 7, 32)

# Order-sensitive or shuffle-heavy representatives of each family: the
# full index pipeline (groupBy + window + formatting), position-weighted
# fingerprints, MinHash banding (multi-stage shuffles), a decimal
# aggregate (partition-order-independent summation claim), and the
# labeled ANN entry — whose IVF part claims an RNG-free,
# partition-order-independent k-means fit (decimal means, stable seeds)
# and whose knn part claims deterministic vote tie-breaks; BM25's
# decimal score sum + top-k cut (order-independence is the whole claim);
# and the connected-components clustering (iterative label propagation
# must converge to the same fixpoint on any partitioning).
CASES = (
    "index_lines",
    "doc_fingerprints",
    "minhash_lsh_pairs",
    "pricing_summary",
    "ann_topk",
    "ranked_retrieval",
    "dedup_clusters",
)


def _rows(spark, name):
    df = all_specs()[name].fn(spark, SF_ORACLE)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in PARTITION_COUNTS:
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            results.append(_rows(spark, name))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    first = results[0]
    for n, got in zip(PARTITION_COUNTS[1:], results[1:]):
        assert got == first, f"{name}: output changed at shuffle.partitions={n}"


def test_tuned_shuffle_is_reference_counted(spark):
    """Concurrent store builds overlap tuned_shuffle blocks: the FIRST
    exit must NOT restore the session default mid-flight of another
    active block; the LAST exit restores the original value."""
    from parallel_inverted_index_map_reduce_spark.plans import stores

    key = "spark.sql.shuffle.partitions"
    original = spark.conf.get(key)
    try:
        spark.conf.set(key, "200")
        with stores.tuned_shuffle(spark, 8):
            assert spark.conf.get(key) == "8"
            with stores.tuned_shuffle(spark, 4):
                assert spark.conf.get(key) == "4"
            # inner exit: an outer block is still active -> no restore
            assert spark.conf.get(key) == "4"
        assert spark.conf.get(key) == "200"
    finally:
        spark.conf.set(key, original)
