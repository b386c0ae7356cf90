"""Connected components (operators/components.py): hand graphs, a
randomized equivalence proof against DuckDB's recursive-CTE
reachability oracle, and the cluster-level dedup policies built on it."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.components import (
    cluster_representatives,
    connected_components,
    near_dup_clusters,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["comp"] for r in connected_components(df).collect()
    }


def _oracle_cc(edges):
    """min-reachable-id per node via DuckDB recursive CTE."""
    conn = duckdb.connect()
    conn.execute("CREATE TABLE e(a BIGINT, b BIGINT)")
    conn.executemany("INSERT INTO e VALUES (?, ?)", edges)
    rows = conn.execute(
        """
        WITH RECURSIVE sym AS (
            SELECT a, b FROM e UNION SELECT b, a FROM e
        ), r(node, comp) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.b, r.comp FROM r JOIN sym s ON s.a = r.node
        )
        SELECT node, min(comp) FROM r GROUP BY node
        """
    ).fetchall()
    return dict(rows)


def test_chain_star_cycle_disjoint(spark):
    edges = [
        (1, 2), (2, 3), (3, 4),          # chain -> comp 1
        (10, 11), (10, 12), (10, 13),    # star  -> comp 10
        (20, 21), (21, 22), (22, 20),    # cycle -> comp 20
        (30, 30),                        # self-loop only: dropped, node absent
        (40, 41), (41, 40),              # duplicate/reversed edges
    ]
    got = _cc(spark, edges)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20, 22: 20,
        40: 40, 41: 40,
    }


def test_long_chain_converges_in_log_rounds(spark):
    # 64-node chain: plain hop-propagation needs 63 rounds; with pointer
    # jumping the budget of 10 is ample (2^10 >> 64) — failure to
    # converge raises
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    comp = connected_components(df, max_rounds=10)
    assert comp.where(F.col("comp") != 0).count() == 0
    assert comp.count() == 65


def test_matches_recursive_oracle_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc(spark, edges) == _oracle_cc(edges)


def test_partitioning_invariance(spark):
    edges = [(i % 17, (i * 7) % 17) for i in range(40) if i % 17 != (i * 7) % 17]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    a = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    b = {
        r["node"]: r["comp"]
        for r in connected_components(df.repartition(13)).collect()
    }
    assert a == b


def test_near_dup_clusters_on_corpus(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    clusters = near_dup_clusters(docs, threshold=0.8).cache()
    # total: every doc exactly once
    assert clusters.count() == docs.count()
    assert clusters.select("doc_id").distinct().count() == docs.count()
    # cluster ids are member ids, specifically each cluster's minimum
    bad = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("lo")).where(
        F.col("cluster_id") != F.col("lo")
    )
    assert bad.count() == 0
    # byte-identical docs always share a cluster
    same_text = (
        docs.alias("x")
        .join(docs.alias("y"), F.col("x.text") == F.col("y.text"))
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_id"),
            F.col("y.doc_id").alias("other"),
        )
    )
    joined = (
        same_text.join(clusters, "doc_id")
        .join(
            clusters.select(
                F.col("doc_id").alias("other"),
                F.col("cluster_id").alias("other_cluster"),
            ),
            "other",
        )
        .where(F.col("cluster_id") != F.col("other_cluster"))
    )
    assert joined.count() == 0
    clusters.unpersist()


def test_cluster_representatives_pick_best_scored(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (9, None), (10, None)],
        "doc_id long, quality_score double",
    )
    kept = {
        r["doc_id"]: r["keep"]
        for r in cluster_representatives(clusters, scores).collect()
    }
    # cluster 1: 2 and 3 tie on score -> smaller id wins
    # cluster 7: singleton keeps itself
    # cluster 9: all unscored -> smallest id wins
    assert kept == {1: False, 2: True, 3: False, 7: True, 9: True, 10: False}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_rounds=0)
