"""Connected components over candidate-pair graphs, DataFrame-native.

The near-dup pipeline's one-pass keep rule (operators/dedup.py
near_dup_keep_list) drops a doc when any smaller-id doc matches it.
Cluster-level policies need the actual equivalence classes: "keep the
highest-quality member of each duplicate cluster" is the production
rule, and it requires connected components over the verified-pair
graph (cf. Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" — clusters, then one representative).

Spark has no built-in CC (GraphFrames is an external package), so this
implements hash-min label propagation with pointer jumping:

    comp(v) <- min(comp(v), min over neighbors u of comp(u))   (hop)
    comp(v) <- comp(comp(v))                                   (jump)

The jump step doubles the distance a label travels per round, so a
chain of length L converges in O(log L) rounds instead of O(L) — the
difference between 40 and 2^40 for the worst corpus. Each round is two
shuffle joins on node ids; the iterate-until-fixpoint driver loop holds
only a changed-row COUNT, never data. Lineage is truncated every round
with localCheckpoint — iterative self-joins otherwise stack an
unbounded plan that eventually overwhelms the optimizer.

The fixpoint test makes the result partitioning-independent and exactly
equal to the true components (min reachable node id), which the tests
prove against DuckDB's recursive-CTE reachability oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 40,
) -> DataFrame:
    """(node, comp): comp = min node id in the node's component.

    ``pairs`` is an undirected edge list (direction ignored, self-loops
    and duplicate edges tolerated). Only nodes appearing in some edge
    are returned; callers union in their singletons (see
    :func:`near_dup_clusters`). Raises if ``max_rounds`` is exhausted
    before the fixpoint — with pointer jumping that means a component
    chain longer than ~2^40 nodes, i.e. a bug, not a tuning problem.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    sym = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .union(sym.select(F.col("b").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=False)
    )

    for _ in range(max_rounds):
        # hop: pull the smallest neighbor label across each edge
        nbr = (
            sym.join(labels.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        hopped = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
        )
        # jump: comp <- comp(comp), doubling label reach per round
        parent = hopped.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp2")
        )
        jumped = (
            hopped.join(parent, "comp", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("comp2", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            jumped.join(
                labels.withColumnRenamed("comp", "old"), "node"
            )
            .where(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def near_dup_clusters(
    docs: DataFrame, threshold: float = 0.8, max_bucket: int | None = None
) -> DataFrame:
    """(doc_id, cluster_id): equivalence classes under "byte-identical
    OR verified Jaccard >= threshold", singletons included (their own
    cluster). The candidate graph reuses the exact same exact-dedup +
    LSH + verify stages as near_dup_keep_list, so the two policies are
    comparable on identical evidence.
    """
    from .dedup import (
        _canonical_docs,
        exact_dedup_groups,
        jaccard_verify,
        lsh_candidate_pairs,
        shingles,
    )

    # byte-duplicate edges: every member of an exact group to its keeper
    exact = exact_dedup_groups(docs)
    exact_edges = (
        docs.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash")
        )
        .join(exact, "text_hash")
        .where(F.col("doc_id") != F.col("keep_doc_id"))
        .select(
            F.col("keep_doc_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
    )

    canon = _canonical_docs(docs)
    verified = jaccard_verify(
        lsh_candidate_pairs(canon, max_bucket=max_bucket),
        shingles(canon, distinct=True),
    )
    near_edges = verified.where(
        F.col("jaccard").cast("double") >= F.lit(threshold)
    ).select("doc_a", "doc_b")

    comp = connected_components(exact_edges.union(near_edges))
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).alias("cluster_id"),
        )
    )


def cluster_representatives(
    clusters: DataFrame, scores: DataFrame, score_col: str = "quality_score"
) -> DataFrame:
    """(doc_id, cluster_id, keep): keep the best-scoring member of each
    cluster (ties -> smallest doc_id, so the choice is total and
    deterministic). ``scores`` is (doc_id, <score_col>); docs missing a
    score sort last but can still win a cluster of unscored docs.

    One max_by aggregation per cluster — no window, no sort: the
    shuffle moves (cluster_id, doc_id, score) triples only.
    """
    scored = clusters.join(scores.select("doc_id", score_col), "doc_id", "left")
    # max_by over a (score, -doc_id) struct: lexicographic struct
    # ordering gives score-desc with doc_id-asc tie-break
    rank = F.struct(
        F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf"))).alias(
            "s"
        ),
        (-F.col("doc_id")).alias("neg_id"),
    )
    best = scored.groupBy("cluster_id").agg(
        F.max_by("doc_id", rank).alias("keep_doc_id")
    )
    return clusters.join(best, "cluster_id").select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("keep_doc_id")).alias("keep"),
    )
