"""Similarity-search query specs over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity as sim
from ..sources.tables import load_table
from .registry import register

# Exploded components with 0-based index; float -> double per component.
COMP_CTE = """
comp AS (
    SELECT vec_id,
           unnest(range(0, len(embedding))) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
nrm AS (
    SELECT vec_id, SUM(CAST(round(x * x, 7) AS DECIMAL(30,9))) AS norm_sq
    FROM comp GROUP BY vec_id
)
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@register(
    "embedding_near_dups",
    oracle="WITH "
    + COMP_CTE
    + """,
dots AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           SUM(CAST(round(a.x * b.x, 7) AS DECIMAL(30,9))) AS dot
    FROM comp a JOIN comp b ON a.i = b.i AND a.vec_id < b.vec_id
    GROUP BY 1, 2
)
SELECT vec_a, vec_b,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.norm_sq AS DOUBLE)) * sqrt(CAST(nb.norm_sq AS DOUBLE))),
             6) AS cosine
FROM dots
JOIN nrm na ON na.vec_id = vec_a
JOIN nrm nb ON nb.vec_id = vec_b
WHERE round(CAST(dot AS DOUBLE)
            / (sqrt(CAST(na.norm_sq AS DOUBLE)) * sqrt(CAST(nb.norm_sq AS DOUBLE))),
            6) >= 0.35
""",
    tags=("similarity", "dedup"),
    doc="Embedding-cosine near-duplicate pairs (cosine >= 0.35), exact "
    "decimal dot products for cross-engine determinism.",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    cos = sim.pairwise_cosine(_emb(spark, sf_dir))
    return cos.where(
        (F.col("vec_a") < F.col("vec_b")) & (F.col("cosine") >= 0.35)
    )


@register(
    "ann_topk",
    oracle="WITH "
    + COMP_CTE
    + """,
dots AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           SUM(CAST(round(a.x * b.x, 7) AS DECIMAL(30,9))) AS dot
    FROM comp a JOIN comp b ON a.i = b.i AND a.vec_id <> b.vec_id
    WHERE a.vec_id < 5
    GROUP BY 1, 2
),
cos AS (
    SELECT vec_a, vec_b,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.norm_sq AS DOUBLE)) * sqrt(CAST(nb.norm_sq AS DOUBLE))),
                 6) AS cosine
    FROM dots
    JOIN nrm na ON na.vec_id = vec_a
    JOIN nrm nb ON nb.vec_id = vec_b
)
SELECT vec_a, vec_b, cosine,
       row_number() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b) AS "rank"
FROM cos
QUALIFY "rank" <= 3
""",
    tags=("similarity",),
    doc="Brute-force exact cosine top-3 neighbors for 5 query vectors.",
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.ann_topk(_emb(spark, sf_dir), k=3, n_queries=5)


@register(
    "ann_topk_fast",
    oracle=None,  # double fold order differs from the decimal oracle path;
    # correctness asserted in tests against ann_topk instead.
    tags=("similarity", "bench"),
    bench=True,
    doc="JVM array-fold cosine top-k (zip_with + aggregate, broadcast "
    "queries) — the scale path; validated against ann_topk in tests.",
)
def q_ann_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.ann_topk_fast(_emb(spark, sf_dir), k=3, n_queries=5)


@register(
    "lsh_bucket_neighbors",
    oracle=None,  # bucket-local ranking is not naturally SQL-oracled;
    # recall vs brute force asserted in tests.
    tags=("similarity", "lsh"),
    doc="Random-hyperplane LSH bucketed neighbors — the 100 TB ANN path "
    "(bucket-local joins instead of full cross product).",
)
def q_lsh_bucket_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.lsh_bucketed_neighbors(_emb(spark, sf_dir), n_planes=8, k=3)
