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

# Hyperplane sign-LSH buckets (mirrors operators/similarity.py
# hyperplane_buckets exactly: +-1 weights from md5(p || '_' || i),
# decimal projection sums so the sign is order-independent).
_N_PLANES_NEAR_DUPS = 4

BUCKETS_CTE = f"""
proj AS (
    SELECT c.vec_id, p.p,
           SUM(CAST(round(c.x * (CASE WHEN
                CAST('0x' || substr(md5(CAST(p.p AS VARCHAR) || '_' ||
                     CAST(c.i AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                THEN 1.0 ELSE -1.0 END), 7) AS DECIMAL(30,9))) AS s
    FROM comp c, unnest(range(0, {_N_PLANES_NEAR_DUPS})) AS p(p)
    GROUP BY 1, 2
),
buckets AS (
    SELECT vec_id,
           string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                      ORDER BY p) AS bucket
    FROM proj GROUP BY vec_id
)
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@register(
    "embedding_near_dups",
    oracle="WITH "
    + COMP_CTE
    + ","
    + BUCKETS_CTE
    + """,
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
dots AS (
    SELECT p.vec_a, p.vec_b,
           SUM(CAST(round(ca.x * cb.x, 7) AS DECIMAL(30,9))) AS dot
    FROM pairs p
    JOIN comp ca ON ca.vec_id = p.vec_a
    JOIN comp cb ON cb.vec_id = p.vec_b AND cb.i = ca.i
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
    doc="Embedding-cosine near-duplicate pairs (cosine >= 0.35) through "
    "hyperplane sign-LSH buckets: the pair join is an equi-join on the "
    "4-bit bucket string — never a cross product — and the exact "
    "decimal cosine runs on in-bucket candidates only. The oracle "
    "reproduces bucket assignment and verification bit-for-bit.",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.bucketed_near_dups(
        _emb(spark, sf_dir), n_planes=_N_PLANES_NEAR_DUPS, threshold=0.35
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
SELECT vec_a, vec_b,
       row_number() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b) AS "rank"
FROM cos
QUALIFY "rank" <= 3
""",
    tags=("similarity", "bench"),
    bench=True,
    doc="JVM array-fold cosine top-k (zip_with + aggregate, broadcast "
    "queries) — the scale path. The oracle is the exact decimal "
    "formulation: matching (vec_a, vec_b, rank) proves the fast double "
    "fold selects and orders the same neighbors (cosine values "
    "themselves are excluded — the two summation orders differ in the "
    "last ulp by design; the tests assert value agreement to 1e-5).",
)
def q_ann_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.ann_topk_fast(_emb(spark, sf_dir), k=3, n_queries=5).select(
        "vec_a", "vec_b", "rank"
    )


# lsh_bucket_neighbors no longer has its own registry slot: the bucketed
# LSH path is driver-visible through embedding_near_dups (same
# hyperplane_buckets machinery, oracle-checked bit-for-bit), and the
# bucket-local top-k keeps its recall-vs-brute-force assertion in
# tests/test_similarity.py.
