"""Similarity-search query specs over the embeddings table."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quantization as qz
from ..operators import serving as srv
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


# The semdedup anchors and the near-dup entry are DELIBERATELY
# quadratic (global or in-bucket all-pairs) — that is what lets a plain
# brute-force oracle prove the scalable machinery lossless. At registry
# scale that is the whole point; above it the quadratic anchor (and its
# oracle) would dominate any sweep, so BOTH sides anchor over the same
# deterministic md5-ordered subset of the corpus. The cap covers sf0.01
# (500 vecs) and sf0.1 (2,000) ENTIRELY — driver rows are byte-identical
# to the uncapped formulation there — and bounds the pair count at any
# larger scale (2048^2/2 ~ 2M pairs at sf1's 20k vectors instead of
# 200M). The production paths (banded LSH, cluster-local SemDedup, IVF
# probes) stay uncapped — only the all-pairs ANCHORS are scale-capped.
_ANCHOR_CAP = 2048

_UNIV_CTE = f"""
univ AS (
    SELECT vec_id FROM embeddings
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
    LIMIT {_ANCHOR_CAP}
)
"""


def _capped_emb(emb: DataFrame, cap: int = _ANCHOR_CAP) -> DataFrame:
    """The md5-ordered first ``cap`` vectors — _UNIV_CTE's twin (same
    hash of the same decimal string, same binary collation, same
    vec_id tiebreak, so the subset is identical across engines). The
    rank-capped form keeps EVERYTHING while the corpus fits under the
    cap (a fraction-keeping hash threshold would thin small corpora
    too), which is what pins the driver rows at registry scale."""
    top = (
        emb.select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(cap)
        .select("vec_id")
    )
    return emb.join(F.broadcast(top), "vec_id", "left_semi")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _streamed_ann_store(spark: SparkSession, sf_dir: str, emb: DataFrame) -> str:
    """Build (or reuse this session's — plans/stores.py) streamed ANN
    snapshot and return its store directory: the embeddings land as
    three parquet files, a maxFilesPerTrigger=1 availableNow stream
    folds them through streaming/ann_stream.py (the first batch seeds
    the fixed coarse quantizer, later batches assign under it and union
    in), and the caller serves from the latest committed snapshot.
    Which rows seed the quantizer depends on the file split —
    deliberately irrelevant to the registry anchor, which probes ALL
    lists with decimal scores so the served ranks equal brute force
    whatever the centroids."""
    from ..streaming import ann_stream as avs
    from .stores import drain, input_key, session_store, tuned_shuffle

    def build(tmp: str) -> str:
        src = os.path.join(tmp, "emb_in")
        store = os.path.join(tmp, "ann_versions")
        ckpt = os.path.join(tmp, "ckpt")
        with tuned_shuffle(spark):
            emb.repartition(3).write.parquet(src)
            stream = (
                spark.readStream.schema(emb.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            drain(
                avs.start_incremental_ann(
                    stream, store, ckpt, n_list=8, n_iters=2
                ),
                "streamed ANN build",
            )
        return store

    return session_store("ann_stream", input_key(sf_dir, emb), build)


def _ann_serving_base(spark: SparkSession, sf_dir: str, emb: DataFrame) -> str:
    """Attach-or-build the persisted ANN serving layout for ``sf_dir``
    and return its base name — the similarity surface's twin of
    queries_index._serving_base. n_list matches the in-session
    ivf_full_probe part so nprobe == n_list probes every list and the
    stored ranks are provably the brute-force ranks. ensure_ann_index
    verifies the sidecar's embeddings fingerprint on cross-session
    attach, so regenerated embeddings at the same path are rebuilt,
    never served stale."""
    import hashlib

    from .stores import tuned_shuffle

    base = "annserve_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    with tuned_shuffle(spark):
        srv.ensure_ann_index(emb, base, n_list=8, n_iters=2)
    return base


@register(
    "embedding_near_dups",
    oracle="WITH "
    + COMP_CTE
    + ","
    + BUCKETS_CTE
    + ","
    + _UNIV_CTE
    + """,
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE a.vec_id IN (SELECT vec_id FROM univ)
      AND b.vec_id IN (SELECT vec_id FROM univ)
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
    "reproduces bucket assignment and verification bit-for-bit. With "
    "only 16 buckets the in-bucket pair count is still quadratic in "
    "corpus size, so the anchor runs over the md5-capped subset "
    "(_ANCHOR_CAP — the whole corpus at registry/bench scale, a "
    "bounded deterministic sample above it).",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.bucketed_near_dups(
        _capped_emb(_emb(spark, sf_dir)),
        n_planes=_N_PLANES_NEAR_DUPS,
        threshold=0.35,
    )


@register(
    "ann_topk",
    oracle="WITH "
    + COMP_CTE
    + ","
    + _UNIV_CTE
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
),
exact_ranked AS (
    SELECT vec_a, vec_b, cosine,
           row_number() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b) AS rk
    FROM cos
),
scales AS (
    SELECT vec_id,
           CASE WHEN MAX(ABS(x)) = 0 THEN 1.0 ELSE MAX(ABS(x)) / 127.0 END AS scale
    FROM comp GROUP BY vec_id
),
qcomp AS (
    SELECT c.vec_id, c.i, CAST(round(c.x / s.scale, 0) AS BIGINT) AS q
    FROM comp c JOIN scales s ON s.vec_id = c.vec_id
),
qnorms AS (
    SELECT vec_id, SUM(q * q) AS n2 FROM qcomp GROUP BY vec_id
),
qdots AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.q * b.q) AS dot
    FROM qcomp a JOIN qcomp b ON a.i = b.i AND a.vec_id <> b.vec_id
    WHERE a.vec_id < 5
    GROUP BY 1, 2
),
qcos AS (
    SELECT vec_a, vec_b,
           CASE WHEN na.n2 = 0 OR nb.n2 = 0 THEN 0.0
                ELSE CAST(dot AS DOUBLE)
                     / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) END AS c
    FROM qdots
    JOIN qnorms na ON na.vec_id = vec_a
    JOIN qnorms nb ON nb.vec_id = vec_b
),
q_ranked AS (
    SELECT vec_a, vec_b, c,
           row_number() OVER (PARTITION BY vec_a ORDER BY c DESC, vec_b) AS rk
    FROM qcos
),
sdots AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           SUM(CAST(round(a.x * b.x, 7) AS DECIMAL(30,9))) AS dot
    FROM comp a JOIN comp b ON a.i = b.i AND a.vec_id < b.vec_id
    WHERE a.vec_id IN (SELECT vec_id FROM univ)
      AND b.vec_id IN (SELECT vec_id FROM univ)
    GROUP BY 1, 2
),
scos AS (
    SELECT vec_a, vec_b,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.norm_sq AS DOUBLE)) * sqrt(CAST(nb.norm_sq AS DOUBLE))),
                 6) AS cosine
    FROM sdots
    JOIN nrm na ON na.vec_id = vec_a
    JOIN nrm nb ON nb.vec_id = vec_b
),
sd_seeds AS (
    SELECT (row_number() OVER (ORDER BY h, vec_id)) - 1 AS j, embedding
    FROM (SELECT vec_id, embedding,
                 CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
          FROM embeddings
          WHERE len(embedding) > 0
            AND vec_id IN (SELECT vec_id FROM univ))
    ORDER BY h, vec_id LIMIT 4
),
sd_dist AS (
    SELECT e.vec_id, s.j,
           round(list_reduce(
             list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.embedding[i] AS DOUBLE))
                    * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.embedding[i] AS DOUBLE))),
             (acc, v) -> acc + v), 9) AS d
    FROM embeddings e CROSS JOIN sd_seeds s
    WHERE len(e.embedding) > 0
      AND e.vec_id IN (SELECT vec_id FROM univ)
),
sd_assign AS (
    SELECT vec_id, j AS list_id
    FROM sd_dist
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, j) = 1
)
SELECT 'exact' AS op, vec_a, vec_b, CAST(cosine AS DOUBLE) AS score,
       rk AS "rank"
FROM exact_ranked WHERE rk <= 3
UNION ALL
SELECT 'semdedup' AS op, vec_b AS vec_a, MIN(vec_a) AS vec_b,
       CAST(NULL AS DOUBLE) AS score, COUNT(*) AS "rank"
FROM scos WHERE cosine >= 0.35 GROUP BY vec_b
UNION ALL
SELECT 'semdedup_k' AS op, s.vec_b AS vec_a, MIN(s.vec_a) AS vec_b,
       CAST(NULL AS DOUBLE) AS score, COUNT(*) AS "rank"
FROM scos s
JOIN sd_assign aa ON aa.vec_id = s.vec_a
JOIN sd_assign ab ON ab.vec_id = s.vec_b AND ab.list_id = aa.list_id
WHERE s.cosine >= 0.35 GROUP BY s.vec_b
UNION ALL
SELECT 'ivf_full_probe' AS op, vec_a, vec_b, CAST(NULL AS DOUBLE) AS score,
       rk AS "rank"
FROM exact_ranked WHERE rk <= 3
UNION ALL
SELECT 'ivf_stored' AS op, vec_a, vec_b, CAST(NULL AS DOUBLE) AS score,
       rk AS "rank"
FROM exact_ranked WHERE rk <= 3
UNION ALL
SELECT 'ann_streamed' AS op, vec_a, vec_b, CAST(NULL AS DOUBLE) AS score,
       rk AS "rank"
FROM exact_ranked WHERE rk <= 3
UNION ALL
SELECT 'int8' AS op, vec_a, vec_b, CAST(NULL AS DOUBLE) AS score,
       rk AS "rank"
FROM q_ranked WHERE rk <= 3
UNION ALL
SELECT 'knn' AS op, vec_a, lbl AS vec_b, CAST(NULL AS DOUBLE) AS score,
       v AS "rank"
FROM (
    SELECT vec_a, lbl, v,
           row_number() OVER (PARTITION BY vec_a
                              ORDER BY v DESC, lbl ASC) AS r
    FROM (
        SELECT e.vec_a, CAST(l.label AS BIGINT) AS lbl, count(*) AS v
        FROM exact_ranked e
        JOIN embeddings l ON l.vec_id = e.vec_b
        WHERE e.rk <= 5
        GROUP BY 1, 2
    )
) WHERE r = 1
""",
    tags=("similarity", "serving", "dedup"),
    doc="Eight embedding-space formulations in ONE labeled result (op "
    "column): six ANN paths plus two SemDedup parts. 'semdedup' — SemDedup semantic "
    "near-dup pruning (operators/similarity.py semantic_dedup, Abbas "
    "et al. 2023): cluster-local pairwise cosine over the IVF k-means "
    "partition, run at n_list=1 so the cluster machinery provably "
    "degenerates to exact global all-pairs — the oracle is that "
    "brute-force formulation (drop every vector with an earlier "
    "near-dup, witness = min such id, rank = witness count), so the "
    "hash match proves the pair expansion + keep rule lossless; "
    "'semdedup_k' is the MULTI-CLUSTER path — the part that scales — "
    "at n_list=4, n_iters=0: the oracle reproduces ivf_fit's "
    "md5-ordered seed selection and ivf_assign's nearest-centroid "
    "argmin bit-for-bit (DuckDB list_reduce is the same left fold over "
    "identical widened doubles as Spark's F.aggregate, and round-9 + "
    "tie-on-j pins the ordering), then applies the cluster-LOCAL drop "
    "rule — the hash match proves the Voronoi partition and the "
    "cluster-local keep rule, not just the degenerate anchor; the "
    "Lloyd mean update (n_iters>0) stays property-tested in "
    "tests/test_similarity.py (its decimal-division scale rules "
    "differ across engines). Both semdedup anchors (and ONLY they — "
    "the six ANN paths are query-bounded) run over the md5-capped "
    "subset (_capped_emb / the univ CTE): the full corpus at "
    "registry and bench scale, a deterministic bounded sample above "
    "it, keeping the deliberately-quadratic anchor sweepable at any "
    "sf. "
    "same pattern as boolean_search): 'exact' is the brute-force decimal "
    "cosine; 'ivf_full_probe' runs the full IVF coarse-quantizer path — "
    "deterministic RNG-free k-means fit, shuffle-free assignment, "
    "probe-pruned equi-join — at nprobe == n_list with decimal scoring, "
    "so its ranks are bit-identical to brute force (no rounding-boundary "
    "exposure; the pruned nprobe < n_list recall is asserted in "
    "tests/test_similarity.py); 'ivf_stored' answers the SAME queries "
    "from the PERSISTED IVF layout (operators/serving.py "
    "store_ann_index: inverted lists as list_id-partitioned external "
    "parquet, probes pruned at the directory level via a static IN; "
    "ensure_ann_index verifies the sidecar's embeddings fingerprint on "
    "attach) while the oracle stays the brute-force formulation — the "
    "hash match proves the stored layout loses nothing; 'ann_streamed' "
    "answers the SAME queries from a STREAM-MAINTAINED snapshot built "
    "in-session (streaming/ann_stream.py: three availableNow "
    "micro-batches — the first seeds the fixed coarse quantizer, the "
    "rest assign under it and union into versioned "
    "complete-or-invisible snapshots; served through the same "
    "frame-parameterized body as the stored path at nprobe == n_list "
    "with decimal scores, so whatever rows seeded the quantizer the "
    "ranks are provably the brute-force ranks and the hash match "
    "proves the stream-maintained layout lossless); 'int8' is the "
    "quantized shortlist path, "
    "whose integer dot products and scales the oracle reproduces exactly "
    "— ranks order by raw IEEE doubles on both engines (score column "
    "NULL: a 6-decimal display rounding is the one step where Spark and "
    "DuckDB round differently at a boundary, so it stays out of the "
    "hash); 'knn' closes the application loop — k=5 majority-vote label "
    "prediction over the exact neighbors (operators/similarity.py "
    "knn_classify), vec_b carrying the predicted label and rank the "
    "winning vote count, tie-broken (votes desc, label asc).",
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    exact = sim.ann_topk(emb, k=3, n_queries=5).select(
        F.lit("exact").alias("op"),
        "vec_a",
        "vec_b",
        F.col("cosine").cast("double").alias("score"),
        "rank",
    )
    ivf = sim.ivf_topk(
        emb, k=3, n_queries=5, n_list=8, nprobe=8, n_iters=2,
        decimal_scores=True,
    ).select(
        F.lit("ivf_full_probe").alias("op"),
        "vec_a",
        "vec_b",
        F.lit(None).cast("double").alias("score"),
        "rank",
    )
    base = _ann_serving_base(spark, sf_dir, emb)
    ivf_s = srv.ann_search_stored(
        spark,
        base,
        emb.where(F.col("vec_id") < 5),
        k=3,
        nprobe=8,
        decimal_scores=True,
    ).select(
        F.lit("ivf_stored").alias("op"),
        "vec_a",
        "vec_b",
        F.lit(None).cast("double").alias("score"),
        "rank",
    )
    from ..streaming import ann_stream as avs

    ann_store = _streamed_ann_store(spark, sf_dir, emb)
    ann_sv = avs.ann_search_version(
        spark,
        ann_store,
        emb.where(F.col("vec_id") < 5),
        k=3,
        nprobe=8,
        decimal_scores=True,
    ).select(
        F.lit("ann_streamed").alias("op"),
        "vec_a",
        "vec_b",
        F.lit(None).cast("double").alias("score"),
        "rank",
    )
    q8 = qz.quantized_topk(emb, k=3, n_queries=5).select(
        F.lit("int8").alias("op"),
        "vec_a",
        "vec_b",
        F.lit(None).cast("double").alias("score"),
        F.col("rk").alias("rank"),
    )
    knn = sim.knn_classify(emb, k=5, n_queries=5).select(
        F.lit("knn").alias("op"),
        "vec_a",
        F.col("predicted_label").alias("vec_b"),
        F.lit(None).cast("double").alias("score"),
        F.col("votes").alias("rank"),
    )
    # n_list=1 anchors the cluster-local machinery at exact global
    # all-pairs, so the oracle is the brute-force formulation and the
    # hash match proves pair expansion + keep rule lossless; pruned
    # multi-cluster behavior is property-tested in tests/test_similarity.py.
    # Both semdedup anchors run over the md5-capped subset (the whole
    # corpus at registry/bench scale — see _capped_emb) so the
    # deliberately-quadratic anchor stays tractable above it.
    sd_emb = _capped_emb(emb)
    sd = sim.semantic_dedup(sd_emb, n_list=1, threshold=0.35, n_iters=1).select(
        F.lit("semdedup").alias("op"),
        F.col("vec_id").alias("vec_a"),
        F.col("kept_by").alias("vec_b"),
        F.lit(None).cast("double").alias("score"),
        F.col("n_witnesses").alias("rank"),
    )
    # the multi-cluster scaling path: n_iters=0 keeps centroids at the
    # md5-ordered seeds, so the oracle can replay the Voronoi
    # assignment exactly (Lloyd's decimal-division mean has different
    # scale rules across engines and stays property-tested)
    sd_k = sim.semantic_dedup(sd_emb, n_list=4, threshold=0.35, n_iters=0).select(
        F.lit("semdedup_k").alias("op"),
        F.col("vec_id").alias("vec_a"),
        F.col("kept_by").alias("vec_b"),
        F.lit(None).cast("double").alias("score"),
        F.col("n_witnesses").alias("rank"),
    )
    return (
        exact.unionByName(ivf)
        .unionByName(ivf_s)
        .unionByName(ann_sv)
        .unionByName(q8)
        .unionByName(knn)
        .unionByName(sd)
        .unionByName(sd_k)
    )


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
