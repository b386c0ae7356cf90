"""Vector similarity search over the ``embeddings`` table
(array<float>, dim 64).

Two paths, per SURVEY.md §7 Phase 4:

- *oracle path* (cross-engine exact): explode components, decimal-sum
  the products. Deterministic bit-for-bit in Spark and DuckDB, used for
  the correctness gate. O(n^2 * d) — fine at test scale.
- *fast path* (JVM vectorized): ``zip_with`` + ``aggregate`` fold over
  the arrays — one codegen stage, no explode blow-up. This is the
  shape you'd run at 100 TB, combined with bucketing: the LSH variant
  prunes candidates by random-hyperplane sign buckets so the join is
  bucket-local instead of full cross.

PHiDJ (ICDE 2014, PAPERS.md) motivates the bucketed self-join shape for
high-dimensional vectors; the hyperplane-bucket variant below is that
idea with sign-LSH partitioning (patterns only, no code reuse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32

DEC = "decimal(30,9)"


def components(emb: DataFrame) -> DataFrame:
    """(vec_id, i, x): exploded double components."""
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select("vec_id", "i", F.col("xf").cast("double").alias("x"))


def _decimal_dot(xcol: Column, ycol: Column) -> Column:
    return F.sum(F.round(xcol * ycol, 7).cast(DEC))


def norms(emb: DataFrame) -> DataFrame:
    comp = components(emb)
    return comp.groupBy("vec_id").agg(
        _decimal_dot(F.col("x"), F.col("x")).alias("norm_sq")
    )


def pairwise_cosine(emb: DataFrame, max_query_id: int | None = None) -> DataFrame:
    """(vec_a, vec_b, cosine): exact cross-engine cosine for all pairs
    (optionally only queries with vec_id < max_query_id on the left)."""
    comp = components(emb)
    nrm = norms(emb)
    left = comp.withColumnsRenamed({"vec_id": "vec_a", "x": "xa"})
    if max_query_id is not None:
        left = left.where(F.col("vec_a") < max_query_id)
    right = comp.withColumnsRenamed({"vec_id": "vec_b", "x": "xb"})
    dots = (
        left.join(right, "i")
        .where(F.col("vec_a") != F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(_decimal_dot(F.col("xa"), F.col("xb")).alias("dot"))
    )
    na = nrm.select(F.col("vec_id").alias("vec_a"), F.col("norm_sq").alias("na"))
    nb = nrm.select(F.col("vec_id").alias("vec_b"), F.col("norm_sq").alias("nb"))
    return (
        dots.join(F.broadcast(na), "vec_a")
        .join(F.broadcast(nb), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )


def ann_topk(emb: DataFrame, k: int = 3, n_queries: int = 5) -> DataFrame:
    """Brute-force exact top-k neighbors for the first ``n_queries``
    vectors, ranked by rounded cosine with vec_b tie-break."""
    cos = pairwise_cosine(emb, max_query_id=n_queries)
    w = Window.partitionBy("vec_a").orderBy(F.desc("cosine"), F.asc("vec_b"))
    return (
        cos.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("vec_a", "vec_b", "cosine", "rank")
    )


# --- fast JVM path (bench / scale) -----------------------------------------


def cosine_expr(a: Column, b: Column) -> Column:
    """Whole-stage-codegen cosine over two array<float> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n2 = F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / (F.sqrt(n1) * F.sqrt(n2))


def _norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def ann_topk_fast(emb: DataFrame, k: int = 3, n_queries: int = 5) -> DataFrame:
    """Array-fold cosine top-k: no component explode, one broadcast of
    the query side. The plan at scale: broadcast queries, scan corpus
    once, per-partition top-k via window.

    Norms are precomputed per SIDE (one fold per row) so each pair costs
    a single dot-product fold instead of three — same values as folding
    dot/(sqrt(n1)*sqrt(n2)) per pair, a third of the work.
    """
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("qe"),
        _norm_expr(F.col("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("ce"),
        _norm_expr(F.col("embedding")).alias("cn"),
    )
    dot = F.aggregate(
        F.zip_with("qe", "ce", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cos = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("vec_a") != F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(dot / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_a").orderBy(F.desc("cosine"), F.asc("vec_b"))
    return (
        cos.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("vec_a", "vec_b", "cosine", "rank")
    )


def hyperplane_buckets(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    """(vec_id, bucket): random-hyperplane sign-LSH bucket assignment.

    Plane weights w[p][i] in {-1, +1} come from a hash of (p, i) —
    shared-nothing, reproducible anywhere (including the SQL oracle).
    Projections sum as decimals so the sign is partition-order
    independent: a double sum could flip sign near zero between two
    runs (or two engines), silently moving a vector across buckets.
    """
    comp = components(emb)
    # plane-id fan-out as a literal-array explode (narrow, no join node)
    planes = comp.select(
        "vec_id",
        "i",
        "x",
        F.explode(F.array(*[F.lit(p) for p in range(n_planes)])).alias("p"),
    )
    signs = planes.select(
        "vec_id",
        "p",
        F.round(
            F.col("x")
            * F.when(
                stable_hash32(F.concat_ws("_", F.col("p"), F.col("i"))) % 2 == 0, 1.0
            ).otherwise(-1.0),
            7,
        )
        .cast(DEC)
        .alias("proj"),
    )
    return (
        signs.groupBy("vec_id", "p")
        .agg(F.sum("proj").alias("s"))
        .groupBy("vec_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "s"))),
                    lambda st: F.when(st["s"] >= 0, "1").otherwise("0"),
                ),
            ).alias("bucket")
        )
    )


def bucketed_near_dups(
    emb: DataFrame, n_planes: int = 4, threshold: float = 0.35
) -> DataFrame:
    """(vec_a, vec_b, cosine): same-bucket pairs with exact decimal
    cosine >= threshold.

    The 100 TB shape for embedding near-dup mining: hyperplane buckets
    prune the candidate space (the pair join is an equi-join on the
    bucket string — never a full cross product), and the exact
    cross-engine decimal cosine runs only on in-bucket pairs. Recall
    is tuned by n_planes (fewer planes = bigger buckets = higher
    recall); multi-probe or plane-rotation repeats recover the rest.
    """
    buckets = hyperplane_buckets(emb, n_planes)
    a = buckets.select(F.col("vec_id").alias("vec_a"), "bucket")
    b = buckets.select(F.col("vec_id").alias("vec_b"), "bucket")
    pairs = (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    comp = components(emb)
    ca = comp.withColumnsRenamed({"vec_id": "vec_a", "x": "xa"})
    cb = comp.withColumnsRenamed({"vec_id": "vec_b", "x": "xb"})
    dots = (
        pairs.join(ca, "vec_a")
        .join(cb, ["vec_b", "i"])
        .groupBy("vec_a", "vec_b")
        .agg(_decimal_dot(F.col("xa"), F.col("xb")).alias("dot"))
    )
    nrm = norms(emb)
    na = nrm.select(F.col("vec_id").alias("vec_a"), F.col("norm_sq").alias("na"))
    nb = nrm.select(F.col("vec_id").alias("vec_b"), F.col("norm_sq").alias("nb"))
    cos = (
        dots.join(F.broadcast(na), "vec_a")
        .join(F.broadcast(nb), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    return cos.where(F.col("cosine") >= threshold)


def lsh_bucketed_neighbors(
    emb: DataFrame, n_planes: int = 8, k: int = 3
) -> DataFrame:
    """Random-hyperplane LSH bucketed top-k: candidate pairs are
    bucket-local (see :func:`hyperplane_buckets`).

    At 100 TB this replaces the full cross join: buckets partition the
    corpus, the pair join is per-bucket, and recall is tuned by
    (n_planes, multi-probe). Returns bucket-local top-k per vector.
    """
    withb = emb.join(hyperplane_buckets(emb, n_planes), "vec_id")
    a = withb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("qe"), "bucket"
    )
    b = withb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("ce"), "bucket"
    )
    cos = (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "bucket",
            "vec_a",
            "vec_b",
            F.round(cosine_expr(F.col("qe"), F.col("ce")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_a").orderBy(F.desc("cosine"), F.asc("vec_b"))
    return (
        cos.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("vec_a", "vec_b", "cosine", "rank", "bucket")
    )
