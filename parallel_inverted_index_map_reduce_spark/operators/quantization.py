"""Scalar int8 quantization for embedding columns.

At 100 TB an fp32 embedding column dominates storage and shuffle: int8
symmetric quantization cuts it 4x with a per-vector scale, at a recall
cost small enough that the standard pattern is "search quantized,
re-rank exact". Everything here is built-in array expressions
(transform/aggregate folds) — JVM codegen, no UDFs, no shuffles; the
operators compose with the similarity module (quantize -> ann search ->
exact re-rank on the shortlist).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_abs(col: Column) -> Column:
    return F.aggregate(
        col,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Adds ``out_col`` (array<tinyint>) and ``{out_col}_scale``.

    Symmetric per-vector scale: q = round(x / scale), scale =
    max|x| / 127, so dequantized error per component is <= scale / 2.
    All-zero vectors get scale 1.0 (q is all zeros; dequantizes
    losslessly).

    The max-abs fold lands in an intermediate column first: higher-order
    aggregate lambdas are not common-subexpression-eliminated by
    codegen, so referencing the fold twice (zero-check + divide) would
    pay two full array passes per row.
    """
    ma = f"{out_col}_maxabs"
    df = emb.withColumn(ma, _max_abs(F.col(vec_col)))
    df = df.withColumn(
        f"{out_col}_scale",
        F.when(F.col(ma) == 0.0, F.lit(1.0)).otherwise(F.col(ma) / F.lit(127.0)),
    ).drop(ma)
    return df.withColumn(
        out_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / F.col(f"{out_col}_scale")).cast(
                "tinyint"
            ),
        ),
    )


def dequantize(
    df: DataFrame, q_col: str = "q", out_col: str = "embedding_dq"
) -> DataFrame:
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col),
            lambda v: v.cast("double") * F.col(f"{q_col}_scale"),
        ),
    )


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over two int8-quantized vectors. The per-vector scales
    cancel: cos(a, b) = <qa, qb> / (|qa| |qb|) exactly, because each
    vector is a uniform scaling of its quantized form. Integer dot
    products accumulate in longs — no float error in the reduction.

    An all-zero vector has no direction; its cosine is defined as 0.0
    here (not NULL — 0/0 under non-ANSI division would yield NULL rows
    that sort nulls-last yet still occupy top-k ranks downstream)."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x.cast("long") * y.cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    n1 = F.aggregate(
        F.transform(qa, lambda x: x.cast("long") * x.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    n2 = F.aggregate(
        F.transform(qb, lambda x: x.cast("long") * x.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.when((n1 == 0) | (n2 == 0), F.lit(0.0)).otherwise(
        dot.cast("double") / F.sqrt(n1.cast("double") * n2.cast("double"))
    )


def quantized_topk(
    emb: DataFrame, k: int = 3, n_queries: int = 5
) -> DataFrame:
    """Brute-force top-k over the quantized column — the shortlist stage
    of a quantize-search-rerank pipeline. Same broadcast-queries shape
    as similarity.ann_topk_fast, but the corpus scan moves 4x fewer
    bytes."""
    from pyspark.sql import Window

    q = quantize_int8(emb)
    queries = q.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("vec_a"), F.col("q").alias("qa")
    )
    corpus = q.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("vec_a") != F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            quantized_cosine(F.col("qa"), F.col("qb")).alias("qcos"),
        )
    )
    w = Window.partitionBy("vec_a").orderBy(
        F.desc("qcos"), F.asc("vec_b")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("vec_a", "vec_b", "qcos", F.col("rk").cast("long").alias("rk"))
    )
