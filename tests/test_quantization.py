"""int8 embedding quantization: bounded reconstruction error, high
top-k agreement with the exact search, and schema compactness."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, ByteType

from parallel_inverted_index_map_reduce_spark.operators import quantization as qz
from parallel_inverted_index_map_reduce_spark.operators import similarity as sim
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _emb(spark):
    return load_table(spark, SF_ORACLE, "embeddings")


def test_quantize_roundtrip_error_bounded(spark):
    df = qz.dequantize(qz.quantize_int8(_emb(spark)))
    err = df.select(
        F.max(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "embedding_dq",
                    lambda a, b: F.abs(a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: F.greatest(acc, v),
            )
            / F.col("q_scale")
        ).alias("worst_halves")
    ).first()[0]
    # per-component error <= scale/2 by construction of round()
    assert err <= 0.5 + 1e-9


def test_quantized_schema_is_int8(spark):
    q = qz.quantize_int8(_emb(spark))
    t = q.schema["q"].dataType
    assert isinstance(t, ArrayType) and isinstance(t.elementType, ByteType)


def test_quantized_cosine_zero_vector_is_zero_not_null(spark):
    """All-zero vectors have no direction: cosine is 0.0, never NULL
    (NULL sorts nulls-last but can still occupy top-k ranks)."""
    rows = [
        (0, [0.0, 0.0, 0.0]),
        (1, [1.0, 2.0, 3.0]),
        (2, [0.0, 0.0, 0.0]),
    ]
    q = qz.quantize_int8(
        spark.createDataFrame(rows, ["vec_id", "embedding"])
    )
    a = q.where("vec_id = 0").select(F.col("q").alias("qa"))
    pairs = a.crossJoin(q.select(F.col("vec_id").alias("b"), F.col("q").alias("qb")))
    got = {
        r.b: r.c
        for r in pairs.select(
            "b", qz.quantized_cosine(F.col("qa"), F.col("qb")).alias("c")
        ).collect()
    }
    assert got == {0: 0.0, 1: 0.0, 2: 0.0}  # zero vs anything = 0.0, not None


def test_quantized_topk_agrees_with_exact(spark):
    k, nq = 5, 8
    exact = {
        (r.vec_a, r.vec_b)
        for r in sim.ann_topk_fast(_emb(spark), k=k, n_queries=nq).collect()
    }
    quant = {
        (r.vec_a, r.vec_b)
        for r in qz.quantized_topk(_emb(spark), k=k, n_queries=nq).collect()
    }
    overlap = len(exact & quant) / len(exact)
    assert overlap >= 0.8, f"recall vs exact too low: {overlap}"
