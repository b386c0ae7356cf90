"""Boolean posting-list search: the fused single-aggregation operator
must agree row-for-row with the composition of the per-op parity
helpers (boolean_and/or/not over a built index), including the
zero-rows-when-a-term-is-missing semantics both inherit from the
cross-join-of-empty formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import index as ix

DOCS = [
    (0, "spark query engine"),
    (1, "spark spark streaming"),
    (2, "query planner"),
    (3, "unrelated words only"),
    (4, "spark and query together"),
]


def _composed(idx, t1, t2):
    parts = [
        ix.boolean_and(idx, t1, t2).withColumn("op", F.lit("and")),
        ix.boolean_or(idx, t1, t2).withColumn("op", F.lit("or")),
        ix.boolean_not(idx, t1, t2).withColumn("op", F.lit("not")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _rows(df):
    return sorted(
        (r["op"], r["term1"], r["term2"], list(r["doc_ids"])) for r in df.collect()
    )


def test_fused_equals_composed(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = ix.build_index(docs)
    fused = _rows(ix.boolean_search(docs, "spark", "query"))
    composed = _rows(_composed(idx, "spark", "query"))
    assert fused == composed
    assert fused[0] == ("and", "spark", "query", [0, 4])
    assert fused[1] == ("not", "spark", "query", [1])
    assert fused[2] == ("or", "spark", "query", [0, 1, 2, 4])


def test_missing_term_yields_no_rows(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = ix.build_index(docs)
    assert ix.boolean_search(docs, "spark", "absentterm").count() == 0
    assert _composed(idx, "spark", "absentterm").count() == 0
    assert ix.boolean_search(docs, "absentterm", "query").count() == 0
