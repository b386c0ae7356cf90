"""Sequence packing invariants: total partition, budget respected,
oversize isolation, sane fill."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE

BUDGET = 128


def _docs_with_len(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), t -> t != '')")).alias("n_tokens"),
    )


def test_packing_invariants(spark):
    dl = _docs_with_len(spark)
    packed = pack_sequences(dl, BUDGET).cache()

    # every doc packed exactly once, token counts carried through
    assert packed.count() == dl.count()
    assert packed.select("doc_id").distinct().count() == dl.count()
    assert (
        packed.agg(F.sum("n_tokens")).first()[0]
        == dl.agg(F.sum("n_tokens")).first()[0]
    )

    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("n_docs")
    )
    # multi-doc bins never exceed the budget
    assert bins.where((F.col("n_docs") > 1) & (F.col("total") > BUDGET)).count() == 0
    # docs at/over budget sit alone
    over = packed.where(F.col("n_tokens") >= BUDGET).select("bin_id")
    assert (
        bins.join(over, "bin_id", "left_semi").where(F.col("n_docs") > 1).count()
        == 0
    )

    stats = packing_stats(packed, BUDGET).first()
    assert stats.n_docs == dl.count()
    # FFD on many small docs should fill bins well past half
    assert stats.fill_pct > 60.0, stats


def test_packing_composite_id_beyond_int32(spark):
    """A (doc_id, chunk_id) composite key survives packing verbatim —
    including doc_id >= 2^31, where the old shiftleft-packed single key
    silently collided (join fan-out in the pipeline)."""
    big = 2**31
    rows = [
        (big + 0, 0, 50),
        (big + 0, 1, 50),
        (big + 1, 0, 50),  # would collide with (big+0, chunk 2^32) packed
        (big + 1, 1, 50),
        (7, 0, 200),  # oversize: bin of its own
    ]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_id", "n_tokens"])
    packed = pack_sequences(df, BUDGET, id_cols=("doc_id", "chunk_id")).cache()
    assert packed.columns == ["doc_id", "chunk_id", "n_tokens", "bin_id"]
    assert packed.count() == 5
    assert packed.select("doc_id", "chunk_id").distinct().count() == 5
    got = {(r.doc_id, r.chunk_id): r.n_tokens for r in packed.collect()}
    assert got == {(d, c): n for d, c, n in rows}
