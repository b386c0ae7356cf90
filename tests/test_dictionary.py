"""Dictionary encoding: dense order-preserving word ids with no
global-sort bottleneck, and a lossless index round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import index as ix
from parallel_inverted_index_map_reduce_spark.operators.dictionary import (
    decode_index,
    encode_index,
    word_dictionary,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _index(spark):
    return ix.build_index(load_table(spark, SF_ORACLE, "documents"))


def test_ids_dense_bijective_order_preserving(spark):
    idx = _index(spark)
    d = word_dictionary(idx)
    rows = sorted((r["word_id"], r["word"]) for r in d.collect())
    n = idx.select("word").distinct().count()
    assert len(rows) == n
    assert [i for i, _ in rows] == list(range(n))  # dense [0, V)
    words_by_id = [w for _, w in rows]
    assert words_by_id == sorted(words_by_id)  # id order == lex order


def test_no_single_partition_window(spark):
    """The ranking window partitions by letter — a global-order
    row_number would show an Exchange SinglePartition feeding the
    Window, the scale bug this layout exists to avoid."""
    plan = word_dictionary(_index(spark))._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_encode_decode_round_trip(spark):
    idx = _index(spark).withColumn("postings", F.array_join("postings", " "))
    d = word_dictionary(idx)
    enc = encode_index(idx, d)
    assert "word" not in enc.columns and "word_id" in enc.columns
    dec = decode_index(enc, d)
    cols = ["letter", "word", "df", "postings", "rank"]
    assert sorted(map(tuple, dec.select(*cols).collect())) == sorted(
        map(tuple, idx.select(*cols).collect())
    )


def test_dictionary_partition_invariant(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    a = sorted(map(tuple, word_dictionary(ix.build_index(docs)).collect()))
    b = sorted(
        map(
            tuple,
            word_dictionary(ix.build_index(docs.repartition(13))).collect(),
        )
    )
    assert a == b


def test_prefix_len_is_a_pure_parallelism_knob(spark):
    """Identical ids at every prefix_len — the decomposition only
    changes the ranking window's fan-out, never the assignment."""
    idx = _index(spark)
    base = sorted(map(tuple, word_dictionary(idx, prefix_len=1).collect()))
    for p in (2, 3):
        got = sorted(map(tuple, word_dictionary(idx, prefix_len=p).collect()))
        assert got == base, f"prefix_len={p} changed the assignment"
