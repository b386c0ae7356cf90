"""Domain mixing (operators/sampling.py mix_to_proportions) and the
deterministic training-shard export (operators/export.py): shard
membership and order must be pure functions of the data, invariant to
input partitioning, and the written shards must replay byte-identically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.export import (
    ORDER_COL,
    SHARD_COL,
    read_training_shard,
    training_order,
    write_training_shards,
)
from parallel_inverted_index_map_reduce_spark.operators.sampling import (
    mix_to_proportions,
)


def _corpus(spark, n=800):
    # sources sized 4:2:1:1 so every target mixture below is achievable
    # by downsampling only
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.element_at(
            F.array(F.lit("web"), F.lit("web"), F.lit("web"), F.lit("web"),
                    F.lit("code"), F.lit("code"), F.lit("books"), F.lit("wiki")),
            (F.col("id") % 8 + 1).cast("int"),
        ).alias("source"),
    )


class TestMixToProportions:
    def test_fractions_solve_the_mixture(self, spark):
        df = _corpus(spark)  # web=400, code=200, books=100, wiki=100
        mixed, fracs = mix_to_proportions(
            df, "source", {"web": 0.5, "code": 0.25, "books": 0.25}, key="doc_id"
        )
        # binding stratum: books (100 / 0.25 = 400 = scale) -> keeps all;
        # web keeps 200/400, code keeps 100/200
        assert fracs == {"web": 0.5, "code": 0.5, "books": 1.0}
        counts = {
            r["source"]: r["n"]
            for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert set(counts) <= {"web", "code", "books"}  # wiki dropped
        assert counts["books"] == 100  # kept whole, exactly
        # hash-sampled strata land near expectation (binomial, n=400/200)
        assert abs(counts["web"] - 200) < 60
        assert abs(counts["code"] - 100) < 45

    def test_deterministic_under_repartition(self, spark):
        df = _corpus(spark)
        w = {"web": 0.6, "code": 0.4}
        a, _ = mix_to_proportions(df, "source", w, key="doc_id")
        b, _ = mix_to_proportions(df.repartition(13), "source", w, key="doc_id")
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )

    def test_missing_stratum_raises(self, spark):
        with pytest.raises(ValueError, match="absent"):
            mix_to_proportions(
                _corpus(spark), "source", {"web": 0.5, "nope": 0.5}, key="doc_id"
            )

    def test_bad_weights_raise(self, spark):
        with pytest.raises(ValueError, match="positive"):
            mix_to_proportions(_corpus(spark), "source", {"web": -1.0}, key="doc_id")


class TestTrainingExport:
    def test_order_invariant_to_input_partitioning(self, spark):
        df = _corpus(spark, n=500)
        rows = lambda frame: [
            (r[SHARD_COL], r[ORDER_COL], r["doc_id"])
            for r in frame.select(SHARD_COL, ORDER_COL, "doc_id")
            .orderBy(SHARD_COL, ORDER_COL, "doc_id")
            .collect()
        ]
        a = rows(training_order(df, "doc_id", n_shards=4))
        b = rows(training_order(df.repartition(17), "doc_id", n_shards=4))
        assert a == b
        assert len(a) == 500

    def test_shard_is_hash_mod(self, spark):
        out = training_order(_corpus(spark, n=100), "doc_id", n_shards=4)
        bad = out.where(F.col(SHARD_COL) != F.pmod(F.col(ORDER_COL), F.lit(4)))
        assert bad.count() == 0

    def test_shards_are_balanced_and_mixed(self, spark):
        out = training_order(_corpus(spark, n=800), "doc_id", n_shards=8)
        sizes = [
            r["n"] for r in out.groupBy(SHARD_COL).agg(F.count("*").alias("n")).collect()
        ]
        assert len(sizes) == 8
        assert max(sizes) < 2 * min(sizes)  # uniform hash, 100-row expectation
        # mixing: consecutive rows of a shard should not walk doc_id order
        first = (
            out.where(F.col(SHARD_COL) == 0)
            .orderBy(ORDER_COL)
            .limit(10)
            .collect()
        )
        ids = [r["doc_id"] for r in first]
        assert ids != sorted(ids)

    def test_roundtrip_replays_exact_order(self, spark, tmp_path):
        df = _corpus(spark, n=300)
        path = str(tmp_path / "shards")
        write_training_shards(df, path, key="doc_id", n_shards=3)
        expected = (
            training_order(df, "doc_id", n_shards=3)
            .where(F.col(SHARD_COL) == 1)
            .orderBy(ORDER_COL, "doc_id")
            .select("doc_id")
            .collect()
        )
        got = read_training_shard(spark, path, shard=1, key="doc_id").select(
            "doc_id"
        ).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in expected]
        # nothing lost across shards
        total = spark.read.parquet(path).count()
        assert total == 300
