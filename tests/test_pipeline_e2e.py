"""End-to-end training-data pipeline: stage invariants compose."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark import pipeline as pl
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE

BUDGET = 256


def test_pipeline_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = str(tmp_path / "training")
    packed = pl.run_and_land(spark, docs, out, budget=BUDGET).cache()

    # something survived, something was dropped (quality/dedup active)
    n_docs_in = docs.count()
    n_docs_out = packed.select("doc_id").distinct().count()
    assert 0 < n_docs_out < n_docs_in

    # no chunk exceeds its window; no multi-chunk bin exceeds the budget
    assert packed.where(F.col("n_tokens") > 128).count() == 0
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("n")
    )
    assert bins.where((F.col("n") > 1) & (F.col("total") > BUDGET)).count() == 0

    # scrubbed text carries no raw email-shaped strings
    leaked = packed.where(
        F.col("chunk").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    )
    assert leaked.count() == 0

    # landed layout: one directory per shard, within-budget file counts
    shards = glob.glob(f"{out}/shard=*")
    assert len(shards) > 0
    back = spark.read.parquet(out)
    assert back.count() == packed.count()
