"""Stream-stream interval join and stream-static enrichment must equal
their batch twins on the same bounded data (the same verification
pattern as the window operators in test_streaming.py)."""

from __future__ import annotations

from parallel_inverted_index_map_reduce_spark.sources.tables import load_table
from parallel_inverted_index_map_reduce_spark.streaming import events as sev
from parallel_inverted_index_map_reduce_spark.streaming import joins as sj

from .conftest import SF_ORACLE


def _drain(spark, stream_df, name, mode="append"):
    q = sev.run_to_memory(stream_df, name, output_mode=mode)
    assert q.awaitTermination(420), "stream did not finish within 420s"
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_stream_interval_join_matches_batch(spark):
    got = _drain(
        spark,
        sj.attribution_stream(sev.read_events_stream(spark, SF_ORACLE)),
        "t_attr",
    )
    batch = sj.attribution_batch(load_table(spark, SF_ORACLE, "events"))
    srows = sorted(map(tuple, got.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert len(brows) > 0, "attribution twin matched nothing — bad fixture"
    assert srows == brows


def test_stream_static_enrichment_matches_batch(spark):
    dim = sj.default_type_dim(spark)
    got = _drain(
        spark,
        sj.enriched_type_counts(sev.read_events_stream(spark, SF_ORACLE), dim),
        "t_enrich",
        mode="complete",
    )
    batch = sj.enriched_type_counts(load_table(spark, SF_ORACLE, "events"), dim)
    srows = sorted(map(tuple, got.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert srows == brows
