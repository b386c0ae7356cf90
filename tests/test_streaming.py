"""Streaming smoke tests: the true Structured Streaming plans must
produce the same results as their oracle-checked batch twins when fed
the same (bounded) data through a file source."""

from __future__ import annotations

import pytest

from parallel_inverted_index_map_reduce_spark.plans.registry import all_specs
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table
from parallel_inverted_index_map_reduce_spark.streaming import events as sev

from .conftest import SF_ORACLE


def _drain(spark, stream_df, name, mode="complete"):
    q = sev.run_to_memory(stream_df, name, output_mode=mode)
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark):
    stream = sev.tumbling_counts_stream(
        sev.read_events_stream(spark, SF_ORACLE)
    )
    got = _drain(spark, stream, "t_tumbling")
    batch = all_specs()["tumbling_hourly_stats"].fn(spark, SF_ORACLE)
    srows = sorted(map(tuple, got.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert srows == brows


def test_session_stream_matches_batch(spark):
    stream = sev.session_counts_stream(
        sev.read_events_stream(spark, SF_ORACLE)
    )
    got = _drain(spark, stream, "t_session")
    batch = all_specs()["session_window_stats"].fn(spark, SF_ORACLE)
    srows = sorted(map(tuple, got.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert srows == brows


def test_streaming_dedup_keeps_all_unique_ids(spark):
    stream = sev.dedup_stream(sev.read_events_stream(spark, SF_ORACLE))
    got = _drain(spark, stream, "t_dedup", mode="append")
    n_stream = got.count()
    n_batch = load_table(spark, SF_ORACLE, "events").select("event_id").distinct().count()
    assert n_stream == n_batch
