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
    assert q.awaitTermination(420), "stream did not finish within 420s"
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark):
    from pyspark.sql import functions as F

    stream = sev.tumbling_counts_stream(
        sev.read_events_stream(spark, SF_ORACLE)
    )
    got = _drain(spark, stream, "t_tumbling").withColumn(
        "sum_value", F.col("sum_value").cast("string")
    )
    batch = (
        all_specs()["time_window_stats"].fn(spark, SF_ORACLE)
        .where(F.col("win_kind") == "tumbling")
        .drop("win_kind")
    )
    srows = sorted(map(tuple, got.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert srows == brows


def test_sliding_stream_matches_batch(spark):
    from pyspark.sql import functions as F

    stream = sev.sliding_counts_stream(
        sev.read_events_stream(spark, SF_ORACLE)
    )
    got = _drain(spark, stream, "t_sliding")
    batch = (
        all_specs()["time_window_stats"].fn(spark, SF_ORACLE)
        .where(F.col("win_kind") == "sliding")
        .select("win_start", "n_events")
    )
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


def test_stateful_running_totals(spark):
    """Custom applyInPandasWithState operator: cumulative per-type
    totals must equal the batch aggregate after draining the stream."""
    from pyspark.sql import functions as F

    from parallel_inverted_index_map_reduce_spark.streaming import stateful

    stream = stateful.running_totals_per_type(
        sev.read_events_stream(spark, SF_ORACLE)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish within 420s"
    # update mode emits one row per key per batch; cumulative state means
    # the max n_events row per key is the final answer
    got = {}
    for r in spark.sql("SELECT * FROM t_stateful").collect():
        cur = got.get(r.event_type)
        if cur is None or r.n_events > cur[0]:
            got[r.event_type] = (r.n_events, round(r.sum_value, 6))
    batch = {
        r.event_type: (r.n, round(r.s, 6))
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(batch)
    for k in batch:
        assert got[k][0] == batch[k][0], k
        assert abs(got[k][1] - batch[k][1]) < 1e-4, k
