"""Testdata physical types change between rounds (events.ts was
TIMESTAMP(NANOS) in round 1, timestamp[us] in round 2); the sources
must adapt instead of assuming last round's schema. This synthesizes
an 'evolved' testdata dir — int32 doc ids, nanosecond event
timestamps, float64 embeddings — and proves the engine's queries still
agree with DuckDB over the SAME mutated files."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def drifted_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("drifted_sf"))
    for name in ("documents", "events", "embeddings", "lineitem"):
        t = pq.read_table(os.path.join(SF_ORACLE, f"{name}.parquet"))
        if name == "documents":
            # doc_id shrinks to int32 (a plausible regeneration choice)
            idx = t.schema.get_field_index("doc_id")
            t = t.set_column(
                idx, "doc_id", t.column("doc_id").cast(pa.int32())
            )
        elif name == "events":
            # ts back to nanosecond precision (the round-1 shape);
            # version>=2.6 keeps TIMESTAMP(NANOS) instead of coercing
            idx = t.schema.get_field_index("ts")
            t = t.set_column(
                idx, "ts", t.column("ts").cast(pa.timestamp("ns"))
            )
            pq.write_table(t, os.path.join(out, f"{name}.parquet"), version="2.6")
            continue
        elif name == "embeddings":
            idx = t.schema.get_field_index("embedding")
            t = t.set_column(
                idx,
                "embedding",
                t.column("embedding").cast(pa.list_(pa.float64())),
            )
        pq.write_table(t, os.path.join(out, f"{name}.parquet"))
    return out


def _compare(spark, drifted_dir, name):
    import __spark_entry__ as entry

    q, o = entry.queries(), entry.oracle_sql()
    conn = duckdb.connect()
    for t in ("documents", "events", "embeddings", "lineitem"):
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{drifted_dir}/{t}.parquet'"
        )
    sdf = q[name](spark, drifted_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
    rel = conn.sql(o[name])
    idx = [rel.columns.index(c) for c in sorted(rel.columns)]
    assert cols == sorted(rel.columns), (name, cols, sorted(rel.columns))
    drows = sorted(tuple(str(r[i]) for i in idx) for r in rel.fetchall())
    assert srows == drows, f"{name}: spark/duckdb diverge on drifted types"
    return len(srows)


def test_queries_survive_int32_doc_ids(spark, drifted_dir):
    assert _compare(spark, drifted_dir, "postings_flat") > 0
    assert _compare(spark, drifted_dir, "dedup_exact") > 0


def test_queries_survive_nanos_timestamps(spark, drifted_dir):
    assert _compare(spark, drifted_dir, "time_window_stats") > 0


def test_queries_survive_float64_embeddings(spark, drifted_dir):
    assert _compare(spark, drifted_dir, "ann_topk") > 0


def test_pipeline_survives_int32_doc_ids(spark, drifted_dir):
    """The training pipeline end-to-end on int32 ids — the packer's
    composite key casts to long instead of shifting raw int32 bits."""
    from parallel_inverted_index_map_reduce_spark.pipeline import (
        prepare_training_data,
    )
    from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

    docs = load_table(spark, drifted_dir, "documents")
    packed = prepare_training_data(docs, min_quality=0.0, languages=())
    n = packed.count()
    assert n > 0
    assert packed.select("doc_id", "chunk_id").distinct().count() == n
