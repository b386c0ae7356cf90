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
    # includes the ann_streamed part: the streamed snapshot must write
    # AND read back float64 vectors (regression: a pinned float schema
    # made a drifted snapshot unreadable)
    assert _compare(spark, drifted_dir, "ann_topk") > 0


def test_streamed_serving_survives_int32_doc_ids(spark, drifted_dir):
    """The bm25_streamed part on a drifted corpus: the snapshot
    normalizes int32 doc ids to its declared bigint at write time, so
    every committed version reads under the one ARTIFACTS schema."""
    assert _compare(spark, drifted_dir, "ranked_retrieval") > 0


def test_document_queries_tolerate_null_and_empty_text(spark, tmp_path):
    """Content drift, not type drift: a regenerated corpus could carry
    NULL or empty text rows. Every document-table query must stay
    cross-engine consistent on them (regression: a NULL payload crashed
    the multimodal Arrow batch before NULL text was defined as empty)."""
    d = str(tmp_path)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([None, "", "hello world hello"], pa.string()),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([0, 0, 17], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    import __spark_entry__ as entry

    q, o = entry.queries(), entry.oracle_sql()
    conn = duckdb.connect()
    conn.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    for name in (
        "postings_flat",
        "dedup_exact",
        "text_quality",
        "language_guess",
        "doc_fingerprints",
        "inverted_index",
        "simhash_fingerprints",
        "multimodal_features",
    ):
        sdf = q[name](spark, d)
        cols = sorted(sdf.columns)
        srows = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
        rel = conn.sql(o[name])
        idx = [rel.columns.index(c) for c in sorted(rel.columns)]
        drows = sorted(tuple(str(r[i]) for i in idx) for r in rel.fetchall())
        assert cols == sorted(rel.columns), name
        assert srows == drows, f"{name} diverges on null/empty text"


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


def test_corpus_diff_statuses(spark):
    from parallel_inverted_index_map_reduce_spark.operators.maintenance import (
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "going away")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    # identical snapshots are provably all-unchanged
    same = {r["status"] for r in corpus_diff(old, old).collect()}
    assert same == {"unchanged"}

    # NULL content is PRESENCE, not absence: a null-text doc in both
    # snapshots is unchanged; null -> text is changed — never 'added'
    o2 = spark.createDataFrame([(7, None), (8, None)], "doc_id long, text string")
    n2 = spark.createDataFrame([(7, "now extracted"), (8, None)], "doc_id long, text string")
    got2 = {r["doc_id"]: r["status"] for r in corpus_diff(o2, n2).collect()}
    assert got2 == {7: "changed", 8: "unchanged"}
