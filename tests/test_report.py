"""Corpus profiling report: values check out against direct
computations, and label shares cover every source/lang."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.functions.text import tokens_df
from parallel_inverted_index_map_reduce_spark.operators.report import corpus_report
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def test_report_values_match_direct_computations(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    rep = {r["metric"]: r["value"] for r in corpus_report(docs).collect()}

    assert int(rep["n_docs"]) == docs.count()
    toks = tokens_df(docs)
    assert int(rep["n_tokens"]) == toks.count()
    assert int(rep["n_distinct_words"]) == toks.select("word").distinct().count()
    n_distinct_texts = docs.select("text").distinct().count()
    assert int(rep["exact_dup_docs"]) == docs.count() - n_distinct_texts

    # quantiles are monotone and within the observed length range
    lens = [int(rep[f"len_p{q}"]) for q in (25, 50, 75, 95)]
    assert lens == sorted(lens)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    lo, hi = dl.agg(F.min("dl"), F.max("dl")).first()
    assert lo <= lens[0] and lens[-1] <= hi

    # per-source shares cover every source and sum to n_docs
    src_rows = {k: int(v) for k, v in rep.items() if k.startswith("source=")}
    assert sum(src_rows.values()) == docs.count()
    assert len(src_rows) == docs.select("source").distinct().count()

    assert 0.0 <= float(rep["quality_p50"]) <= 1.0


def test_report_without_label_columns(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    rep = corpus_report(docs)
    metrics = [r["metric"] for r in rep.collect()]
    assert "n_docs" in metrics
    assert not any(m.startswith(("lang=", "source=")) for m in metrics)
    # one schema, scalar-typed
    assert rep.schema.simpleString() == "struct<metric:string,value:string>"


def test_corpus_checks_flags_each_violation_kind(spark):
    from parallel_inverted_index_map_reduce_spark.operators.report import (
        corpus_checks,
    )

    healthy = load_table(spark, SF_ORACLE, "documents")
    ok = {r["check"]: int(r["n_violations"]) for r in corpus_checks(healthy).collect()}
    assert set(ok) == {
        "null_doc_id", "duplicate_doc_id", "null_text", "empty_text",
        "oversize_text",
    }
    assert all(v == 0 for v in ok.values()), ok

    dirty = spark.createDataFrame(
        [
            (1, "fine"),
            (1, "dup id"),
            (None, "no id"),
            (2, None),
            (3, "\t\n "),  # tab/newline-only: the TOKENIZER's whitespace
            (4, "x" * 1_000_001),
        ],
        ["doc_id", "text"],
    )
    got = {r["check"]: int(r["n_violations"]) for r in corpus_checks(dirty).collect()}
    assert got == {
        "null_doc_id": 1,
        "duplicate_doc_id": 1,
        "null_text": 1,
        "empty_text": 1,
        "oversize_text": 1,
    }
