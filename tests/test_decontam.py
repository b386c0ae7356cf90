"""Train/eval decontamination: embedded eval text is flagged at full
containment, partial overlap respects the threshold, and clean
documents survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE

EVAL_TEXT = "the quick brown fox jumps over the lazy dog tonight"


def _corpora(spark):
    train = spark.createDataFrame(
        [
            # eval text verbatim inside a longer document: containment 1.0
            (1, "some preamble text here " + EVAL_TEXT + " and a closing line"),
            # roughly half the eval shingles (first 6 tokens)
            (2, "the quick brown fox jumps over a completely different river"),
            # clean
            (3, "entirely unrelated training content about mountains and seas"),
        ],
        ["doc_id", "text"],
    )
    eval_docs = spark.createDataFrame([(100, EVAL_TEXT)], ["doc_id", "text"])
    return train, eval_docs


def test_containment_flags_embedded_eval_text(spark):
    train, eval_docs = _corpora(spark)
    report = {
        r.train_id: (r.n_common, float(r.containment))
        for r in contamination_report(train, eval_docs, threshold=0.9).collect()
    }
    assert set(report) == {1}
    n_common, containment = report[1]
    assert containment == 1.0  # all 8 eval shingles present
    assert n_common == len(EVAL_TEXT.split()) - 2

    # at a mid threshold the partial-overlap doc is flagged too
    mid = {
        r.train_id
        for r in contamination_report(train, eval_docs, threshold=0.4).collect()
    }
    assert mid == {1, 2}


def test_decontaminate_removes_only_flagged(spark):
    train, eval_docs = _corpora(spark)
    kept = {r.doc_id for r in decontaminate(train, eval_docs, 0.9).collect()}
    assert kept == {2, 3}
    kept_mid = {r.doc_id for r in decontaminate(train, eval_docs, 0.4).collect()}
    assert kept_mid == {3}


def test_containment_exact_threshold_boundary(spark):
    """containment == threshold must flag: 3 of 30 shingles at
    threshold 0.1 (30 * 0.1 is 3.0000000000000004 in doubles — the
    decimal comparison must not let the boundary doc evade)."""
    eval_tokens = [f"e{i}" for i in range(32)]  # 30 distinct shingles
    eval_docs = spark.createDataFrame(
        [(100, " ".join(eval_tokens))], ["doc_id", "text"]
    )
    # first 5 eval tokens -> exactly shingles (e0 e1 e2), (e1 e2 e3),
    # (e2 e3 e4); the unique tail adds no shared shingles
    train = spark.createDataFrame(
        [(1, " ".join(eval_tokens[:5]) + " qq ww ee rr tt")],
        ["doc_id", "text"],
    )
    got = contamination_report(train, eval_docs, threshold=0.1).collect()
    assert len(got) == 1
    assert (got[0].n_common, float(got[0].containment)) == (3, 0.1)


def test_pipeline_decontaminates_pii_bearing_eval_text(spark):
    """The pipeline scrubs train text before decontamination, so the
    eval side must be scrubbed identically — a verbatim embedding of a
    PII-bearing benchmark prompt must still be flagged (regression:
    raw-eval shingles around masked tokens broke containment)."""
    from parallel_inverted_index_map_reduce_spark.pipeline import (
        prepare_training_data,
    )

    pii_eval = (
        "please email alice@example.com or call (555) 123-4567 about "
        "the quarterly report today before the deadline passes"
    )
    train = spark.createDataFrame(
        [
            (1, "some preamble " + pii_eval + " and a closing line"),
            (2, "entirely unrelated content about mountains and seas"),
        ],
        ["doc_id", "text"],
    )
    eval_docs = spark.createDataFrame([(100, pii_eval)], ["doc_id", "text"])
    kept = {
        r.doc_id
        for r in prepare_training_data(
            train, min_quality=0.0, eval_docs=eval_docs, contamination_threshold=0.8
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert kept == {2}


def test_pipeline_decontaminates_when_eval_set_given(spark):
    """The composed pipeline drops contaminated training docs before
    dedup when an eval set is supplied, and is unchanged without one."""
    from parallel_inverted_index_map_reduce_spark.pipeline import (
        prepare_training_data,
    )

    train, eval_docs = _corpora(spark)
    without = {
        r.doc_id
        for r in prepare_training_data(train, min_quality=0.0).select("doc_id").distinct().collect()
    }
    assert 1 in without  # no eval set: the contaminated doc flows through
    with_eval = {
        r.doc_id
        for r in prepare_training_data(
            train, min_quality=0.0, eval_docs=eval_docs, contamination_threshold=0.9
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert 1 not in with_eval and 3 in with_eval


def test_decontaminate_against_real_fixture_is_self_consistent(spark):
    """Using a slice of the documents table as the 'eval set', every
    eval member doc (identical text) must be flagged against itself at
    threshold 1.0, and survivors carry no full-containment pair."""
    docs = load_table(spark, SF_ORACLE, "documents").limit(200).cache()
    eval_docs = docs.where(F.col("doc_id") % 37 == 0)
    n_eval_shinglable = eval_docs.where(
        F.size(F.expr("filter(split(text, ' '), t -> t != '')")) >= 3
    ).count()
    report = contamination_report(docs, eval_docs, threshold=1.0)
    # every shinglable eval doc is contained in at least itself
    self_pairs = report.where(F.col("train_id") == F.col("eval_id"))
    assert self_pairs.count() == n_eval_shinglable
    clean = decontaminate(docs, eval_docs, threshold=1.0)
    assert clean.count() <= docs.count() - n_eval_shinglable
