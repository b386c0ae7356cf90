"""Positional index + phrase search (operators/index.py): hand-built
adjacency cases; the oracle-side equivalence (single-aggregation array
predicate vs n-way positional self-join) rides the boolean_search spec
in test_oracle_local.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.index import (
    phrase_search,
    positional_postings,
    positional_tokens,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _matches(spark, rows, phrase):
    return {
        r["doc_id"]: list(r["match_positions"])
        for r in phrase_search(_docs(spark, rows), phrase).collect()
    }


def test_positions_are_post_filter_adjacent(spark):
    # "1832" normalizes to empty and must NOT leave a position hole:
    # 'the' and 'fox' become adjacent
    got = sorted(
        (r["npos"], r["word"])
        for r in positional_tokens(_docs(spark, [(1, "The 1832 fox")])).collect()
    )
    assert got == [(0, "the"), (1, "fox")]
    assert _matches(spark, [(1, "The 1832 fox")], "the fox") == {1: [0]}


def test_hyphen_fusion_matches_reference_tokenizer(spark):
    rows = [(1, "the quick-brown fox")]
    assert _matches(spark, rows, "quickbrown fox") == {1: [1]}
    assert _matches(spark, rows, "quick brown") == {}


def test_overlapping_matches_all_reported(spark):
    rows = [(1, "a b a b a b")]
    assert _matches(spark, rows, "a b a") == {1: [0, 2]}


def test_repeated_word_in_phrase(spark):
    assert _matches(spark, [(1, "x x y"), (2, "x y x")], "x x") == {1: [0]}


def test_single_word_phrase_lists_every_occurrence(spark):
    assert _matches(spark, [(1, "q w q"), (2, "w w")], "q") == {1: [0, 2]}


def test_phrase_argument_is_normalized_like_the_corpus(spark):
    rows = [(1, "the quick-brown fox")]
    assert _matches(spark, rows, "  Quick-Brown   FOX! ") == {1: [1]}


def test_unnormalizable_phrase_raises(spark):
    with pytest.raises(ValueError, match="normalizes"):
        phrase_search(_docs(spark, [(1, "a b")]), "1832 42")


def test_positional_postings_shape(spark):
    rows = [(1, "b a b"), (2, "a a")]
    got = {
        (r["word"], r["doc_id"]): list(r["positions"])
        for r in positional_postings(_docs(spark, rows)).collect()
    }
    assert got == {
        ("b", 1): [0, 2],
        ("a", 1): [1],
        ("a", 2): [0, 1],
    }


def test_phrase_search_plan_is_one_aggregation(spark):
    """No window, no join: the phrase predicate is array logic over one
    grouped collect — the plan shape that scales."""
    plan = (
        phrase_search(_docs(spark, [(1, "a b c")]), "a b")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan, plan
