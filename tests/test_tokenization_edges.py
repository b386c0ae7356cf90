"""Tokenization edge cases from FIXTURES.md §1.2, asserted against the
reference's semantics (/root/reference/src/main.cpp:121-133,175-177):
lowercase, strip every non-[a-z] byte (digits too — the code, not the
README, is ground truth), drop empty results, no token length limit."""

from __future__ import annotations

from parallel_inverted_index_map_reduce_spark.operators.index import build_index


def _index(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["word"]: (r["df"], list(r["postings"]))
        for r in build_index(docs).collect()
    }


def test_reference_normalization_semantics(spark):
    idx = _index(
        spark,
        [
            (1, "The THE the"),
            (2, "gable-ended don't St. 1832 ===== --"),
            (3, "x" * 150 + " the"),
        ],
    )
    assert idx["the"] == (2, [1, 3])  # lowercased; doc 2 has no 'the'
    assert idx["gableended"] == (1, [2])  # hyphen stripped, halves joined
    assert idx["dont"] == (1, [2])  # apostrophe stripped
    assert idx["st"] == (1, [2])  # trailing punct stripped
    assert "1832" not in idx and "" not in idx  # digits/punct-only dropped
    assert idx["x" * 150] == (1, [3])  # no 100-byte truncation (ref would overflow)


def test_repeated_word_one_posting(spark):
    idx = _index(spark, [(1, "echo echo echo"), (2, "echo")])
    assert idx["echo"] == (2, [1, 2])


def test_non_ascii_letters_are_stripped(spark):
    """SURVEY.md §4.3: the reference's tolower/isalpha on signed char is
    UB for non-ASCII bytes and its corpus is pre-cleaned ASCII; our
    defined semantics — normalization is regexp_replace(lower(t),
    '[^a-z]', '') — treats every non-ASCII letter as stripped, so
    accented words keep only their ASCII-letter skeleton."""
    idx = _index(
        spark,
        [
            (1, "naïve café über Γεια résumé"),
            (2, "naive cafe uber resume"),
        ],
    )
    assert idx["nave"] == (1, [1])  # ï stripped, not transliterated
    assert idx["caf"] == (1, [1])
    assert idx["ber"] == (1, [1])
    assert idx["rsum"] == (1, [1])
    assert "γεια" not in idx  # all-Greek token strips to empty: dropped
    # the ASCII twins are distinct words, never conflated
    assert idx["naive"] == (1, [2])
    assert idx["cafe"] == (1, [2])


def test_whitespace_variants(spark):
    idx = _index(spark, [(1, "a\tb\nc   d")])
    assert set(idx) == {"a", "b", "c", "d"}
    assert all(v == (1, [1]) for v in idx.values())
