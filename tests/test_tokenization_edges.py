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


def test_whole_text_normalize_equals_per_token(spark):
    """tokens_df and positional_tokens normalize once per DOCUMENT
    (lower + strip-[^a-z\\s] on the full text, then split). This pins
    the equivalence with the definitional per-token form on the nasty
    cases: separators adjacent to stripped chars, punct-only tokens
    between separators, boundary whitespace, vertical tab (in Java \\s)
    vs NBSP (not in Java \\s), and Greek final-sigma context-sensitive
    lowercasing (maps to non-ASCII either way, so the strip erases any
    context difference)."""
    from pyspark.sql import functions as F

    from parallel_inverted_index_map_reduce_spark.functions.text import (
        normalize_token,
        tokenize,
        tokens_df,
    )
    from parallel_inverted_index_map_reduce_spark.operators.index import (
        positional_tokens,
    )

    rows = [
        (1, "  leading and trailing  "),
        (2, "..a..b.. \x0b ...  c4d  nbsp\xa0glued e"),
        (3, "ΑΣ. ΣΙΓΜΑ fooΣ bar\tBAZ\n1832 ===== x--y"),
        (4, ""),
        (5, "...."),
        (6, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    per_token = (
        docs.select(
            "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        .select("doc_id", normalize_token(F.col("tok")).alias("word"))
        .where(F.col("word") != "")
    )
    got = tokens_df(docs)
    assert (
        got.exceptAll(per_token).count() == 0
        and per_token.exceptAll(got).count() == 0
    )

    # positional: the post-filter sequence (and so every position) must
    # match the per-token definition applied then filtered in order
    per_tok_pos = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.transform(tokenize(F.col("text")), normalize_token),
                    lambda w: w != F.lit(""),
                )
            ).alias("npos", "word"),
        )
    )
    got_pos = positional_tokens(docs).select("doc_id", "npos", "word")
    assert (
        got_pos.exceptAll(per_tok_pos).count() == 0
        and per_tok_pos.exceptAll(got_pos).count() == 0
    )
