"""Span-level cross-document dedup: canonical-keeps/copies-cut
semantics, overlap unioning, within-doc repeats untouched, and
partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import spandedup as sd

N = 5  # small span width keeps fixtures readable

SPAN = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens > N


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_copies_cut_canonical_kept(spark):
    rows = [
        (0, "one two three " + SPAN + " four five"),
        (1, "totally different words here " + SPAN),
        (2, "unrelated content only nothing shared among docs"),
    ]
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in sd.remove_duplicate_spans(_docs(spark, rows), n=N).collect()
    }
    # canonical doc 0 keeps everything (normalized join of its tokens)
    assert out[0] == (rows[0][1], 0)
    # doc 1 loses exactly the 7 shared tokens
    assert out[1] == ("totally different words here", 7)
    # untouched doc passes through
    assert out[2] == (rows[2][1], 0)


def test_within_doc_repeat_not_cut(spark):
    """A span repeated INSIDE one document is not cross-document
    duplication — the repetition filters own that case."""
    rows = [(0, SPAN + " filler words " + SPAN)]
    out = sd.remove_duplicate_spans(_docs(spark, rows), n=N).collect()[0]
    assert out["n_tokens_removed"] == 0


def test_overlapping_occurrences_union_their_cover(spark):
    """Two duplicated spans overlapping in the copy cut the union of
    their token ranges, not double-cut or miss the overlap."""
    # doc 1 contains tokens 0..9 of doc 0 (six overlapping 5-grams)
    base = "a b c d e f g h i j"
    rows = [
        (0, base + " unique tail for doc zero"),
        (1, "copy prefix " + base + " copy suffix"),
    ]
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in sd.remove_duplicate_spans(_docs(spark, rows), n=N).collect()
    }
    assert out[0][1] == 0
    assert out[1] == ("copy prefix copy suffix", 10)


def test_canonical_is_smallest_doc_then_pos(spark):
    """With three copies the smallest doc_id wins; the others cut."""
    rows = [(5, "x " + SPAN), (2, SPAN + " y"), (9, "z z " + SPAN)]
    out = {
        r["doc_id"]: r["n_tokens_removed"]
        for r in sd.remove_duplicate_spans(_docs(spark, rows), n=N).collect()
    }
    assert out == {2: 0, 5: 7, 9: 7}


def test_short_and_empty_docs_pass_through(spark):
    rows = [(0, "tiny doc"), (1, "12345 67890"), (2, SPAN), (3, SPAN + " q")]
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in sd.remove_duplicate_spans(_docs(spark, rows), n=N).collect()
    }
    assert out[0] == ("tiny doc", 0)
    # raw tokens are PRESERVED (digits are not span content but they
    # are corpus content — cutting must not rewrite survivors)
    assert out[1] == ("12345 67890", 0)
    # docs 2 and 3 share the span; smaller doc_id keeps it
    assert out[2] == (SPAN, 0)
    assert out[3] == ("q", 7)


def test_matching_is_normalized_but_cutting_is_raw(spark):
    """Spans match case/punctuation-insensitively (the engine's one
    normalization rule) but each occurrence cuts or keeps its OWN raw
    tokens — the canonical doc keeps its capitals and punctuation, and
    the copy's surviving tokens keep theirs."""
    rows = [
        (0, "Alpha, BETA gamma! delta (epsilon) zeta eta" + " tail0 $3.50"),
        (1, "Don't repeat: " + SPAN + " own-words 42"),
    ]
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in sd.remove_duplicate_spans(_docs(spark, rows), n=N).collect()
    }
    # doc 0 is canonical (its normalized span == doc 1's): untouched,
    # raw punctuation and case intact
    assert out[0] == (rows[0][1], 0)
    # doc 1 loses the 7 matching raw tokens, keeps its raw survivors
    assert out[1] == ("Don't repeat: own-words 42", 7)


def test_partition_invariant(spark):
    rows = [
        (i, f"prefix{i} " + (SPAN if i % 3 == 0 else f"own words {i} here"))
        for i in range(30)
    ]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, sd.remove_duplicate_spans(docs, n=N).collect()))
    b = sorted(
        map(tuple, sd.remove_duplicate_spans(docs.repartition(7), n=N).collect())
    )
    assert a == b
