"""BPE vocabulary training: the Spark trainer must reproduce a
pure-Python reference implementation merge-for-merge, be invariant to
partitioning, and the Arrow-batched segmenter must agree with applying
the merges by hand."""

from __future__ import annotations

import re
from collections import Counter

from parallel_inverted_index_map_reduce_spark.operators import bpe

DOCS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new newer"),
    (2, "wide wider widest low new"),
    (3, "low new lower newer widest"),
]


def _ref_words(docs):
    words = Counter()
    for _, text in docs:
        for t in re.split(r"\s+", text):
            w = re.sub("[^a-z]", "", t.lower())
            if w:
                words[w] += 1
    return words


def _ref_merge_word(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _ref_train(docs, n_merges):
    words = _ref_words(docs)
    vocab = {w: (list(w), n) for w, (n) in words.items()}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, n in vocab.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        # max count, ties to lexicographically smallest (left, right)
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, c))
        vocab = {
            w: (_ref_merge_word(syms, left, right), n)
            for w, (syms, n) in vocab.items()
        }
    return merges


def test_trainer_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = bpe.train_bpe(docs, n_merges=12)
    want = _ref_train(DOCS, 12)
    assert got == want, (got, want)


def test_trainer_partition_invariant(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    base = bpe.train_bpe(docs, n_merges=8)
    assert bpe.train_bpe(docs.repartition(7), n_merges=8) == base
    assert bpe.train_bpe(docs.coalesce(1), n_merges=8) == base


def test_trainer_stops_when_fully_merged(spark):
    docs = spark.createDataFrame([(0, "ab ab ab")], ["doc_id", "text"])
    merges = bpe.train_bpe(docs, n_merges=10)
    # one merge fuses the only word into a single symbol; loop stops
    assert merges == [("a", "b", 3)]


def test_apply_bpe_matches_reference_segmentation(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    merges = bpe.train_bpe(docs, n_merges=10)

    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["bpe_tokens"])
        for r in bpe.apply_bpe(docs, merges).collect()
    }
    for doc_id, text in DOCS:
        toks = []
        for t in re.split(r"\s+", text):
            w = re.sub("[^a-z]", "", t.lower())
            if not w:
                continue
            syms = list(w)
            for left, right, _ in merges:
                syms = _ref_merge_word(syms, left, right)
            toks.extend(syms)
        assert got[doc_id] == (len(toks), " ".join(toks)), doc_id


def test_merges_table_roundtrip(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    merges = bpe.train_bpe(docs, n_merges=5)
    tbl = bpe.merges_table(spark, merges)
    rows = sorted(map(tuple, tbl.collect()))
    assert rows == [
        (i, left, right, c) for i, (left, right, c) in enumerate(merges)
    ]


def test_train_apply_agree_on_unicode_whitespace(spark):
    """U+00A0 is NOT whitespace to the JVM tokenizer (Java \\s is
    ASCII-only): 'foo\\u00a0bar' is ONE word 'foobar' on the train side,
    and the Python segmenter must see the same word — a literal \\s+ in
    Python (Unicode-wide) would split it and segment across a boundary
    the trainer never saw."""
    nbsp = "\u00a0"
    docs = spark.createDataFrame(
        [(0, f"foo{nbsp}bar foo{nbsp}bar baz")], ["doc_id", "text"]
    )
    wf = {r["word"]: r["n"] for r in bpe.word_frequencies(docs).collect()}
    assert wf == {"foobar": 2, "baz": 1}

    merges = bpe.train_bpe(docs, n_merges=4)
    row = bpe.apply_bpe(docs, merges).collect()[0]
    want = []
    for w in ["foobar", "foobar", "baz"]:
        syms = list(w)
        for left, right, _ in merges:
            syms = _ref_merge_word(syms, left, right)
        want.extend(syms)
    assert (row["n_bpe_tokens"], row["bpe_tokens"]) == (
        len(want),
        " ".join(want),
    )
