"""Corpus-level BPE (byte-pair-encoding) vocabulary training,
DataFrame-native.

The missing third tokenization mode: textstats counts whitespace and
BPE-ish pretokenizer tokens with FIXED rules; a real LLM data pipeline
also needs to LEARN a subword vocabulary from the corpus (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units" — the standard BPE training loop).

Scale shape — the part that matters at 100 TB:

- ONE corpus-scale pass: ``groupBy(word).count()`` collapses the corpus
  to its distinct-word frequency table. Everything after runs on that
  vocabulary-scale table (millions of rows, not trillions of tokens) —
  this is exactly how production BPE trainers work, and it is what
  makes corpus size irrelevant to the loop cost.
- Each merge round is one aggregation over the vocab table: explode
  adjacent symbol pairs weighted by word count, sum per pair, take the
  argmax (TakeOrdered — count desc, then (left, right) asc so ties are
  total and deterministic), then rewrite only the words that contain
  the winning pair with a per-row greedy left-to-right fold (codegen
  ``aggregate``, zero shuffle). Lineage is truncated per round with
  localCheckpoint, same as the connected-components loop.
- The driver holds only the merge list (n_merges small structs) and a
  per-round argmax row — never data.

Application (:func:`apply_bpe`) is per-row string processing over the
learned merge list — the documented Arrow path (``mapInPandas``), since
chaining 10s of merge folds into one codegen expression tree is the
wrong trade (compile-time blowup for zero runtime win).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_df


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): the corpus collapsed to distinct normalized words —
    the single corpus-scale aggregation of the whole trainer."""
    return (
        tokens_df(docs, text_col=text_col)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_once(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into
    left+right — one codegen fold, no shuffle. 'aaa' under (a,a)
    becomes [aa, a], matching the reference trainer."""
    # A token created by THIS fold (left+right) can never falsely
    # re-merge as a left side: len(left+right) > len(left), so the
    # last==left test alone gives the correct greedy non-overlapping
    # semantics.
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame, n_merges: int = 32, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    list [(left, right, pair_count), ...] in learned order.

    Deterministic under any partitioning: the argmax orders by
    (count desc, left asc, right asc). Stops early if no adjacent pair
    remains (fully merged vocabulary).
    """
    vocab = word_frequencies(docs, text_col).select(
        F.split(F.col("word"), "").alias("sym"), "n"
    )
    vocab = vocab.localCheckpoint(eager=False)

    def adjacent(fn):
        """Map fn over each adjacent (l, r) symbol pair of a word —
        zip the array against itself shifted by one."""
        return F.zip_with(
            F.slice(F.col("sym"), 1, F.size("sym") - 1),
            F.slice(F.col("sym"), 2, F.size("sym") - 1),
            fn,
        )

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = vocab.where(F.size("sym") >= 2).select(
            F.explode(
                adjacent(
                    lambda l, r: F.struct(l.alias("l"), r.alias("r"))
                )
            ).alias("p"),
            "n",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, count = top[0]["p"]["l"], top[0]["p"]["r"], top[0]["c"]
        merges.append((left, right, int(count)))
        # rewrite only the words that contain the winning pair — the
        # untouched majority passes through column-identical
        has_pair = (F.size("sym") >= 2) & F.exists(
            adjacent(
                lambda l, r: (l == F.lit(left)) & (r == F.lit(right))
            ),
            lambda b: b,
        )
        # Checkpoint EVERY round: the merge projection references `sym`
        # several times (the has_pair guard plus the fold), so stacking
        # unmaterialized rounds multiplies the expression tree per round
        # — a handful of stacked rounds already wedges the analyzer.
        # Storage does not accumulate across thousands of rounds:
        # rebinding `vocab` drops the only reference to the previous
        # checkpoint, and Spark's ContextCleaner reclaims its blocks as
        # those refs are collected, so live copies stay ~O(1).
        vocab = vocab.select(
            F.when(has_pair, _merge_once(F.col("sym"), left, right))
            .otherwise(F.col("sym"))
            .alias("sym"),
            "n",
        ).localCheckpoint(eager=False)
    return merges


def merges_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merges as a rank-ordered DataFrame (the persistable
    artifact: write it next to the corpus, read it back to tokenize)."""
    rows = [
        (i, left, right, count) for i, (left, right, count) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "merge_rank long, left string, right string, pair_count long"
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bpe_tokens, bpe_tokens): tokenize each document with
    the learned merge list (applied in learned order per word — the
    standard greedy BPE segmenter). Arrow-batched ``mapInPandas``:
    per-row string processing over a driver-broadcast merge list is the
    documented Python-is-OK shape (cf. operators/packing.py).
    """
    import pandas as pd

    from ..functions.text import PY_NON_ALPHA_RE, PY_WHITESPACE_RE

    ordered = [(left, right) for left, right, _ in merges]

    def segment(word: str) -> list[str]:
        syms = list(word)
        for left, right in ordered:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        return syms

    norm = docs.select(
        "doc_id", F.col(text_col).alias("text")
    )

    def run(batches):
        import re

        # The Python twins of the JVM tokenizer (functions/text.py):
        # a literal \s here would be Unicode-wide and split words the
        # trainer saw as one token.
        ws = re.compile(PY_WHITESPACE_RE)
        non_alpha = re.compile(PY_NON_ALPHA_RE)
        # word -> segmentation memo: corpora are Zipfian, so the top few
        # thousand words cover most occurrences — without the memo the
        # full O(n_merges * len(word)) fold reruns per OCCURRENCE. The
        # cache lives for the task (all its batches) and is bounded by
        # the task's distinct-word count.
        memo: dict[str, list[str]] = {}

        def segmented(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = memo[w] = segment(w)
            return got

        for pdf in batches:
            toks: list[list[str]] = []
            for text in pdf["text"].fillna(""):
                words = [
                    w
                    for w in (
                        non_alpha.sub("", t.lower()) for t in ws.split(text)
                    )
                    if w
                ]
                flat: list[str] = []
                for w in words:
                    flat.extend(segmented(w))
                toks.append(flat)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bpe_tokens": [len(t) for t in toks],
                    "bpe_tokens": [" ".join(t) for t in toks],
                }
            )

    return norm.mapInPandas(
        run, "doc_id long, n_bpe_tokens long, bpe_tokens string"
    )
