"""Span-level exact dedup: remove repeated n-token spans ACROSS
documents (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" — their ExactSubstr variant, re-expressed over
word n-grams instead of a suffix array).

The missing granularity between document-level dedup (exact / MinHash /
SimHash / clusters, operators/dedup.py + components.py) and
within-document repetition filters (textstats repetition_stats):
boilerplate paragraphs, license headers, and quoted passages duplicate
ACROSS documents that are nowhere near doc-level duplicates. The
production rule is: keep the first occurrence, cut every other
document's copy.

Semantics (deterministic, total):

- a span = n consecutive normalized tokens; spans are compared by
  content (md5-backed hash), position-independent;
- a span is DUPLICATED iff it occurs in >= 2 distinct documents
  (within-one-doc repeats are the repetition filters' job, not cut
  here);
- the CANONICAL occurrence is the smallest (doc_id, pos); the
  canonical document keeps all its tokens — only other documents'
  occurrences are cut;
- cutting removes every token covered by some duplicated, non-canonical
  span occurrence; overlapping occurrences union their cover.

Scale shape: gram hashing is a narrow array pipeline fused into the
scan (no window); the only corpus-scale shuffles are the gram groupBy
(stats per distinct gram) and the removal join back to occurrences.
Cover computation is a per-row array fold over the doc's own cut
intervals — zero shuffle. Like all repo dedup, md5-hashed and
deterministic under any partitioning.

Known artifact (shared with ExactSubstr): cutting a span can abut the
remaining text into NEW n-grams that did not exist before, so the pass
is not idempotent in pathological cases; production pipelines run it
once (or to a fixpoint if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32
from ..functions.text import normalize_token, tokenize
from ..sources.tables import spread


def _tok_array(text_col):
    return F.filter(
        F.transform(tokenize(text_col), normalize_token),
        lambda w: w != F.lit(""),
    )


def span_grams(docs: DataFrame, n: int = 20) -> DataFrame:
    """(doc_id, pos, gram_hash): the hash of each n-token span at each
    start position — narrow array pipeline, fused into the scan."""
    if n < 2:
        raise ValueError(f"span width must be >= 2, got {n}")
    toks = spread(docs).select("doc_id", _tok_array(F.col("text")).alias("tks"))
    grams = F.when(
        F.size("tks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("tks") - n),
            lambda i: stable_hash32(
                F.concat_ws(" ", F.slice(F.col("tks"), i + 1, n))
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return toks.select("doc_id", F.posexplode(grams).alias("pos", "gram_hash"))


def duplicate_span_occurrences(docs: DataFrame, n: int = 20) -> DataFrame:
    """(doc_id, pos): every occurrence of a cross-document duplicated
    span OUTSIDE its canonical document — the cut list."""
    grams = span_grams(docs, n)
    stats = grams.groupBy("gram_hash").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    )
    dups = stats.where(F.col("n_docs") >= 2).select(
        "gram_hash", F.col("first.doc_id").alias("canon_doc")
    )
    return (
        grams.join(dups, "gram_hash")
        .where(F.col("doc_id") != F.col("canon_doc"))
        .select("doc_id", "pos")
    )


def remove_duplicate_spans(docs: DataFrame, n: int = 20) -> DataFrame:
    """(doc_id, text, n_tokens_removed): each document re-assembled in
    normalized token space with every duplicated non-canonical span's
    tokens cut (occurrence at pos covers [pos, pos+n); overlaps union).

    Documents with nothing to cut pass through with their normalized
    token stream intact — output text is ALWAYS the normalized
    single-space join, so downstream operators see one consistent
    token space.
    """
    cuts = (
        duplicate_span_occurrences(docs, n)
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("cut_starts"))
    )
    toks = spread(docs).select(
        "doc_id", _tok_array(F.col("text")).alias("tks")
    )
    joined = toks.join(cuts, "doc_id", "left").withColumn(
        "cut_starts",
        F.coalesce("cut_starts", F.array().cast("array<int>")),
    )
    # sequence(0, -1) would yield [0, -1] (Spark auto-negates the step),
    # so the empty token array needs its own branch
    covered = F.when(
        F.size("tks") > 0,
        F.transform(
            F.sequence(F.lit(0), F.size("tks") - 1),
            lambda i: F.exists(
                F.col("cut_starts"),
                lambda s: (i >= s) & (i < s + F.lit(n)),
            ),
        ),
    ).otherwise(F.array().cast("array<boolean>"))
    kept = F.zip_with(
        F.col("tks"),
        covered,
        lambda t, c: F.when(~c, t),
    )
    surviving = F.filter(kept, lambda t: t.isNotNull())
    return joined.select(
        "doc_id",
        F.array_join(surviving, " ").alias("text"),
        (F.size("tks") - F.size(surviving)).cast("long").alias(
            "n_tokens_removed"
        ),
    )
