"""Text normalization column expressions (reference O4-O6).

Reference semantics (/root/reference/src/main.cpp:121-133): each
whitespace-delimited token is lowercased byte-wise and every
non-``isalpha`` byte deleted in place, so ``gable-ended`` -> ``gableended``,
``don't`` -> ``dont``, ``1832`` -> `` `` (dropped by the reducer's empty
check at main.cpp:175-177). Note the reference README says
"non-alphanumeric" but the code uses ``isalpha`` — digits are removed
too (SURVEY.md §4.3); the code is ground truth.

Everything here is a built-in column expression — JVM-side, inside
whole-stage codegen. No Python UDFs in this hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WHITESPACE_RE = r"\s+"
NON_ALPHA_RE = "[^a-z]"

# Python twins for the Arrow/driver-side paths (BPE segmenter, query
# normalization): Java's \s is ASCII-only ([ \t\n\x0B\f\r]) while
# Python's re \s is Unicode, so a literal r"\s+" in Python splits on
# e.g. U+00A0 (non-breaking space) where the JVM tokenizer does not — the class below IS
# Java's \s, keeping both sides of the engine on one tokenization rule.
PY_WHITESPACE_RE = "[ \t\n\x0b\f\r]+"
PY_NON_ALPHA_RE = NON_ALPHA_RE

# Whole-document strip class: every char that is neither [a-z] nor one
# of Java's \s chars. Removing these from the LOWERED full text, then
# splitting on \s+, is char-for-char equivalent to split-then-normalize
# per token (the class preserves exactly the \s separators, so token
# boundaries survive; a token of only stripped chars collapses into the
# surrounding separator run, which \s+ merges — same as the empty-token
# filter). Equivalence is pinned by tests/test_tokenization_edges.py
# and the full-corpus golden parity suite.
NON_ALPHA_NON_WS_RE = "[^a-z \t\n\x0b\f\r]"


def normalize_token(col: Column) -> Column:
    """lower + strip non-[a-z] — the reference's O4+O5 fused."""
    return F.regexp_replace(F.lower(col), NON_ALPHA_RE, "")


def tokenize(col: Column) -> Column:
    """Split a text column into raw whitespace-delimited tokens."""
    return F.split(col, WHITESPACE_RE)


def tokens_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode documents into normalized non-empty (doc_id, word) rows.

    This is the reference's map phase (O2+O4-O7): one narrow chain that
    Catalyst fuses into a single codegen stage. The input is spread to
    cluster parallelism first (sources/tables.py ``spread``) so the
    explode/normalize CPU work never serializes on a one-partition scan.

    Normalization runs ONCE per document, not once per token: lower +
    strip-non-[a-z\\s] on the whole text, THEN split/explode. The regex
    engine's per-call overhead dominates on short tokens — measured
    1.5x on the 500k-doc token build (BENCH_NOTES round 9) — and the
    whole-text form is provably identical to per-token normalize
    because the strip class spares exactly the \\s separator chars.
    """
    from ..sources.tables import spread

    docs = spread(docs, id_col)
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), NON_ALPHA_NON_WS_RE, "")
    return (
        docs.select(F.col(id_col), F.explode(F.split(cleaned, WHITESPACE_RE)).alias("word"))
        .where(F.col("word") != "")
    )
