"""Document chunking: token-window slices with overlap.

The complement of sequence packing: packing combines SHORT documents up
to a budget, chunking splits LONG documents down to one. Everything is
built-in array expressions — tokenize once, slice by index windows,
re-join — so the whole op stays in whole-stage codegen: no UDF, no
shuffle, 1:N row expansion via a single explode (Spark's Generate).

Overlap preserves context across chunk boundaries (a training-data
convention); stride = chunk_tokens - overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk): 0-indexed chunks in document
    order. Every token lands in >= 1 chunk; consecutive chunks share
    ``overlap`` tokens; the final chunk may be short (never empty);
    documents at or under ``chunk_tokens`` yield exactly one chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
    # chunk start indices: 0, stride, 2*stride, ..., ending at the last
    # stride multiple that still contributes NEW tokens. A window at s
    # only adds tokens past the previous window's coverage when
    # s < n - overlap, so the last start is
    # floor((n - overlap - 1) / stride) * stride — without this bound a
    # 25..32-token doc at (32, 8) would grow a second chunk fully
    # contained in the first.
    starts = F.sequence(
        F.lit(0),
        (
            F.greatest(F.lit(0), F.size(toks) - F.lit(overlap + 1))
            / F.lit(stride)
        ).cast("long")
        * F.lit(stride),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / F.lit(stride)).cast("long").alias("chunk_id"),
            F.slice(toks, s + 1, chunk_tokens).alias("toks"),
        ),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.toks").cast("long").alias("n_tokens"),
            F.array_join("c.toks", " ").alias("chunk"),
        )
        .where(F.col("n_tokens") > 0)  # empty docs produce no chunks
    )


def cdc_chunks(
    docs: DataFrame,
    window: int = 3,
    divisor: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk): CONTENT-DEFINED chunk
    boundaries over the token stream — the basic LBFS scheme
    (Muthitacharoen et al. 2001, "A low-bandwidth network file
    system"), token-granular: a boundary falls AFTER token i
    (i >= window) iff the md5-derived hash of the trailing
    ``window``-token string is divisible by ``divisor``. Expected chunk
    length ~= ``divisor`` tokens.

    Why content-defined: fixed-width chunking (chunk_documents) shifts
    every boundary after an insertion, so one edited token re-hashes
    the document's whole tail and defeats chunk-level dedup.  CDC
    boundaries depend only on a local window, so an edit perturbs at
    most the chunks overlapping it — the property blob/chunk dedup
    stores rely on.  This is the hash-only variant (no min/max clamp):
    min/max enforcement is an inherently sequential scan, while the
    pure divisibility rule stays a per-position predicate — fully
    declarative, and exactly reproducible in SQL (the registry
    oracle's formulation).

    Scale shape: staged projections — tokenize once, hash ``n`` window
    strings, derive boundary positions and segment slices as array
    expressions, one explode. No UDF, no shuffle. The staging is
    load-bearing, not cosmetic: higher-order lambdas evaluate
    INTERPRETED, re-computing any captured non-attribute subexpression
    per element — a lambda that captures the tokenize expression
    re-splits the document at every position, O(n^2) per doc (measured
    8x slower at sf0.1). Each stage therefore materializes what the
    next stage's lambdas capture (toks, then bps) as plain columns, so
    every lambda touches attributes only and the whole op stays O(n).
    """
    if window < 1 or divisor < 1:
        raise ValueError("need window >= 1 and divisor >= 1")
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"filter(split({text_col}, ' '), t -> t != '')").alias("toks"),
    )
    n = F.size("toks")
    # 1-based token positions where a chunk may END: hash the trailing
    # window and keep positions whose hash is divisible by `divisor`
    with_bps = staged.select(
        "doc_id",
        "toks",
        F.when(
            n >= window,
            F.filter(
                F.sequence(F.lit(window), n),
                lambda i: stable_hash32(
                    F.concat_ws(
                        "\x1f",
                        F.slice(F.col("toks"), i - window + 1, F.lit(window)),
                    )
                )
                % divisor
                == 0,
            ),
        )
        .otherwise(F.array().cast("array<int>"))
        .alias("bps"),
    )
    bounded = with_bps.select(
        "doc_id",
        "toks",
        F.concat(
            F.array(F.lit(1)), F.transform(F.col("bps"), lambda p: p + 1)
        ).alias("ss"),
        F.concat(F.col("bps"), F.array(F.size("toks"))).alias("es"),
    )
    # j-th segment = tokens[ss[j] .. es[j]]; a boundary exactly at the
    # last token leaves one trailing empty candidate, filtered below
    segs = F.transform(
        F.sequence(F.lit(1), F.size("ss")),
        lambda j: F.struct(
            (j - 1).cast("long").alias("chunk_id"),
            F.slice(
                F.col("toks"),
                F.element_at(F.col("ss"), j),
                F.element_at(F.col("es"), j) - F.element_at(F.col("ss"), j) + 1,
            ).alias("toks"),
        ),
    )
    return (
        bounded.select("doc_id", F.explode(segs).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.toks").cast("long").alias("n_tokens"),
            F.array_join("c.toks", " ").alias("chunk"),
        )
        .where(F.col("n_tokens") > 0)
    )
