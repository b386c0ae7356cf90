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
