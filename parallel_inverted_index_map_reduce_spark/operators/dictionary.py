"""Dictionary encoding for the inverted index: dense integer word ids.

At 100 TB the index's word STRINGS dominate storage and shuffle width —
every posting row, every chunk, every merge carries the full term
bytes. The classic fix is a dictionary: assign each distinct word a
dense id, key the stored index by the id (8 bytes, fixed width,
dictionary- and delta-friendly in parquet), and join the dictionary
back only at presentation time.

Dense ids WITHOUT a global sort: a ``row_number`` over one global
ordering would funnel the whole vocabulary through a single partition
(the classic Window-without-PARTITION-BY scale bug). Instead ids reuse
the reference's own letter decomposition (`ref:` src/main.cpp:180-181's
26-way bucketing): rank words within their first-letter partition (a
parallel window), collect the per-letter vocabulary COUNTS (bounded by
the alphabet — the documented driver-scalar pattern, same as the
k-means centroids), and add the letter's cumulative offset. The result
is bijective, dense over [0, V), and globally ORDER-PRESERVING
(word_id order == lexicographic word order), so range scans over ids
correspond to prefix scans over terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_dictionary(index: DataFrame) -> DataFrame:
    """(word, word_id) for every distinct ``word`` in ``index`` —
    dense, bijective, lexicographically order-preserving ids."""
    # One materialization serves both the ranking job and the counts
    # collect: without it each would re-scan + re-distinct the whole
    # index (2x the build cost), and a nondeterministic upstream could
    # even hand the two jobs different row sets, breaking density.
    words = (
        index.select("word")
        .distinct()
        .withColumn("letter", F.substring("word", 1, 1))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("letter").orderBy("word")
    ranked = words.withColumn("rk", F.row_number().over(w))

    sizes = sorted(
        (r["letter"], r["n"])
        for r in words.groupBy("letter").agg(F.count("*").alias("n")).collect()
    )
    offsets: dict[str, int] = {}
    acc = 0
    for letter, n in sizes:
        offsets[letter] = acc
        acc += n
    offset_expr = None
    for letter, off in offsets.items():
        cond = F.col("letter") == letter
        offset_expr = (
            F.when(cond, F.lit(off))
            if offset_expr is None
            else offset_expr.when(cond, F.lit(off))
        )
    return ranked.select(
        "word",
        (offset_expr + F.col("rk") - 1).cast("long").alias("word_id"),
    )


def encode_index(index: DataFrame, dictionary: DataFrame) -> DataFrame:
    """The index keyed by word_id instead of the word string — the
    storage/shuffle form. The dictionary side broadcasts when small;
    at vocabulary scale Spark's AQE picks the shuffle join, and the
    join key is exactly the aggregation key, so no extra exchange of
    the posting data beyond the join itself."""
    return index.join(dictionary, "word").drop("word", "letter")


def decode_index(encoded: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Join the word strings (and their letter) back — presentation
    form, the exact inverse of :func:`encode_index` for every row."""
    return encoded.join(dictionary, "word_id").withColumn(
        "letter", F.substring("word", 1, 1)
    )
