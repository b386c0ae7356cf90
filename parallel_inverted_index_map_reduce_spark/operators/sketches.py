"""Count-min sketch over the token stream: mergeable frequency
estimates in fixed space.

The frequency twin of the engine's existing cardinality/quantile
sketches (KMV threshold sketches in plans/queries_relational2.py,
Spark-native HLL/KLL in tests/test_approx_sketches.py): estimate any
term's occurrence count from a d x w counter table (Cormode &
Muthukrishnan 2005), without keeping the full vocabulary.

Why it matters at 100 TB: the sketch BUILD is one groupBy over
(seed, slot) — d*w result rows regardless of corpus size — and two
sketches MERGE by slot-wise addition, so per-partition / per-day /
per-shard sketches roll up without touching the token stream again
(the same commutative-monoid property that makes partial aggregation
work). Estimates are one-sided: est >= true count always, and
est <= true + eps*N with probability 1-delta for w = e/eps, d =
ln(1/delta).

Everything is md5-based column expressions (identical across engines
and partitionings — the repo's standard determinism recipe), zero
Python in the build path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_df

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 256


def _slot(word_col, seed: int, width: int):
    """Deterministic hash slot: first 8 md5 hex chars of 'seed_word'
    as an unsigned int, mod width — the stable_hash32 recipe with a
    per-row-of-counters seed."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("_", F.lit(str(seed)), word_col)), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    docs: DataFrame, depth: int = DEFAULT_DEPTH, width: int = DEFAULT_WIDTH
) -> DataFrame:
    """(seed, slot, width, c): the count-min counter table for the
    corpus's token stream — at most depth*width rows, any corpus size.
    The sketch is SELF-DESCRIBING: width rides along as a column and
    depth is derivable from the seeds, so estimates can never silently
    probe with mismatched geometry."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    toks = tokens_df(docs)
    # ONE corpus scan: each token explodes into its depth (seed, slot)
    # coordinates (a union of per-seed projections would scan the token
    # stream depth times).
    coords = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(seed).alias("seed"),
                        _slot(F.col("word"), seed, width).alias("slot"),
                    )
                    for seed in range(depth)
                ]
            )
        ).alias("p")
    )
    return (
        coords.select("p.seed", "p.slot")
        .groupBy("seed", "slot")
        .agg(F.lit(width).alias("width"), F.count("*").alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Slot-wise sum — the mergeability that lets per-shard sketches
    roll up into a corpus sketch without re-reading any shard. Both
    sides must share a geometry; the carried width column makes a
    mismatch a loud error (grouping by width would silently keep the
    sketches apart, so it is checked instead)."""
    wa = {r["width"] for r in a.select("width").distinct().collect()}
    wb = {r["width"] for r in b.select("width").distinct().collect()}
    if wa != wb:
        raise ValueError(f"cannot merge sketches of widths {wa} and {wb}")
    return (
        a.unionByName(b)
        .groupBy("seed", "slot", "width")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(sketch: DataFrame, words: list[str]) -> DataFrame:
    """(word, est): min over the depth rows of each word's slot counter
    — an upper bound on the word's true occurrence count. The probe set
    is a tiny literal frame joined against the (bounded) sketch, so
    lookups never touch the corpus. Geometry (depth, width) is read
    FROM the sketch — a caller cannot probe with mismatched parameters
    and silently get zeros."""
    geom = sketch.agg(
        F.max("seed").alias("max_seed"), F.max("width").alias("width")
    ).first()
    if geom["max_seed"] is None:
        raise ValueError("empty sketch: no counter rows to probe")
    depth, width = int(geom["max_seed"]) + 1, int(geom["width"])
    spark = sketch.sparkSession
    probes = spark.createDataFrame([(w,) for w in words], "word string").select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(seed).alias("seed"),
                        _slot(F.col("word"), seed, width).alias("slot"),
                    )
                    for seed in range(depth)
                ]
            )
        ).alias("p"),
    ).select("word", "p.seed", "p.slot")
    return (
        probes.join(F.broadcast(sketch), ["seed", "slot"], "left")
        .na.fill({"c": 0})
        .groupBy("word")
        .agg(F.min("c").alias("est"))
    )


def frequent_terms(
    docs: DataFrame, k: int = 100, min_count: int | None = None
) -> DataFrame:
    """(word, n): every term with global count > N/k, with its EXACT
    count — distributed heavy hitters via per-partition Misra-Gries
    summaries (Misra & Gries 1982; the "space-saving" family).

    Three stages, none corpus-vocabulary-sized:

    1. Each partition streams its tokens through a k-counter
       Misra-Gries summary (Arrow ``mapInPandas``, counters dict per
       partition — O(k) state however many tokens pass).
    2. The surviving words union into a candidate set (at most
       k x partitions rows). COMPLETENESS is the pigeonhole argument:
       if a word's global count exceeds N/k, then on SOME partition its
       local count exceeds that partition's N_p/k (otherwise the sum
       could not exceed N/k), and Misra-Gries never evicts such a word
       from that partition's summary — so every global heavy hitter
       reaches the candidate set.
    3. One exact count of JUST the candidates (semi-join pushes the
       word filter into the token stream) removes the false positives
       Misra-Gries tolerates; the final threshold keeps count > N/k
       (or ``min_count`` when given).

    The full groupBy(word) this replaces shuffles the whole vocabulary;
    here the shuffle carries candidates only.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pandas as pd

    toks = tokens_df(docs)

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    # decrement-all: evict zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"word": list(counters.keys())})

    candidates = (
        toks.select("word")
        .mapInPandas(mg, "word string")
        .distinct()
    )
    exact = (
        toks.join(candidates, "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if min_count is not None:
        return exact.where(F.col("n") >= min_count)
    n_tokens = toks.count()
    return exact.where(F.col("n") > n_tokens / k)
