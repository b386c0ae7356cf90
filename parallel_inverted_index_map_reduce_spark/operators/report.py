"""One-call corpus profiling: the stats report a data pipeline runs
before committing compute to a corpus.

Composes the engine's tested operators into a single (metric, value)
DataFrame — document/token/vocab counts, length quantiles, quality and
language mix, exact-duplicate rate, and per-source share. Everything is
aggregation-shaped (no joins back to the corpus, no collect of data
rows); the report frame itself is a few dozen rows whatever the corpus
size.

Values render as strings so the report has ONE schema regardless of
metric type — the same scalar-typing rule the query registry follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_df
from .textstats import quality_scores


def _kv(df: DataFrame, metric, value) -> DataFrame:
    return df.select(
        metric.alias("metric"), value.cast("string").alias("value")
    )


def disc_quantiles(vals: DataFrame, col: str, ps: dict[str, float]) -> DataFrame:
    """EXACT discrete quantiles as (metric, value) rows — the smallest
    element whose cumulative count reaches ceil(p * n), which is
    DuckDB's ``quantile_disc`` rule (calibrated empirically, round 8).

    Round-8 replacement for percentile_approx here: the approx sketch
    is only exact while n stays under its accuracy parameter (10,000
    by default) — the sf1 spot-check caught quality_p50 drifting at
    50,000 docs, the exact failure mode of a bound the driver's sf0.01
    fixture can never reach.

    Scale shape: ONE groupBy collapses the corpus to its distinct
    VALUES, and everything after runs on that value-domain-sized frame
    — doc lengths (bounded by the longest document) and 6-decimal
    scores in [0, 1] (at most ~10^6 values) stay tiny however many
    rows the corpus has. The single-partition cumulative window is
    over THAT bounded frame, never corpus rows — the same bounded-
    domain argument as the 26-letter sink, not a scale leak. All
    requested quantiles come out of ONE aggregation over it.
    """
    from pyspark.sql import Window

    counts = vals.groupBy(col).agg(F.count("*").alias("c"))
    w_cum = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        F.col(col),
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    picks = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(p) * F.col("n")),
                    F.col(col),
                )
            ).alias(m)
            for m, p in ps.items()
        ]
    )
    labels = list(ps)
    return picks.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(m) for m in labels]).alias("m"),
                F.array(*[F.col(m).cast("string") for m in labels]).alias(
                    "v"
                ),
            )
        ).alias("z")
    ).select(F.col("z.m").alias("metric"), F.col("z.v").alias("value"))


def corpus_report(docs: DataFrame) -> DataFrame:
    """(metric, value) rows profiling the corpus.

    Metrics: n_docs, n_tokens, n_distinct_words, exact_dup_docs,
    len_p25/p50/p75/p95 (EXACT token-length quantiles via the
    value-domain cumulative pass — see :func:`disc_quantiles`),
    quality_p50, share per language (lang=<x>) and per source
    (source=<x>) when those columns exist.
    """
    toks = tokens_df(docs)

    # ONE token-stream scan feeds the whole length family: doclen is a
    # docs-sized frame materialized once (localCheckpoint), and
    # n_tokens is its sum — without this, n_tokens plus each of the
    # four quantiles would re-derive doclen from the full token stream
    # (five corpus-scale scans for one metric family).
    doclen = (
        toks.groupBy("doc_id").agg(F.count("*").alias("dl")).localCheckpoint()
    )

    parts: list[DataFrame] = [
        _kv(docs.agg(F.count("*").alias("v")), F.lit("n_docs"), F.col("v")),
        _kv(
            doclen.agg(F.coalesce(F.sum("dl"), F.lit(0)).alias("v")),
            F.lit("n_tokens"),
            F.col("v"),
        ),
        _kv(
            toks.agg(F.countDistinct("word").alias("v")),
            F.lit("n_distinct_words"),
            F.col("v"),
        ),
        _kv(
            docs.groupBy(F.md5(F.col("text").cast("binary")))
            .agg(F.count("*").alias("n"))
            .agg(F.sum(F.col("n") - 1).alias("v")),
            F.lit("exact_dup_docs"),
            F.coalesce(F.col("v"), F.lit(0)),
        ),
    ]

    # All four length quantiles from the value-domain cumulative pass
    # (EXACT at any corpus size — see disc_quantiles).
    parts.append(
        disc_quantiles(
            doclen, "dl", {f"len_p{q}": q / 100.0 for q in (25, 50, 75, 95)}
        )
    )

    # quantile over the DECIMAL(18,6) score, not the double: the disc
    # quantile returns an actual element, and a fixed-scale decimal
    # element renders identically in every engine (plans/exprs.py) —
    # double would re-enter the cross-engine cast minefield for zero
    # benefit.
    parts.append(
        disc_quantiles(
            quality_scores(docs).select(
                F.col("quality_score").cast("decimal(18,6)").alias("q6")
            ),
            "q6",
            {"quality_p50": 0.5},
        )
    )

    for col, prefix in (("lang", "lang"), ("source", "source")):
        if col in docs.columns:
            parts.append(
                docs.groupBy(col)
                .agg(F.count("*").alias("n"))
                .select(
                    F.concat(F.lit(prefix + "="), F.col(col)).alias("metric"),
                    F.col("n").cast("string").alias("value"),
                )
            )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def corpus_checks(docs: DataFrame) -> DataFrame:
    """(check, n_violations) data-quality gates — the invariants a
    pipeline asserts before committing compute to a corpus snapshot
    (the dbt-test / expectations pattern, aggregation-shaped like the
    report: a handful of output rows whatever the corpus size).

    Checks: null_doc_id, duplicate_doc_id (rows beyond the first per
    id), null_text, empty_text (whitespace-only by the TOKENIZER's
    whitespace rule — a tab/newline-only doc yields zero tokens and
    must flag), oversize_text (> 1M chars — a likely extraction bug,
    not prose). A healthy corpus reports 0 for every row; callers gate
    on ``max(n_violations) == 0``.

    Cost: ONE corpus aggregation for the four row-level checks
    (conditional counts as columns, exploded into labeled rows — the
    same one-pass rule as the report's quantiles) plus the duplicate
    groupBy. Never five scans.
    """
    from ..functions.text import WHITESPACE_RE

    txt = F.col("text")
    blank = F.regexp_replace(txt, WHITESPACE_RE, "") == ""
    one = docs.agg(
        F.count(F.when(F.col("doc_id").isNull(), 1)).alias("null_doc_id"),
        F.count(F.when(txt.isNull(), 1)).alias("null_text"),
        F.count(F.when(txt.isNotNull() & blank, 1)).alias("empty_text"),
        F.count(F.when(F.length(txt) > 1_000_000, 1)).alias("oversize_text"),
    )
    labels = list(one.columns)
    row_checks = one.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(c) for c in labels]).alias("m"),
                F.array(*[F.col(c).cast("string") for c in labels]).alias("v"),
            )
        ).alias("z")
    ).select(
        F.col("z.m").alias("check"), F.col("z.v").alias("n_violations")
    )
    dup = (
        docs.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("v"))
        .select(
            F.lit("duplicate_doc_id").alias("check"),
            F.col("v").cast("string").alias("n_violations"),
        )
    )
    return row_checks.unionByName(dup)
