"""Train/eval decontamination: flag training documents that contain
benchmark (eval) text, by n-gram containment.

The standard pre-training hygiene step (publicly described in the
GPT-3 and PaLM papers' decontamination appendices): a training document
is contaminated when a large fraction of an eval document's n-grams
appear in it. Built entirely from the engine's existing shingle
machinery — containment is a shingle equi-join, never a cross join:

    train shingles (distinct)  JOIN  eval shingles (distinct)
        ON shingle_hash                        -- the only shuffle key
    -> group by (train_id, eval_id) count      -- matched n-grams
    -> containment = matched / |eval shingles|

Scale shape: shuffle volume is O(matching shingle pairs), bounded by
shared-vocabulary n-grams, not corpus^2; eval sets are typically tiny
next to training corpora, so the eval side broadcasts when small
enough and AQE picks that automatically. Same prune-then-act pattern
as dedup — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.exprs import stable_round6
from .dedup import shingles


def contamination_report(
    train_docs: DataFrame, eval_docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """(train_id, eval_id, n_common, containment) for every train/eval
    pair whose containment — the fraction of the EVAL document's
    distinct 3-token shingles present in the train document — reaches
    ``threshold``. Asymmetric on purpose: a short eval prompt embedded
    in a long train document is full containment, which is exactly the
    leak being hunted."""
    tr = shingles(train_docs, distinct=True).select(
        F.col("doc_id").alias("train_id"), "shingle_hash"
    )
    ev = shingles(eval_docs, distinct=True).select(
        F.col("doc_id").alias("eval_id"), "shingle_hash"
    )
    ev_sizes = ev.groupBy("eval_id").agg(F.count("*").alias("n_eval"))
    common = (
        tr.join(ev, "shingle_hash")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_common"))
    )
    # decimal comparison, not n_common >= n_eval * double(threshold):
    # 30 * 0.1 is 3.0000000000000004 in IEEE doubles, so a doc at
    # exactly the threshold would silently evade flagging. str() gives
    # the threshold's shortest decimal repr; the integer ratio divides
    # exactly at scale 12.
    reaches = (
        F.col("n_common").cast("decimal(28,12)")
        / F.col("n_eval").cast("decimal(28,12)")
    ) >= F.lit(str(threshold)).cast("decimal(28,12)")
    return (
        common.join(ev_sizes, "eval_id")
        .where(reaches)
        .select(
            "train_id",
            "eval_id",
            "n_common",
            stable_round6(F.col("n_common") / F.col("n_eval")).alias(
                "containment"
            ),
        )
    )


def decontaminate(
    train_docs: DataFrame, eval_docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Training documents with every contaminated doc removed (anti-join
    on the report's train ids). Documents too short to shingle (< 3
    tokens) can never be flagged — stated, since silently dropping them
    would be the worse failure."""
    flagged = contamination_report(train_docs, eval_docs, threshold).select(
        F.col("train_id").alias("doc_id")
    ).distinct()
    return train_docs.join(flagged, "doc_id", "left_anti")
