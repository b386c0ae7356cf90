"""DSIR importance weights (textstats.dsir_importance_weights):
hashed-ngram log p_target/p_source scoring — semantics on a corpus
with two clearly distinct vocabularies, an exact pure-Python
reference, and partition invariance on the oracle corpus."""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import textstats as ts
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE

N_BUCKETS = 64


def _two_domain_corpus(spark):
    fruity = "apple banana cherry plum apple banana grape pear"
    beastly = "dog cat bird fox wolf dog cat hawk lynx seal"
    rows = []
    for i in range(6):
        rows.append((i, fruity + f" apple{i % 2}"))
    for i in range(6, 12):
        rows.append((i, beastly + f" dog{i % 3}"))
    rows.append((12, ""))  # token-less: must have no weight row
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dsir_weights_match_pure_python_reference(spark):
    docs = _two_domain_corpus(spark)
    # normalize exactly like the engine (tokens_df strips to [a-z0-9]+?)
    from parallel_inverted_index_map_reduce_spark.operators.dedup import (
        token_positions,
    )

    engine_toks = {
        (r["doc_id"], r["pos"]): r["tok"]
        for r in token_positions(docs).collect()
    }
    # rebuild each doc's token list in engine order for the reference
    by_doc: dict[int, list[str]] = {}
    for (d, p), t in sorted(engine_toks.items()):
        by_doc.setdefault(d, []).append(t)
    feats = {
        d: (
            toks
            + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        )
        for d, toks in by_doc.items()
    }
    buckets = {
        d: [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS
            for g in gs
        ]
        for d, gs in feats.items()
    }
    target_ids = {d for d in buckets if d < 6}
    s_counts: dict[int, int] = {}
    t_counts: dict[int, int] = {}
    for d, bs in buckets.items():
        for b in bs:
            s_counts[b] = s_counts.get(b, 0) + 1
            if d in target_ids:
                t_counts[b] = t_counts.get(b, 0) + 1
    s_total = sum(s_counts.values()) + N_BUCKETS
    t_total = sum(t_counts.values()) + N_BUCKETS
    ratio = {
        b: round(
            math.log(
                ((t_counts.get(b, 0) + 1) / (cs + 1)) * (s_total / t_total)
            ),
            9,
        )
        for b, cs in s_counts.items()
    }
    want = {}
    for d, bs in buckets.items():
        sw = sum(Decimal(str(ratio[b])) for b in bs)
        want[d] = (len(bs), f"{sw:.6f}")

    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_w"])
        for r in ts.dsir_importance_weights(
            docs, docs.where(F.col("doc_id") < 6), n_buckets=N_BUCKETS
        ).collect()
    }
    assert got == want
    assert 12 not in got  # token-less doc: no row


def test_dsir_tilts_toward_target_domain(spark):
    docs = _two_domain_corpus(spark)
    w = {
        r["doc_id"]: float(r["dsir_w"])
        for r in ts.dsir_importance_weights(
            docs, docs.where(F.col("doc_id") < 6), n_buckets=N_BUCKETS
        ).collect()
    }
    fruity = [w[d] for d in range(6)]
    beastly = [w[d] for d in range(6, 12)]
    # every target-domain doc outscores every out-of-domain doc
    assert min(fruity) > max(beastly)


def test_dsir_partition_invariant_on_oracle_corpus(spark):
    docs = load_table(spark, SF_ORACLE, "documents").where(F.col("doc_id") < 200)
    tgt = docs.where(F.col("source") == "src0")
    a = sorted(
        map(tuple, ts.dsir_importance_weights(docs, tgt).collect())
    )
    b = sorted(
        map(
            tuple,
            ts.dsir_importance_weights(docs.repartition(17), tgt).collect(),
        )
    )
    assert a == b and len(a) > 100
