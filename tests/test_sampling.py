"""Deterministic sampling: partition-invariance, cohort integrity,
split disjointness, stratum fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import sampling as sp
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _events(spark):
    return load_table(spark, SF_ORACLE, "events")


def test_sample_invariant_under_repartition(spark):
    ev = _events(spark)
    a = sp.deterministic_sample(ev, "user_id", 0.3)
    b = sp.deterministic_sample(ev.repartition(13), "user_id", 0.3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sample_keeps_cohorts_whole(spark):
    ev = _events(spark)
    s = sp.deterministic_sample(ev, "user_id", 0.3)
    kept_users = {r.user_id for r in s.select("user_id").distinct().collect()}
    all_events_of_kept = ev.where(F.col("user_id").isin(list(kept_users)))
    assert s.count() == all_events_of_kept.count()


def test_train_test_split_disjoint_exhaustive_no_leak(spark):
    ev = _events(spark)
    train, test = sp.train_test_split(ev, "user_id", 0.25)
    n_train, n_test, n_all = train.count(), test.count(), ev.count()
    assert n_train + n_test == n_all
    assert n_test > 0 and n_train > 0
    overlap = train.select("user_id").intersect(test.select("user_id"))
    assert overlap.count() == 0  # no entity on both sides


def test_stratified_fractions_and_determinism(spark):
    ev = _events(spark)
    fr = {"view": 1.0, "click": 0.5, "error": 0.0}
    s = sp.stratified_sample(ev, "event_type", fr, key="event_id")
    counts = {
        r.event_type: r.n
        for r in s.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("view") == base["view"]  # fraction 1.0 keeps all
    assert "error" not in counts  # fraction 0.0 drops all
    assert set(counts) <= {"view", "click"}  # absent strata default to 0
    assert 0 < counts["click"] < base["click"]
    # deterministic: same call, same rows
    s2 = sp.stratified_sample(ev, "event_type", fr, key="event_id")
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, s2.collect()))


def test_temperature_mix_endpoints_and_boost(spark):
    """alpha=1 keeps the natural mixture untouched; alpha=0 levels all
    domains toward the rarest; intermediate alpha strictly boosts the
    rare domain's SHARE while never upsampling any domain. (A skewed
    synthetic corpus — the testdata documents are uniform across
    sources, where every alpha is the identity.)"""
    rows = (
        [(i, "web") for i in range(160)]
        + [(1000 + i, "code") for i in range(40)]
        + [(2000 + i, "books") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    base = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    total = sum(base.values())

    # alpha=1: identity — every keep fraction is 1.0
    mixed1, fr1 = sp.temperature_mix(docs, "source", 1.0, key="doc_id")
    assert all(abs(f - 1.0) < 1e-12 for f in fr1.values()), fr1
    assert mixed1.count() == total

    # alpha=0: uniform target — the rarest domain binds at fraction 1.0,
    # every other domain downsamples toward its size
    mixed0, fr0 = sp.temperature_mix(docs, "source", 0.0, key="doc_id")
    rarest = min(base, key=lambda s: (base[s], s))
    assert abs(fr0[rarest] - 1.0) < 1e-12, fr0
    c0 = {
        r.source: r.n
        for r in mixed0.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s in base:
        assert c0.get(s, 0) <= base[s]  # never upsampled

    # intermediate alpha: the rarest domain's expected share strictly
    # exceeds its natural share
    w = sp.temperature_weights(docs, "source", 0.5)
    assert w[rarest] > base[rarest] / total

    # deterministic across calls
    m2, _ = sp.temperature_mix(docs, "source", 0.5, key="doc_id")
    m3, _ = sp.temperature_mix(docs, "source", 0.5, key="doc_id")
    assert sorted(map(tuple, m2.collect())) == sorted(map(tuple, m3.collect()))


def test_priority_sample_matches_sequential_reference(spark):
    # A-Res equivalence: the k smallest -ln(u)/w priorities computed by
    # the engine equal a plain-Python recomputation over the same hashes
    import hashlib
    import math

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "n_chars")
    got = sp.priority_sample(docs, "doc_id", "n_chars", k=25).collect()
    rows = docs.collect()
    ref = []
    for r in rows:
        h = int(
            hashlib.md5(f"priority\x1f{r.doc_id}".encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / 2**32
        w = max(float(r.n_chars), 1.0)
        ref.append((round(-math.log(u) / w, 9), r.doc_id, r.n_chars))
    ref.sort()
    ref = ref[:25]
    assert [(g.doc_id, g.rank) for g in sorted(got, key=lambda g: g.rank)] == [
        (d, i + 1) for i, (_, d, _) in enumerate(ref)
    ]
    for g in got:
        p, d, _ = ref[g.rank - 1]
        assert abs(g.priority - p) < 1e-12


def test_priority_sample_invariant_under_repartition(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "n_chars")
    a = sp.priority_sample(docs, "doc_id", "n_chars", k=25)
    b = sp.priority_sample(docs.repartition(17), "doc_id", "n_chars", k=25)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_quota_sample_exact_quotas_and_stability(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    q = sp.quota_sample(docs, "lang", "doc_id", k=10)
    per = {r.lang: r.n for r in q.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {
        r.lang: r.n
        for r in docs.where(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in per.items():
        assert n == min(10, sizes[lang])
    # stable under repartition
    b = sp.quota_sample(docs.repartition(7), "lang", "doc_id", k=10)
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, b.collect()))


def test_quota_sample_scalable_identical_to_plain(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    plain = sorted(map(tuple, sp.quota_sample(docs, "lang", "doc_id", k=10).collect()))
    for nb in (1, 3, 64):
        dec = sorted(
            map(
                tuple,
                sp.quota_sample_scalable(
                    docs, "lang", "doc_id", k=10, n_buckets=nb
                ).collect(),
            )
        )
        assert dec == plain, f"n_buckets={nb} diverges from the plain window"
    # partition invariance of the decomposed form
    b = sorted(
        map(
            tuple,
            sp.quota_sample_scalable(
                docs.repartition(11), "lang", "doc_id", k=10, n_buckets=7
            ).collect(),
        )
    )
    assert b == plain


def test_priority_sample_scalable_identical_to_plain(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "n_chars")
    plain = sorted(map(tuple, sp.priority_sample(docs, "doc_id", "n_chars", k=25).collect()))
    for nb in (1, 5, 64):
        dec = sorted(
            map(
                tuple,
                sp.priority_sample_scalable(
                    docs, "doc_id", "n_chars", k=25, n_buckets=nb
                ).collect(),
            )
        )
        assert dec == plain, f"n_buckets={nb} diverges"
    # large k: every row ranked, rank is a dense permutation of 1..n
    n = docs.count()
    allr = sp.priority_sample_scalable(docs, "doc_id", "n_chars", k=n, n_buckets=8)
    ranks = sorted(r.rank for r in allr.collect())
    assert ranks == list(range(1, n + 1))
    # partition invariance
    b = sorted(
        map(
            tuple,
            sp.priority_sample_scalable(
                docs.repartition(13), "doc_id", "n_chars", k=25, n_buckets=5
            ).collect(),
        )
    )
    assert b == plain
