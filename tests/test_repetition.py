"""Hand-computed cases for the Gopher-style repetition filters
(operators/textstats.py repetition_stats): top-n-gram fractions,
duplicate-5-gram fraction, and longest back-to-back token run, all
implemented as zero-shuffle per-row array folds."""

from __future__ import annotations

from parallel_inverted_index_map_reduce_spark.operators.textstats import (
    repetition_stats,
)

CASES = [
    # (doc_id, text, top2, top3, dup5, max_run)
    # toks [a,a,a,b]: 2-grams {a a:2, a b:1} -> 2/3; 3-grams
    # {a a a, a a b} -> 1/2; no 5-grams; run of a's = 3.
    (0, "a a a b", 2 / 3, 1 / 2, 0.0, 3),
    # alternating: 2-grams {x y:3, y x:2} -> 3/5; 3-grams
    # {x y x:2, y x y:2} -> 2/4; 5-grams both distinct -> 0; runs all 1.
    (1, "x y x y x y", 3 / 5, 2 / 4, 0.0, 1),
    # period-4 repeat, 12 tokens: 8 5-grams over 4 distinct -> dup 1/2.
    (2, "a b c d a b c d a b c d", 3 / 11, 3 / 10, 4 / 8, 1),
    # single token: no grams, fractions 0 by definition, run 1.
    (3, "z", 0.0, 0.0, 0.0, 1),
    # all-same: every gram identical -> fractions 1, dup5 = (n5-1)/n5.
    (4, "q q q q q q", 1.0, 1.0, 1 / 2, 6),
    # multiple spaces collapse to the same token stream as single ones.
    (5, "a  a   a b", 2 / 3, 1 / 2, 0.0, 3),
]


def test_repetition_stats_hand_cases(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, *_ in CASES], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(got) == {c[0] for c in CASES}
    for doc_id, _, top2, top3, dup5, run in CASES:
        r = got[doc_id]
        assert float(r["top2_frac"]) == round(top2, 6), (doc_id, r)
        assert float(r["top3_frac"]) == round(top3, 6), (doc_id, r)
        assert float(r["dup5_frac"]) == round(dup5, 6), (doc_id, r)
        assert r["max_token_run"] == run, (doc_id, r)


def test_repetition_stats_drops_tokenless_docs(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "ok")],
        "doc_id long, text string",
    )
    rows = repetition_stats(docs).collect()
    assert [r["doc_id"] for r in rows] == [3]


def test_repetition_stats_plan_has_no_shuffle(spark):
    """The signals are per-row folds: the plan must contain no Exchange
    beyond the spread() input repartition — no groupBy, no window."""
    docs = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    plan = repetition_stats(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan and "Window" not in plan, plan


def test_max_token_run_oracle_matches_engine_on_collapsed_whitespace(spark):
    """Round-8 regression lock for the divergence the sf1 spot-check
    caught: consecutive whitespace drops an empty token, the engine's
    array fold treats the survivors as ADJACENT ("x  x" is a run of
    2), and the oracle's gaps-and-islands must rank positions densely
    after the empty filter or it silently splits such runs (it used
    raw split positions until round 8). Runs the FULL text_quality
    oracle in DuckDB over a synthetic corpus built of exactly these
    edge shapes and compares max_token_run per doc."""
    import duckdb

    from parallel_inverted_index_map_reduce_spark.plans.registry import (
        all_specs,
    )

    texts = [
        (0, "a  a   a b"),   # run of 3 across double+triple spaces
        (1, "x  x"),         # the minimal split-run shape
        (2, "q q  q q"),     # run of 4 with an interior double space
        (3, "y z  z y"),     # run of 2 not at the text edges
        (4, "lone"),         # no runs > 1
    ]
    got = {
        r.doc_id: r.max_token_run
        for r in repetition_stats(
            spark.createDataFrame(texts, ["doc_id", "text"])
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', 't', 0)", texts
    )
    rel = con.sql(all_specs()["text_quality"].oracle)
    cols = rel.columns
    want = {
        row[cols.index("doc_id")]: row[cols.index("max_token_run")]
        for row in rel.fetchall()
    }
    assert got == {0: 3, 1: 2, 2: 4, 3: 2, 4: 1}
    assert want == got
