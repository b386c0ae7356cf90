"""The scale sweep's staged CTE replay (scripts/sweep_scale.py) must
reproduce a WITH-block query exactly when each CTE is landed as a temp
table: these pin the parser (balanced parens, quoted literals with
parens and '' escapes, column-list CTEs, MATERIALIZED hints) and the
replay's row-for-row equivalence on DuckDB, independent of Spark.

The sf-scale selftest (sweep_scale.py --selftest) proves the same for
the real registry oracles; this is the fast, fixture-free gate.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

_SWEEP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "sweep_scale.py",
)


@pytest.fixture(scope="module")
def sweep():
    spec = importlib.util.spec_from_file_location("sweep_scale", _SWEEP)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["sweep_scale"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_parser_splits_nested_and_quoted(sweep):
    sql = """WITH a AS (SELECT 1 AS x, '(' AS p),
b(y, z) AS MATERIALIZED (VALUES (1, 'it''s (nested)'), (2, 'plain')),
c AS (SELECT x, (SELECT max(y) FROM b) AS my FROM a)
SELECT * FROM c JOIN b ON b.y = c.x"""
    ctes, final = sweep._split_with_block(sql)
    assert [(n, cl) for n, cl, _ in ctes] == [
        ("a", None),
        ("b", "y, z"),
        ("c", None),
    ]
    assert ctes[0][2] == "SELECT 1 AS x, '(' AS p"
    assert "it''s (nested)" in ctes[1][2]
    assert final.startswith("SELECT * FROM c JOIN b")


def test_parser_requires_with(sweep):
    with pytest.raises(ValueError):
        sweep._split_with_block("SELECT 1")


def test_staged_replay_matches_direct(sweep):
    sql = """WITH base AS (SELECT range AS i FROM range(0, 100)),
sq(i, s) AS (SELECT i, i * i FROM base WHERE i % 3 = 0),
agg AS (SELECT sum(s) AS total, count(*) AS n FROM sq)
SELECT total, n, (SELECT max(i) FROM sq) AS mx FROM agg"""
    conn = duckdb.connect()
    want = conn.sql(sql).fetchall()
    final, created = sweep.staged_replay(conn, sql)
    got = conn.sql(final).fetchall()
    # liveness pruning: 'base' is referenced only by 'sq', so it is
    # dropped the moment 'sq' materializes; sq/agg survive because the
    # final select reads them
    assert created == ["sq", "agg"]
    assert got == want
    assert conn.sql(
        "SELECT count(*) FROM information_schema.tables "
        "WHERE table_name = 'base'"
    ).fetchone()[0] == 0
    sweep._drop_staged(conn, created)
    # tables are gone after cleanup
    assert conn.sql(
        "SELECT count(*) FROM information_schema.tables "
        "WHERE table_name IN ('base', 'sq', 'agg')"
    ).fetchone()[0] == 0


def test_staged_replay_handles_recursive_keyword_prefix(sweep):
    # WITH RECURSIVE is accepted as a prefix; non-self-referencing CTEs
    # under it still stage correctly (dedup_clusters' twin stops before
    # the closure CTE — its oracle never reaches staged_replay intact)
    sql = """WITH RECURSIVE a AS (SELECT 1 AS x) SELECT x FROM a"""
    conn = duckdb.connect()
    final, created = sweep.staged_replay(conn, sql)
    assert conn.sql(final).fetchall() == [(1,)]
    sweep._drop_staged(conn, created)


def test_parser_skips_comments_and_quoted_identifiers(sweep):
    # -- and /* */ comments may carry unbalanced parens and stray
    # quotes (text_quality's oracle has -- comments); double-quoted
    # identifiers likewise must not derail the depth count
    sql = """WITH a AS (
  SELECT 1 AS x  -- trailing ( unbalanced ' comment
),
b AS (SELECT /* ) ( ' */ x AS "we(ird"" name" FROM a)
SELECT * FROM b"""
    ctes, final = sweep._split_with_block(sql)
    assert [n for n, _c, _b in ctes] == ["a", "b"]
    assert final == "SELECT * FROM b"
    conn = duckdb.connect()
    f, created = sweep.staged_replay(conn, sql)
    assert conn.sql(f).fetchall() == [(1,)]
    sweep._drop_staged(conn, created)


def test_parser_malformed_input_raises_value_error(sweep):
    # unbalanced parens / unterminated tokens are parse errors with a
    # message, never IndexError past the end of input
    for bad in [
        "WITH a AS (SELECT 1",
        "WITH a AS (SELECT 'oops)",
        'WITH a AS (SELECT "oops)',
        "WITH a AS (SELECT 1 /* never closed )",
    ]:
        with pytest.raises(ValueError):
            sweep._split_with_block(bad)


def test_part_values_unions_both_sides_and_rejects_null(sweep, spark):
    conn = duckdb.connect()
    dsql = "SELECT * FROM (VALUES ('a', 1), ('b', 2)) t(op, v)"
    sdf = spark.createDataFrame([("b", 2), ("c", 3)], ["op", "v"])
    # Spark-only 'c' must be enumerated too, or a divergent Spark arm
    # is silently skipped
    assert sweep._part_values(sdf, conn, dsql, "op") == ["a", "b", "c"]
    null_sdf = spark.createDataFrame([("b", 2), (None, 3)], ["op", "v"])
    with pytest.raises(ValueError, match="NULL"):
        sweep._part_values(null_sdf, conn, dsql, "op")
    null_dsql = "SELECT * FROM (VALUES ('a', 1), (NULL, 2)) t(op, v)"
    with pytest.raises(ValueError, match="NULL"):
        sweep._part_values(sdf, conn, null_dsql, "op")
