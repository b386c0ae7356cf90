"""BM25 ranked retrieval + proximity search (operators/index.py):
hand-ranked micro cases, and a DuckDB SQL twin of the full BM25 formula
on the real corpus proving engine-for-engine score equality."""

from __future__ import annotations

import duckdb
import pytest

from parallel_inverted_index_map_reduce_spark.operators.index import (
    bm25_search,
    proximity_search,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE

BM25_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, regexp_replace(lower(tok), '[^a-z]', '', 'g') AS word
    FROM (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        FROM read_parquet('{path}')
    )
    WHERE regexp_replace(lower(tok), '[^a-z]', '', 'g') <> ''
), dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
tf AS (
    SELECT word, doc_id, count(*) AS tf FROM toks
    WHERE word IN ({words}) GROUP BY word, doc_id
), idf AS (
    SELECT word,
           ln(1 + ((SELECT count(*) FROM read_parquet('{path}'))
                   - count(DISTINCT doc_id) + 0.5)
                  / (count(DISTINCT doc_id) + 0.5)) AS idf
    FROM tf GROUP BY word
), scored AS (
    SELECT t.doc_id,
           sum(i.idf * t.tf * (1.2 + 1.0)
               / (t.tf + 1.2 * (1.0 - 0.75
                                + 0.75 * d.dl / (SELECT avg(dl) FROM dl))))
               AS score
    FROM tf t JOIN idf i USING (word) JOIN dl d USING (doc_id)
    GROUP BY t.doc_id
)
SELECT doc_id,
       CAST(CAST(round(CAST(score AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS score,
       row_number() OVER (ORDER BY score DESC, doc_id) AS rank
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def test_bm25_matches_sql_twin_on_corpus(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    got = [
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_search(docs, "spark query table", k=10).collect()
    ]
    sql = BM25_ORACLE.format(
        path=f"{SF_ORACLE}/documents.parquet",
        words="'spark','query','table'",
        k=10,
    )
    want = [(d, s, r) for d, s, r in duckdb.sql(sql).fetchall()]
    assert sorted(got, key=lambda t: t[2]) == want
    assert len(got) == 10


def test_bm25_ranks_tf_and_rarity(spark):
    # 'rare' appears once in the corpus -> huge idf; doc 3 repeating
    # 'common' beats doc 2's single hit on the same term
    docs = spark.createDataFrame(
        [
            (1, "rare common filler words here"),
            (2, "common filler other stuff words"),
            (3, "common common common filler words"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["rank"] for r in bm25_search(docs, "rare common").collect()}
    assert got[1] == 1  # the only doc with the rare term wins
    assert got[3] < got[2]  # higher tf on the shared term ranks above


def test_bm25_empty_query_raises(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="normalizes"):
        bm25_search(docs, "1832 !!")


def test_proximity_distances(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha x y beta"),      # dist 3
            (2, "alpha beta"),          # dist 1
            (3, "beta z z z z alpha"),  # dist 5, unordered still counts
            (4, "alpha only here"),     # missing beta
            (5, "beta alone"),          # missing alpha
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["min_dist"]
        for r in proximity_search(docs, "alpha", "beta", max_dist=5).collect()
    }
    assert got == {1: 3, 2: 1, 3: 5}
    tight = {
        r["doc_id"]
        for r in proximity_search(docs, "alpha", "beta", max_dist=2).collect()
    }
    assert tight == {2}


def test_proximity_min_over_multiple_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "alpha q q q alpha q beta")], "doc_id long, text string"
    )
    got = proximity_search(docs, "alpha", "beta", max_dist=10).collect()
    assert [(r["doc_id"], r["min_dist"]) for r in got] == [(1, 2)]


def test_proximity_bad_window_raises(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_dist"):
        proximity_search(docs, "a", "b", max_dist=0)
