"""The SQL entry point: register_views exposes every table to
spark.sql, and SQL text produces the same results as the DataFrame
programs — users can drive the engine either way."""

from __future__ import annotations

from parallel_inverted_index_map_reduce_spark.plans.registry import all_specs
from parallel_inverted_index_map_reduce_spark.sources.tables import register_views

from .conftest import SF_ORACLE


def test_sql_matches_dataframe_aggregate(spark):
    register_views(spark, SF_ORACLE)
    got = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
        """
    )
    want = (
        all_specs()["pivot_status_by_priority"]
        .fn(spark, SF_ORACLE)
        .sparkSession.table("orders")
        .groupBy("o_orderstatus")
        .count()
        .withColumnRenamed("count", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_sql_expresses_full_index_pipeline(spark):
    """The reference's ENTIRE pipeline as one SQL statement (the ~15-line
    claim in SURVEY.md §3): tokenize -> normalize -> distinct ->
    group-collect -> df -> letter bucket -> per-letter rank — proven
    row-identical to the DataFrame build. Users who speak only SQL get
    full engine parity."""
    from pyspark.sql import functions as F

    from parallel_inverted_index_map_reduce_spark.operators.index import build_index
    from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

    register_views(spark, SF_ORACLE)
    got = spark.sql(
        """
        WITH toks AS (
            SELECT doc_id,
                   regexp_replace(lower(tok), '[^a-z]', '') AS word
            FROM documents
            LATERAL VIEW explode(split(text, '\\\\s+')) AS tok
        ),
        postings AS (
            SELECT word,
                   sort_array(collect_set(doc_id)) AS postings
            FROM toks WHERE word != '' GROUP BY word
        )
        SELECT substring(word, 1, 1) AS letter, word,
               CAST(size(postings) AS BIGINT) AS df, postings,
               CAST(row_number() OVER (
                   PARTITION BY substring(word, 1, 1)
                   ORDER BY size(postings) DESC, word ASC
               ) AS BIGINT) AS rank
        FROM postings
        """
    )
    want = build_index(load_table(spark, SF_ORACLE, "documents"))
    key = lambda r: (r.letter, r.word, r.df, tuple(r.postings), r.rank)
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_sql_join_over_views(spark):
    register_views(spark, SF_ORACLE)
    got = spark.sql(
        """
        SELECT n.n_name AS nation, COUNT(c.c_custkey) AS n_customers
        FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    want = all_specs()["outer_join_nation_counts"].fn(spark, SF_ORACLE)
    grows = sorted(map(tuple, got.collect()))
    wrows = sorted(map(tuple, want.select("nation", "n_customers").collect()))
    assert grows == wrows
