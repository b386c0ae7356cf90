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


def test_plain_sql_bm25_over_the_attached_serving_store(spark):
    """The stored serving layout is queryable by ANY SQL client: a pure
    spark.sql BM25 over the attached tables matches bm25_search_stored
    row-for-row — the layout, not the Python operators, is the
    product surface."""
    from pyspark.sql import functions as F

    from parallel_inverted_index_map_reduce_spark.operators import serving as srv
    from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    srv.store_search_index(docs, "sqlidx", n_buckets=4, chunk_size=64)

    terms = ("hash", "query", "spark")
    st = spark.table("sqlidx_stats").first()
    n_docs, avgdl = int(st["n_docs"]), float(st["avgdl"])
    term_list = ", ".join(f"'{t}'" for t in terms)
    letter_list = ", ".join(f"'{t[0]}'" for t in sorted({t[0] for t in terms}))
    got = spark.sql(
        f"""
        WITH tf AS (
            SELECT word, doc_id, CAST(size(positions) AS BIGINT) AS tf
            FROM sqlidx_positions
            WHERE letter IN ({letter_list}) AND word IN ({term_list})
        ),
        idf AS (
            SELECT word,
                   round(ln(1.0 + (({n_docs}.0D - COUNT(DISTINCT doc_id)) + 0.5)
                                 / (COUNT(DISTINCT doc_id) + 0.5)), 9) AS idf
            FROM tf GROUP BY word
        ),
        scored AS (
            SELECT t.doc_id,
                   -- association matches bm25_rank exactly: the tf
                   -- ratio divides FIRST, then multiplies by idf —
                   -- a different IEEE association could differ by an
                   -- ulp on a round-half boundary at the 9th decimal
                   SUM(CAST(round(i.idf * ((t.tf * (1.2 + 1.0))
                                  / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / {avgdl!r}D))),
                            9) AS DECIMAL(28,12))) AS score_dec
            FROM tf t
            JOIN idf i USING (word)
            JOIN sqlidx_doclen d USING (doc_id)
            GROUP BY t.doc_id
        )
        SELECT doc_id,
               CAST(CAST(round(CAST(score_dec AS DECIMAL(28,12)), 6)
                    AS DECIMAL(18,6)) AS STRING) AS score,
               CAST(row_number() OVER (ORDER BY score_dec DESC, doc_id)
                    AS BIGINT) AS rank
        FROM scored
        ORDER BY score_dec DESC, doc_id
        LIMIT 10
        """
    )
    want = srv.bm25_search_stored(spark, "sqlidx", " ".join(terms), k=10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
