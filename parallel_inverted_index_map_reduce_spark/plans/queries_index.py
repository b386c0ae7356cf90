"""Inverted-index query specs (reference parity: SURVEY.md §2 O1-O16,
plus the Phase-2 query surface the index exists to serve).

All run over the ``documents`` table of an sf_dir. The shared tokenizer
CTE in the oracles mirrors functions/text.py exactly:
split on \\s+, lower, strip [^a-z], drop empties
(/root/reference/src/main.cpp:107-133,175-177).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index as ix
from ..sources.tables import load_table
from .registry import register

# Shared DuckDB tokenizer CTE — semantics identical to tokens_df().
TOKS_CTE = r"""
toks AS (
    SELECT doc_id,
           regexp_replace(lower(tok), '[^a-z]', '', 'g') AS word
    FROM (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents
    )
    WHERE regexp_replace(lower(tok), '[^a-z]', '', 'g') <> ''
)
"""

INDEX_CTE = (
    TOKS_CTE
    + r""",
idx AS (
    SELECT word,
           list_sort(list(DISTINCT doc_id)) AS postings,
           count(DISTINCT doc_id) AS df
    FROM toks
    GROUP BY word
)
"""
)

# Positional tokenizer CTE: post-filter sequential positions, the
# adjacency space operators/index.py positional_tokens() produces with
# its narrow array pipeline (this re-rank formulation proves it).
NTOKS_CTE = r""",
ntoks AS (
    SELECT doc_id, word,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS npos
    FROM (
        SELECT doc_id,
               regexp_replace(lower(tok), '[^a-z]', '', 'g') AS word,
               pos
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(text, '\s+')) AS tok,
                   unnest(range(0, len(string_split_regex(text, '\s+')))) AS pos
            FROM documents
        )
        WHERE regexp_replace(lower(tok), '[^a-z]', '', 'g') <> ''
    )
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "inverted_index",
    oracle="WITH "
    + INDEX_CTE
    + r"""
SELECT substr(word, 1, 1) AS letter, word, df,
       array_to_string(postings, ' ') AS postings,
       row_number() OVER (
           PARTITION BY substr(word, 1, 1)
           ORDER BY df DESC, word ASC
       ) AS "rank"
FROM idx
""",
    tags=("index", "flagship"),
    bench=True,
    doc="Full reference pipeline O2,O4-O13: (letter, word, df, postings, "
    "rank). Postings render as a space-joined string: the sorted-array "
    "serialization is part of the sink contract (O15) and keeps the "
    "result scalar-typed for any client.",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = ix.build_index(_docs(spark, sf_dir))
    return idx.withColumn("postings", F.array_join("postings", " "))


@register(
    "postings_flat",
    oracle="WITH "
    + TOKS_CTE
    + "SELECT word, doc_id, count(*) AS tf FROM toks GROUP BY word, doc_id",
    tags=("index",),
    doc="Reference O8 + the tf extension in one pass: the row set IS the "
    "distinct (word, doc_id) pairs (main.cpp:183-200's dedup-on-insert), "
    "and tf carries the occurrence count the reference discards "
    "(SURVEY.md §7 Phase 2) — the scalable flat index form.",
)
def q_postings_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ix.term_frequencies(_docs(spark, sf_dir))


@register(
    "document_frequency",
    oracle="WITH "
    + TOKS_CTE
    + "SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word",
    tags=("index",),
    doc="Reference O10 as a standalone distinct-count aggregation.",
)
def q_document_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ix.document_frequency(_docs(spark, sf_dir))


@register(
    "term_lookup",
    oracle="WITH "
    + INDEX_CTE
    + r"""
SELECT word, df, array_to_string(postings, ' ') AS postings
FROM idx WHERE word IN ('spark', 'query')
""",
    tags=("index", "search"),
    doc="Point lookup on the index (filter pushes to the stored-index scan).",
)
def q_term_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = ix.build_index(_docs(spark, sf_dir))
    return ix.term_lookup(idx, ["spark", "query"]).select(
        "word", "df", F.array_join("postings", " ").alias("postings")
    )


@register(
    "boolean_search",
    oracle="WITH "
    + INDEX_CTE
    + NTOKS_CTE
    + r""",
a AS (SELECT postings AS p1 FROM idx WHERE word = 'spark'),
b AS (SELECT postings AS p2 FROM idx WHERE word = 'query')
SELECT 'and' AS op, 'spark' AS term1, 'query' AS term2,
       array_to_string(list_sort(list_intersect(p1, p2)), ' ') AS doc_ids
FROM a, b
UNION ALL
SELECT 'or', 'spark', 'query',
       array_to_string(list_sort(list_distinct(list_concat(p1, p2))), ' ')
FROM a, b
UNION ALL
SELECT 'not', 'spark', 'query',
       array_to_string(list_sort(list_filter(p1, x -> NOT list_contains(p2, x))), ' ')
FROM a, b
UNION ALL
SELECT 'phrase', 'stream table hash', '', ds FROM (
    SELECT array_to_string(list_sort(list(DISTINCT doc_id)), ' ') AS ds,
           count(*) AS n
    FROM (
        SELECT a.doc_id
        FROM ntoks a
        JOIN ntoks b ON b.doc_id = a.doc_id AND b.npos = a.npos + 1
                    AND b.word = 'table'
        JOIN ntoks c ON c.doc_id = a.doc_id AND c.npos = a.npos + 2
                    AND c.word = 'hash'
        WHERE a.word = 'stream'
    )
) WHERE n > 0
""",
    tags=("index", "search"),
    doc="Boolean + phrase search over the index in one labeled result: "
    "AND (array_intersect), OR (array_union), NOT (array_except), and "
    "exact-phrase match via the positional index "
    "(operators/index.py phrase_search — one scan + one aggregation, "
    "adjacency checked by a per-row array predicate; the oracle uses "
    "the n-way positional self-join formulation, proving equivalence).",
)
def q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bs = ix.boolean_search(docs, "spark", "query").select(
        "op", "term1", "term2", F.array_join("doc_ids", " ").alias("doc_ids")
    )
    phrase = "stream table hash"
    ph = (
        ix.phrase_search(docs, phrase)
        .groupBy()
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") > 0)
        .select(
            F.lit("phrase").alias("op"),
            F.lit(phrase).alias("term1"),
            F.lit("").alias("term2"),
            F.array_join("ids", " ").alias("doc_ids"),
        )
    )
    return bs.unionByName(ph)


@register(
    "topk_terms_per_letter",
    oracle="WITH "
    + INDEX_CTE
    + r""",
ranked AS (
    SELECT substr(word, 1, 1) AS letter, word, df,
           row_number() OVER (
               PARTITION BY substr(word, 1, 1)
               ORDER BY df DESC, word ASC
           ) AS "rank"
    FROM idx
)
SELECT letter, word, df, "rank" FROM ranked WHERE "rank" <= 3
""",
    tags=("index", "window"),
    doc="Reference O13 as windowed top-k: df desc, word asc within letter.",
)
def q_topk_terms_per_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = ix.build_index(_docs(spark, sf_dir))
    return ix.topk_terms_per_letter(idx, k=3)


@register(
    "tf_idf",
    oracle="WITH "
    + TOKS_CTE
    + r""",
tf AS (
    SELECT word, doc_id, count(*) AS tf
    FROM toks GROUP BY word, doc_id
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT word, doc_id, tf,
       count(*) OVER (PARTITION BY word) AS df,
       round(
           tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE)
                   / count(*) OVER (PARTITION BY word)),
           6
       ) AS tfidf
FROM tf
""",
    tags=("index", "text"),
    doc="tf-idf with N as a broadcast scalar (no cross join) — SURVEY.md §7 Phase 4.",
)
def q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ix.tf_idf(_docs(spark, sf_dir))


@register(
    "index_lines",
    oracle="WITH "
    + TOKS_CTE
    + r""",
idx1 AS (
    SELECT word,
           list_sort(list(DISTINCT doc_id + 1)) AS postings,
           count(DISTINCT doc_id) AS df
    FROM toks
    GROUP BY word
)
SELECT substr(word, 1, 1) AS letter,
       row_number() OVER (
           PARTITION BY substr(word, 1, 1)
           ORDER BY df DESC, word ASC
       ) AS "rank",
       word || ':[' || array_to_string(postings, ' ') || ']' AS line
FROM idx1
""",
    tags=("index", "sink"),
    doc="Reference O14+O15: 1-based ids formatted as the exact "
    "``word:[id1 id2 ...]`` output lines (src/main.cpp:310-317), keyed "
    "by (letter, rank) for the per-letter sink (O16).",
)
def q_index_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.index import format_index_lines

    idx = ix.build_index(_docs(spark, sf_dir), one_based=True)
    return format_index_lines(idx)
