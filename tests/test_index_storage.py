"""Stored-index serving path: bucket-pruned, filter-pushed lookups
against the word-bucketed layout — the read side of the 100 TB index
story (build once, serve point lookups, boolean, phrase, proximity,
and BM25 at pruned-lookup cost, each proven row-identical to its
corpus-scan twin)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import serving as srv
from parallel_inverted_index_map_reduce_spark.operators.index import (
    bm25_search,
    boolean_search,
    build_index,
    build_index_chunked,
    lookup_stored_terms,
    phrase_search,
    proximity_search,
    store_chunked_index,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_chunked_build_has_two_exchanges(spark):
    """The chunked build's claimed shuffle budget, locked as a plan
    regression guard: ONE input-spread exchange plus ONE hash(word)
    exchange. The pair-distinct rides the spread's doc_id partitioning
    (same-doc pairs are co-located), and the (word, chunk_id) groupBy
    and whole-word df window both reuse the word exchange — chunking
    must never introduce a third shuffle."""
    import re

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = _plan(build_index_chunked(docs, chunk_size=64))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 2, plan


def test_stored_chunked_lookup_prunes_and_matches(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    store_chunked_index(
        build_index_chunked(docs, chunk_size=16), "chunked_index", n_buckets=8
    )

    # two terms guaranteed present: take them from the built index
    terms = [
        r.word
        for r in build_index(docs).orderBy(F.desc("df"), "word").limit(2).collect()
    ]
    got = lookup_stored_terms(spark, "chunked_index", terms)

    plan = _plan(got)
    # the IN predicate reaches the parquet scan...
    assert "PushedFilters" in plan and "In(word" in plan, plan
    # ...and bucket pruning reads 1 of 8 buckets per term's bucket
    assert "SelectedBucketsCount" in plan, plan
    n_sel = int(plan.split("SelectedBucketsCount: ")[1].split(" out of")[0])
    assert n_sel <= 2  # at most one bucket per looked-up term

    # reassembled postings equal the plain build's for those words
    want = {
        r.word: (r.letter, r.df, tuple(r.postings))
        for r in build_index(docs).where(F.col("word").isin(terms)).collect()
    }
    have = {
        r.word: (r.letter, r.df, tuple(r.postings)) for r in got.collect()
    }
    assert have == want

    # the second pruning level: a letter scan prunes to its partition
    letter = next(iter(want.values()))[0]
    scan = spark.table("chunked_index").where(F.col("letter") == letter)
    lp = _plan(scan)
    assert "PartitionFilters" in lp and "letter" in lp.split("PartitionFilters")[1][:120], lp
    rows = scan.select("word").distinct().count()
    full = build_index(docs).where(F.col("letter") == letter).count()
    assert rows == full


# ---------------------------------------------------------------------------
# Full serving layout: every search operator against stored tables,
# row-identical to its corpus-scan twin, with the pruning in the plan.
# ---------------------------------------------------------------------------

BASE = "srvidx"


@pytest.fixture(scope="module")
def served(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    srv.store_search_index(docs, BASE, n_buckets=8, chunk_size=16)
    return docs


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(
            tuple(v) if isinstance(v, list) else v
            for v in (r[c] for c in cols)
        )
        for r in df.collect()
    )


def test_bm25_stored_matches_corpus_scan(spark, served):
    q = "spark query hash"
    got = srv.bm25_search_stored(spark, BASE, q, k=10)
    want = bm25_search(served, q, k=10)
    assert _rows(got) == _rows(want) and _rows(got)

    plan = _plan(got)
    assert "SelectedBucketsCount" in plan, plan
    # the positions read prunes to at most one bucket per query term
    n_sel = int(plan.split("SelectedBucketsCount: ")[1].split(" out of")[0])
    assert n_sel <= 3, plan
    assert "In(word" in plan, plan


def test_phrase_stored_matches_corpus_scan(spark, served):
    # a phrase guaranteed present: the first three normalized tokens of
    # some document with at least three tokens
    from parallel_inverted_index_map_reduce_spark.functions.text import tokens_df

    first3 = (
        tokens_df(served)
        .groupBy("doc_id")
        .agg(F.slice(F.collect_list("word"), 1, 3).alias("w3"))
        .where(F.size("w3") == 3)
        .orderBy("doc_id")
        .first()["w3"]
    )
    phrase = " ".join(first3)
    got = srv.phrase_search_stored(spark, BASE, phrase)
    want = phrase_search(served, phrase)
    assert _rows(got) == _rows(want) and _rows(got)

    # the phrase path aggregates on doc_id, so the planner may drop the
    # bucketed scan — the pruning that must ALWAYS hold is the derived
    # letter partition filter (whole directories) plus the pushed word
    # IN filter (row-group skipping over word-sorted files)
    plan = _plan(got)
    assert "PartitionFilters" in plan and "letter" in plan.split("PartitionFilters")[1][:200], plan
    assert "In(word" in plan, plan


def test_proximity_stored_matches_corpus_scan(spark, served):
    got = srv.proximity_search_stored(spark, BASE, "spark", "query", max_dist=5)
    want = proximity_search(served, "spark", "query", max_dist=5)
    assert _rows(got) == _rows(want) and _rows(got)


def test_boolean_stored_matches_corpus_scan(spark, served):
    got = srv.boolean_search_stored(spark, BASE, "spark", "query")
    want = boolean_search(served, "spark", "query").select(
        "op", "term1", "term2", "doc_ids"
    )
    assert _rows(got) == _rows(want) and len(_rows(got)) == 3

    plan = _plan(got)
    assert "SelectedBucketsCount" in plan, plan


def test_boolean_stored_absent_term_yields_nothing(spark, served):
    got = srv.boolean_search_stored(spark, BASE, "spark", "nosuchwordxyz")
    assert got.count() == 0


def test_stored_search_rejects_empty_queries(spark, served):
    with pytest.raises(ValueError, match="normalizes to nothing"):
        srv.bm25_search_stored(spark, BASE, "12345 !!!")
    with pytest.raises(ValueError, match="normalizes to nothing"):
        srv.phrase_search_stored(spark, BASE, "???")


def test_attach_reregisters_stored_tables_after_catalog_loss(spark, served):
    """Sessions forget the in-memory catalog; the external files and
    the sidecar survive, and attach_search_index re-creates the tables
    with the SAME bucket/sort/partition spec — results and pruning
    both intact after re-attachment."""
    q = "spark query hash"
    want = _rows(srv.bm25_search_stored(spark, BASE, q, k=10))
    want_ph = _rows(srv.phrase_search_stored(spark, BASE, "spark query"))

    # simulate a fresh session: drop every catalog entry (external
    # tables -> data files stay on disk)
    for suffix in ("_chunks", "_positions", "_doclen", "_stats"):
        spark.sql(f"DROP TABLE {BASE}{suffix}")
    assert not spark.catalog.tableExists(f"{BASE}_chunks")

    srv.attach_search_index(spark, BASE)
    got = srv.bm25_search_stored(spark, BASE, q, k=10)
    assert _rows(got) == want
    assert _rows(srv.phrase_search_stored(spark, BASE, "spark query")) == want_ph

    # pruning survives re-attachment: bucket spec carried by the DDL
    plan = _plan(got)
    assert "SelectedBucketsCount" in plan, plan
    # second attach is a no-op
    srv.attach_search_index(spark, BASE)


def test_extend_search_index_equals_full_rebuild(spark):
    """The incremental ingest path: store on a prefix of the corpus,
    extend with the rest, and every stored query must answer exactly
    what a from-scratch store over the full corpus answers."""
    docs = load_table(spark, SF_ORACLE, "documents")
    first = docs.where(F.col("doc_id") < 30)
    rest = docs.where(F.col("doc_id") >= 30)

    srv.store_search_index(first, "incidx", n_buckets=4, chunk_size=16)
    srv.extend_search_index(spark, "incidx", rest)
    srv.store_search_index(docs, "fullidx", n_buckets=4, chunk_size=16)

    q = "spark query hash"
    assert _rows(srv.bm25_search_stored(spark, "incidx", q)) == _rows(
        srv.bm25_search_stored(spark, "fullidx", q)
    )
    assert _rows(
        srv.phrase_search_stored(spark, "incidx", "spark query")
    ) == _rows(srv.phrase_search_stored(spark, "fullidx", "spark query"))
    assert _rows(
        srv.boolean_search_stored(spark, "incidx", "spark", "query")
    ) == _rows(srv.boolean_search_stored(spark, "fullidx", "spark", "query"))
    assert _rows(
        srv.proximity_search_stored(spark, "incidx", "spark", "query")
    ) == _rows(srv.proximity_search_stored(spark, "fullidx", "spark", "query"))
    assert _rows(
        srv.lookup_stored_terms(spark, "incidx_chunks", ["spark", "query"])
    ) == _rows(srv.lookup_stored_terms(spark, "fullidx_chunks", ["spark", "query"]))

    # the appended positions table still bucket-prunes
    plan = _plan(srv.bm25_search_stored(spark, "incidx", q))
    assert "SelectedBucketsCount" in plan, plan

    # stats absorbed the extension exactly
    got = spark.table("incidx_stats").first()
    want = spark.table("fullidx_stats").first()
    assert got["n_docs"] == want["n_docs"]
    assert abs(got["avgdl"] - want["avgdl"]) < 1e-9


def test_extend_rejects_duplicate_doc_ids(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    srv.store_search_index(
        docs.where(F.col("doc_id") < 20), "dupidx", n_buckets=4, chunk_size=16
    )
    with pytest.raises(ValueError, match="append-only"):
        srv.extend_search_index(
            spark, "dupidx", docs.where(F.col("doc_id") < 10)
        )


def test_attach_errors_on_missing_store(spark):
    with pytest.raises(FileNotFoundError):
        srv.attach_search_index(spark, "nosuchstore")
