"""Stored chunked-index serving path: bucket-pruned, filter-pushed
point lookups against the word-bucketed layout — the read side of the
100 TB index story (build once, serve lookups at one-bucket cost)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.index import (
    build_index,
    build_index_chunked,
    lookup_stored_terms,
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
