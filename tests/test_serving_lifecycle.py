"""Serving-store LIFECYCLE durability (round-5 hardening of the two
round-4 defects): the sidecar corpus fingerprint must catch a
regenerated corpus at the same path (stale-store detection + rebuild),
and the chunk swap in extend_search_index must survive a crash at any
point without destroying the only copy of the chunks table. The torn-
extend marker makes a mid-extend crash detectable (ADVICE round 4)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import serving as srv
from parallel_inverted_index_map_reduce_spark.operators.bucketing import (
    table_location,
)
from parallel_inverted_index_map_reduce_spark.operators.index import bm25_search
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _docs_v1(spark):
    return load_table(spark, SF_ORACLE, "documents").where(F.col("doc_id") < 60)


def _docs_v2(spark):
    """The 'regenerated corpus at the same path' stand-in: same ids,
    different text for some docs."""
    d = load_table(spark, SF_ORACLE, "documents").where(F.col("doc_id") < 60)
    return d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" regen"))
        ).otherwise(F.col("text")),
    )


def _drop_tables(spark, base):
    """Simulate a fresh session: catalog forgets, files stay."""
    for sfx in ("_chunks", "_positions", "_doclen", "_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {base}{sfx}")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fingerprint_is_partition_order_independent(spark):
    docs = _docs_v1(spark)
    a = srv.corpus_fingerprint(docs)
    b = srv.corpus_fingerprint(docs.repartition(7, "doc_id"))
    assert a == b
    assert a["n_docs"] == docs.count()
    # any single-doc content change must flip the fingerprint
    c = srv.corpus_fingerprint(_docs_v2(spark))
    assert c != a


def test_stale_store_detected_and_rebuilt(spark):
    """Build from corpus v1, 'regenerate' the corpus to v2, re-attach
    in a fresh session: ensure_search_index must detect the mismatch
    via the sidecar fingerprint and rebuild — the exact silent-stale
    scenario ADVICE flagged for ranked_retrieval's reuse path."""
    base = "lcstale"
    v1, v2 = _docs_v1(spark), _docs_v2(spark)
    srv.ensure_search_index(v1, base, n_buckets=4, chunk_size=16)
    assert srv.verify_search_index(spark, base, v1)
    assert not srv.verify_search_index(spark, base, v2)

    _drop_tables(spark, base)  # fresh-session attach
    srv.ensure_search_index(v2, base, n_buckets=4, chunk_size=16)
    # rebuilt: fingerprint now matches v2, and served answers are v2's
    assert srv.verify_search_index(spark, base, v2)
    got = _rows(srv.bm25_search_stored(spark, base, "regen", k=5))
    want = _rows(bm25_search(v2, "regen", k=5))
    assert got == want and got  # 'regen' only exists in v2


def test_same_session_reuse_skips_rebuild(spark):
    """Registered tables + no torn-extend marker -> ensure is a no-op
    (the plan-sweep fast path must not pay a verify scan or rebuild)."""
    base = "lcreuse"
    v1 = _docs_v1(spark)
    srv.ensure_search_index(v1, base, n_buckets=4, chunk_size=16)
    loc = table_location(spark, f"{base}_chunks")
    mtime = os.path.getmtime(loc)
    srv.ensure_search_index(v1, base, n_buckets=4, chunk_size=16)
    assert os.path.getmtime(loc) == mtime


def test_unfingerprinted_legacy_sidecar_rebuilds_on_attach(spark):
    """A pre-v2 sidecar (no fingerprint) is unverifiable: cross-session
    ensure must rebuild rather than trust it."""
    base = "lclegacy"
    v1 = _docs_v1(spark)
    srv.ensure_search_index(v1, base, n_buckets=4, chunk_size=16)
    meta_path = srv._meta_path(spark, base)
    with open(meta_path) as fh:
        meta = json.load(fh)
    del meta["fingerprint"]
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    _drop_tables(spark, base)
    srv.ensure_search_index(v1, base, n_buckets=4, chunk_size=16)
    assert srv.verify_search_index(spark, base, v1)


def test_extend_updates_fingerprint_incrementally(spark):
    """After extend(batch), verify against (old ∪ batch) passes WITHOUT
    a rebuild — the xor-composed sidecar fingerprint equals the one a
    full scan of the extended corpus computes."""
    base = "lcextfp"
    docs = load_table(spark, SF_ORACLE, "documents")
    first = docs.where(F.col("doc_id") < 40)
    batch = docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 70))
    both = docs.where(F.col("doc_id") < 70)
    srv.store_search_index(first, base, n_buckets=4, chunk_size=16)
    srv.extend_search_index(spark, base, batch)
    assert not srv.extend_in_progress(spark, base)
    assert srv.verify_search_index(spark, base, both)
    assert not srv.verify_search_index(spark, base, first)


def test_torn_extend_is_detected_and_rebuilt(spark):
    """Crash mid-extend (marker written, tables partially mutated):
    verify refuses, ensure rebuilds, marker cleared."""
    base = "lctorn"
    v1 = _docs_v1(spark)
    srv.store_search_index(v1, base, n_buckets=4, chunk_size=16)
    srv._write_extend_marker(spark, base, {"n_new_docs": 99})
    assert srv.extend_in_progress(spark, base)
    assert not srv.verify_search_index(spark, base, v1)
    srv.ensure_search_index(v1, base, n_buckets=4, chunk_size=16)
    assert not srv.extend_in_progress(spark, base)
    assert srv.verify_search_index(spark, base, v1)


def test_crashed_rebuild_leaves_no_attachable_sidecar(spark):
    """store_search_index deletes the sidecar FIRST and rewrites it
    LAST: a crash anywhere mid-rebuild leaves a sidecar-less store that
    attach refuses and ensure rebuilds — never a stale sidecar whose
    fingerprint still matches beside half-written tables."""
    base = "lcrebuild"
    v1 = _docs_v1(spark)
    srv.store_search_index(v1, base, n_buckets=4, chunk_size=16)
    assert os.path.exists(srv._meta_path(spark, base))

    import parallel_inverted_index_map_reduce_spark.operators.serving as serving_mod

    real = serving_mod.write_bucketed

    def crashing_write(df, table, *a, **k):
        raise OSError("injected crash mid-rebuild")

    serving_mod.write_bucketed = crashing_write
    try:
        with pytest.raises(OSError, match="mid-rebuild"):
            srv.store_search_index(v1, base, n_buckets=4, chunk_size=16)
    finally:
        serving_mod.write_bucketed = real

    # the crashed rebuild invalidated the sidecar before touching data
    assert not os.path.exists(srv._meta_path(spark, base))
    _drop_tables(spark, base)
    with pytest.raises(FileNotFoundError):
        srv.attach_search_index(spark, base)
    srv.ensure_search_index(v1, base, n_buckets=4, chunk_size=16)
    assert srv.verify_search_index(spark, base, v1)


def test_chunk_swap_crash_windows_never_lose_chunks(spark):
    """Simulate every on-disk state the swap protocol can crash in and
    prove recover_chunks_swap restores a complete, queryable chunks
    table each time."""
    base = "lcswap"
    v1 = _docs_v1(spark)
    srv.store_search_index(v1, base, n_buckets=4, chunk_size=16)
    loc, next_loc, old_loc = srv._chunks_swap_paths(spark, base)
    want = _rows(spark.table(f"{base}_chunks"))
    n = 4

    # state A: crash during the __next write (live intact, partial next)
    os.makedirs(next_loc, exist_ok=True)
    srv.recover_chunks_swap(spark, base)
    assert os.path.isdir(loc) and not os.path.isdir(next_loc)

    # state B: crash after live -> __old rename, before publish
    spark.sql(f"DROP TABLE IF EXISTS {base}_chunks")
    shutil.copytree(loc, next_loc)  # a COMPLETE new version
    os.rename(loc, old_loc)
    srv.recover_chunks_swap(spark, base)
    assert os.path.isdir(loc) and not os.path.isdir(next_loc)
    assert not os.path.isdir(old_loc)
    srv._create_stored_table(
        spark, f"{base}_chunks", srv._bucketed_specs(base)[f"{base}_chunks"], n
    )
    assert _rows(spark.table(f"{base}_chunks")) == want

    # state C: crash after publish, before __old cleanup
    shutil.copytree(loc, old_loc)
    srv.recover_chunks_swap(spark, base)
    assert os.path.isdir(loc) and not os.path.isdir(old_loc)
    assert _rows(spark.table(f"{base}_chunks")) == want

    # attach path also runs recovery (fresh session after a crash)
    _drop_tables(spark, base)
    shutil.copytree(loc, next_loc)
    shutil.rmtree(loc)  # live missing + complete __next
    srv.attach_search_index(spark, base)
    assert _rows(spark.table(f"{base}_chunks")) == want


def test_extend_crash_inside_chunk_swap_is_recoverable(spark):
    """Inject a crash at the most dangerous instant of extend — after
    the old chunks directory is moved aside, before the publish rename
    — then prove ensure_search_index recovers to a consistent store
    with the extend's answers intact after roll-forward + rebuild."""
    base = "lccrash"
    docs = load_table(spark, SF_ORACLE, "documents")
    first = docs.where(F.col("doc_id") < 40)
    batch = docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 70))
    both = docs.where(F.col("doc_id") < 70)
    srv.store_search_index(first, base, n_buckets=4, chunk_size=16)

    real_rename = os.rename
    loc, next_loc, old_loc = srv._chunks_swap_paths(spark, base)

    def crashing_rename(src, dst):
        if dst == loc:  # the publish rename
            raise OSError("injected crash at the publish point")
        return real_rename(src, dst)

    srv.os.rename = crashing_rename
    try:
        with pytest.raises(OSError, match="injected crash"):
            srv.extend_search_index(spark, base, batch)
    finally:
        srv.os.rename = real_rename

    # torn: marker present, live chunks dir missing, __next complete
    assert srv.extend_in_progress(spark, base)
    assert not os.path.isdir(loc) and os.path.isdir(next_loc)

    # recovery: roll the swap forward, then the marker forces a rebuild
    # from the caller's (extended) corpus; answers match a clean build
    srv.ensure_search_index(both, base, n_buckets=4, chunk_size=16)
    assert not srv.extend_in_progress(spark, base)
    assert srv.verify_search_index(spark, base, both)
    got = _rows(srv.bm25_search_stored(spark, base, "spark query", k=5))
    want = _rows(bm25_search(both, "spark query", k=5))
    assert got == want


def test_deferred_extend_skips_chunk_rewrite_and_stays_correct(spark):
    """defer_chunks=True must not touch the chunks table's files at all
    (the whole point: the ONE store-proportional cost removed), while
    every query path stays correct via the positions fallback, and
    BM25 — which never read chunks — is unaffected."""
    base = "lcdefer"
    docs = load_table(spark, SF_ORACLE, "documents")
    first = docs.where(F.col("doc_id") < 40)
    batch = docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 70))
    both = docs.where(F.col("doc_id") < 70)
    srv.store_search_index(first, base, n_buckets=4, chunk_size=16)

    loc = table_location(spark, f"{base}_chunks")
    before = sorted(os.listdir(loc))
    mtimes = {
        f: os.path.getmtime(os.path.join(loc, f)) for f in before
    }
    srv.extend_search_index(spark, base, batch, defer_chunks=True)
    assert sorted(os.listdir(loc)) == before
    assert {
        f: os.path.getmtime(os.path.join(loc, f)) for f in before
    } == mtimes
    assert not srv.chunks_current(spark, base)
    assert not srv.extend_in_progress(spark, base)
    assert srv.verify_search_index(spark, base, both)

    got = _rows(srv.bm25_search_stored(spark, base, "spark query", k=5))
    assert got == _rows(bm25_search(both, "spark query", k=5))


def test_compact_noop_when_current(spark):
    base = "lcnoop"
    srv.store_search_index(_docs_v1(spark), base, n_buckets=4, chunk_size=16)
    loc = table_location(spark, f"{base}_chunks")
    before = sorted(os.listdir(loc))
    srv.compact_search_index(spark, base)
    assert sorted(os.listdir(loc)) == before
    assert srv.chunks_current(spark, base)


def test_compact_crash_after_swap_keeps_positions_path(spark):
    """Crash between the atomic chunk swap and the sidecar flag flip:
    the fresh chunks are on disk but still flagged stale. That state
    must (a) keep answering correctly (positions path), (b) verify
    clean, and (c) heal on the next compaction."""
    from parallel_inverted_index_map_reduce_spark.operators.index import (
        boolean_search,
    )

    base = "lccompactcrash"
    docs = load_table(spark, SF_ORACLE, "documents")
    first = docs.where(F.col("doc_id") < 40)
    batch = docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 70))
    both = docs.where(F.col("doc_id") < 70)
    srv.store_search_index(first, base, n_buckets=4, chunk_size=16)
    srv.extend_search_index(spark, base, batch, defer_chunks=True)

    real_replace = srv._replace_chunks_atomic

    def replace_then_crash(*a, **kw):
        real_replace(*a, **kw)
        raise OSError("injected crash after the swap, before the flag")

    srv._replace_chunks_atomic = replace_then_crash
    try:
        with pytest.raises(OSError, match="injected crash"):
            srv.compact_search_index(spark, base)
    finally:
        srv._replace_chunks_atomic = real_replace

    # fresh chunks on disk, flag still stale -> positions path serves
    assert not srv.chunks_current(spark, base)
    assert srv.verify_search_index(spark, base, both)
    want = sorted(
        (r["op"], tuple(r["doc_ids"]))
        for r in boolean_search(both, "spark", "query").collect()
    )
    got = sorted(
        (r["op"], tuple(r["doc_ids"]))
        for r in srv.boolean_search_stored(spark, base, "spark", "query").collect()
    )
    assert got == want

    srv.compact_search_index(spark, base)  # heals
    assert srv.chunks_current(spark, base)
    got2 = sorted(
        (r["op"], tuple(r["doc_ids"]))
        for r in srv.boolean_search_stored(spark, base, "spark", "query").collect()
    )
    assert got2 == want


def test_nondeferred_extend_on_stale_store_catches_up(spark):
    """A plain extend after a deferred one must fold the catch-up in:
    chunks rebuild from (positions + batch), never an incremental merge
    against the lagging chunks that would resurrect a pre-deferral
    view. Proven by comparing against a from-scratch store of the full
    corpus."""
    base = "lccatchup"
    docs = load_table(spark, SF_ORACLE, "documents")
    a = docs.where(F.col("doc_id") < 30)
    b = docs.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 55))
    c = docs.where((F.col("doc_id") >= 55) & (F.col("doc_id") < 80))
    full = docs.where(F.col("doc_id") < 80)
    srv.store_search_index(a, base, n_buckets=4, chunk_size=16)
    srv.extend_search_index(spark, base, b, defer_chunks=True)
    srv.extend_search_index(spark, base, c)  # catch-up
    assert srv.chunks_current(spark, base)
    assert srv.verify_search_index(spark, base, full)

    ref = "lccatchupref"
    srv.store_search_index(full, ref, n_buckets=4, chunk_size=16)
    assert _rows(spark.table(f"{base}_chunks")) == _rows(
        spark.table(f"{ref}_chunks")
    )
