"""Index SERVING: run the search surface against stored tables instead
of re-tokenizing the corpus per query.

The corpus-scan forms in operators/index.py (bm25_search,
phrase_search, proximity_search, boolean_search) are the right shape
for batch analytics — one job that happens to include tokenization.
They are the WRONG cost model for a query engine: at 100 TB every
query would re-read and re-tokenize the whole corpus. This module is
the other half the reference's design implies but never builds
(ref: src/main.cpp:310-317 persists the index as 26 text files and
stops — it has no query side at all): persist the index ONCE in a
pruned layout, then serve each query at lookup cost.

Layout written by :func:`store_search_index` under a ``base`` name:

- ``<base>_chunks``    — the chunked flat index (letter-partitioned,
  word-bucketed+sorted; operators/index.py store_chunked_index): point
  lookups and boolean ops read ONE bucket of one letter directory.
- ``<base>_positions`` — positional postings (word, doc_id, positions),
  same two-level layout: phrase/proximity/BM25 read only the query
  terms' buckets. tf = size(positions), so BM25 needs no separate tf
  table.
- ``<base>_doclen``    — (doc_id, dl), bucketed by doc_id: the BM25
  length-normalization join co-locates without an exchange when the
  candidate side is shuffled to match, and AQE broadcasts the (tiny,
  term-bounded) candidate side regardless.
- ``<base>_stats``     — ONE row (n_docs, avgdl): the corpus scalars
  BM25 needs, precomputed at build time instead of two corpus
  aggregations per query.
- ``<base>_rwords``    — (rword, word) reversed-vocabulary companion,
  partitioned by rletter (the word's LAST letter): a suffix query is a
  prefix query over rword, restoring the directory pruning the
  word-major layout cannot give a wildcard-head predicate.

Every query operator here is proven ROW-IDENTICAL to its corpus-scan
twin (tests/test_index_storage.py) because both share the same scoring
or matching tail (index.py bm25_rank / phrase_adjacency_filter /
proximity_min_filter) — only the tf/position SOURCING differs. Plan
tests assert the stored reads actually prune (PushedFilters +
SelectedBucketsCount), which is the entire point.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bucketing import (
    table_location,
    write_bucketed,
    write_partitioned_table,
    write_table,
)
from .index import (
    _normalize_single_term,
    _py_deletion_variants,
    _with_df_letter,
    assemble_term_chunks,
    bm25_rank,
    chunk_pairs,
    deletion_variants,
    lookup_stored_terms,
    mlt_rank,
    normalize_query_tokens,
    phrase_adjacency_filter,
    positional_postings,
    proximity_min_filter,
    store_chunked_index,
    tfidf_norms,
    tfidf_weighted,
)


def corpus_fingerprint(docs: DataFrame) -> dict:
    """Cheap order-independent corpus identity: document count plus the
    xor of per-document ``xxhash64(doc_id, text)``. One aggregation, no
    shuffle beyond the partial-merge; xor is associative/commutative so
    partitioning cannot change it, and the SAME formula applied to a
    batch composes with a stored fingerprint under xor — which is what
    lets :func:`extend_search_index` maintain the fingerprint
    incrementally instead of re-scanning the whole corpus. This is a
    STALENESS check (did the corpus at this path change since the store
    was built), not a cryptographic commitment — xxhash64 is fine."""
    row = docs.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("doc_id"), F.col("text"))), F.lit(0)
        ).alias("x"),
    ).first()
    return {"n_docs": int(row["n"]), "xor64": int(row["x"])}


def _rwords_frame(words: DataFrame) -> DataFrame:
    """(rword, word, rletter) distinct reversed-vocabulary rows from a
    single-column ``word`` frame — the suffix companion table's shape:
    a suffix predicate on ``word`` is a PREFIX predicate on ``rword``,
    and ``rletter`` (the word's last letter) partitions the directory
    tree so a stored suffix lookup prunes exactly like prefix lookup."""
    return (
        words.distinct()
        .withColumn("rword", F.reverse("word"))
        .withColumn("rletter", F.substring("rword", 1, 1))
        .select("rword", "word", "rletter")
    )


def store_search_index(
    docs: DataFrame,
    base: str,
    n_buckets: int = 8,
    chunk_size: int = 4096,
) -> None:
    """Build and persist the full serving layout for ``docs`` under
    ``base`` (seven tables, see module docstring). ONE tokenization of
    the corpus feeds every table: the positional-postings frame is
    pinned (lazy localCheckpoint) and chunks derive from its (word,
    doc_id) pairs, doclen from its per-doc position counts — without
    the pinning, chunks/positions/doclen would each re-tokenize the
    corpus (the materialization discipline of operators/dedup.py).
    Everything downstream of this call is lookup-cost.

    Crash safety: the sidecar is DELETED first and rewritten last, so a
    crash anywhere mid-build leaves a store without a sidecar — attach
    fails loudly and ensure_search_index rebuilds — never a stale
    sidecar whose fingerprint still matches beside half-written tables
    (the one state fingerprint verification alone cannot catch)."""
    spark = docs.sparkSession
    try:
        os.remove(_meta_path(spark, base))
    except FileNotFoundError:
        pass
    pos = (
        positional_postings(docs)
        # tf as a stored column: consumers that only need term counts
        # (more-like-this candidates) read a long column instead of
        # materializing the positions arrays
        .withColumn("tf", F.size("positions").cast("long"))
        .withColumn("letter", F.substring("word", 1, 1))
        .localCheckpoint(eager=False)
    )
    write_bucketed(
        pos,
        f"{base}_positions",
        "word",
        n_buckets,
        sort_col="word",
        partition_cols=("letter",),
    )
    store_chunked_index(
        chunk_pairs(pos.select("word", "doc_id"), chunk_size=chunk_size),
        f"{base}_chunks",
        n_buckets=n_buckets,
    )
    doclen = pos.groupBy("doc_id").agg(
        F.sum(F.size("positions")).cast("long").alias("dl")
    )
    write_bucketed(doclen, f"{base}_doclen", "doc_id", n_buckets, sort_col="doc_id")
    # n_docs counts ALL documents (token-less ones contribute to BM25's
    # N exactly as in the corpus-scan form); avgdl averages over
    # tokenized docs, matching bm25_search's doclen aggregate. The same
    # corpus aggregation yields the fingerprint the sidecar stores.
    fp = corpus_fingerprint(docs)
    n_docs = fp["n_docs"]
    # doc-major transpose (query-by-document access: one doc_id bucket
    # instead of a word-major full scan) + TF-IDF vector norms for
    # more-like-this — both derive from the same pinned pos frame
    docterms = pos.select("doc_id", "word", "tf")
    write_bucketed(
        docterms, f"{base}_docterms", "doc_id", n_buckets, sort_col="doc_id"
    )
    norms = tfidf_norms(tfidf_weighted(docterms, n_docs)).select(
        "doc_id", F.col("n2").cast("decimal(38,12)").alias("n2")
    )
    write_bucketed(
        norms, f"{base}_norms", "doc_id", n_buckets, sort_col="doc_id"
    )
    # reversed-word vocabulary companion (suffix -> prefix lookup)
    write_bucketed(
        _rwords_frame(pos.select("word")),
        f"{base}_rwords",
        "rword",
        n_buckets,
        sort_col="rword",
        partition_cols=("rletter",),
    )
    stats = spark.table(f"{base}_doclen").agg(
        F.lit(n_docs).cast("long").alias("n_docs"),
        F.coalesce(F.avg("dl"), F.lit(1.0)).alias("avgdl"),
    )
    write_table(stats, f"{base}_stats")
    # sidecar: the layout facts a FRESH session needs to re-register the
    # external tables (the in-memory catalog forgets them; the files do
    # not) — see attach_search_index — plus the corpus fingerprint that
    # makes "is this store current for THESE docs" an invariant-by-check
    # (verify_search_index), not an assumption about the path's contents.
    with open(_meta_path(spark, base), "w") as fh:
        json.dump(
            {
                "version": 5,
                "n_buckets": n_buckets,
                "chunk_size": chunk_size,
                "fingerprint": fp,
                # chunks cover the whole corpus on a fresh build; a
                # deferred extend flips this (see extend_search_index)
                "chunks_current": True,
                # norms bake idf in, so ANY extend flips this (df moved)
                # and compaction rebuilds; stale norms are recomputed
                # on the fly by mlt_search_stored — slower, never wrong
                "norms_current": True,
            },
            fh,
        )
    # a completed rebuild supersedes any torn extend and swap leftovers
    _clear_extend_marker(spark, base)
    _cleanup_swap_leftovers(spark, base)


def _meta_path(spark: SparkSession, base: str, kind: str = "text") -> str:
    """Sidecar path per layout KIND — the text and ANN stores under one
    base name must not clobber each other's metadata."""
    suffix = "serving_meta" if kind == "text" else f"{kind}_serving_meta"
    return table_location(spark, f"{base}_{suffix}.json")


def _read_meta(spark: SparkSession, base: str) -> dict:
    with open(_meta_path(spark, base)) as fh:
        return json.load(fh)


# ---------------------------------------------------------------------------
# Lifecycle protection: extend marker + atomic chunk swap + fingerprint
# verify. Together these close the two round-4 durability defects: a
# torn multi-table extend is DETECTABLE (marker), a crash mid-chunk-
# rewrite can never destroy the only copy (__next write + rename swap),
# and a store serving a regenerated corpus is CAUGHT, not silently
# served (sidecar fingerprint checked by ensure_search_index).
# ---------------------------------------------------------------------------


def _extend_marker_path(spark: SparkSession, base: str) -> str:
    return table_location(spark, f"{base}_extend_inprogress.marker")


def _write_extend_marker(spark: SparkSession, base: str, info: dict) -> None:
    with open(_extend_marker_path(spark, base), "w") as fh:
        json.dump(info, fh)


def _clear_extend_marker(spark: SparkSession, base: str) -> None:
    try:
        os.remove(_extend_marker_path(spark, base))
    except FileNotFoundError:
        pass


def extend_in_progress(spark: SparkSession, base: str) -> bool:
    """True when a previous :func:`extend_search_index` started mutating
    the four tables and never finished — the store may be TORN (e.g.
    positions include the new docs while chunks/stats exclude them) and
    must be rebuilt (or rolled forward by re-running the same extend
    after a rebuild from the pre-extend corpus)."""
    return os.path.exists(_extend_marker_path(spark, base))


def _swap_paths(
    spark: SparkSession, base: str, suffix: str
) -> tuple[str, str, str]:
    loc = table_location(spark, f"{base}{suffix}")
    return loc, table_location(spark, f"{base}{suffix}__next"), loc + "__old"


def _chunks_swap_paths(spark: SparkSession, base: str) -> tuple[str, str, str]:
    return _swap_paths(spark, base, "_chunks")


# table suffixes replaced via the atomic swap (everything derived-and-
# rewritten; append-only tables never swap)
_SWAPPED_SUFFIXES = ("_chunks", "_norms", "_rwords")


def recover_chunks_swap(spark: SparkSession, base: str) -> None:
    """Roll crashed table swaps forward (chunks AND norms — every
    derived table replaced via :func:`_replace_table_atomic`).
    Invariant of the swap protocol: a live location is only ever
    missing AFTER ``__next`` is completely written, so live-missing +
    __next-present always rolls FORWARD by one rename. Leftover
    ``__next``/``__old`` directories beside a live table are debris
    from crashes on either side of the publish point and are deleted.
    No-op on a healthy store."""
    for suffix in _SWAPPED_SUFFIXES:
        loc, next_loc, _old = _swap_paths(spark, base, suffix)
        if not os.path.isdir(loc) and os.path.isdir(next_loc):
            os.rename(next_loc, loc)
        if os.path.isdir(loc):
            _cleanup_swap_leftovers(spark, base, suffix)


def _cleanup_swap_leftovers(
    spark: SparkSession, base: str, suffix: str | None = None
) -> None:
    suffixes = _SWAPPED_SUFFIXES if suffix is None else (suffix,)
    for sfx in suffixes:
        _, next_loc, old_loc = _swap_paths(spark, base, sfx)
        for leftover in (next_loc, old_loc):
            if os.path.isdir(leftover):
                shutil.rmtree(leftover)


def _replace_table_atomic(
    spark: SparkSession,
    base: str,
    suffix: str,
    merged: DataFrame,
    n_buckets: int,
) -> None:
    """Replace a stored bucketed table write-new-then-rename: the new
    version is COMPLETELY written to ``<table>__next`` before the one
    destructive step, and the destructive step is two directory renames
    — at every instant at least one complete copy exists on disk
    (proven by the crash-injection sweep in
    tests/test_serving_lifecycle.py), unlike a DROP+rmtree+rewrite
    whose crash window destroys the only copy. The bucket/sort/
    partition spec comes from :func:`_bucketed_specs`, so the rewritten
    table keeps every pruning property."""
    table = f"{base}{suffix}"
    next_table = f"{table}__next"
    spec = _bucketed_specs(base)[table]
    _cols, part, bcol = spec
    # partition column comes from the spec's DDL clause (e.g.
    # "PARTITIONED BY (letter)" -> letter; rwords partitions by rletter)
    part_col = part.split("(")[1].rstrip(")") if part else None
    write_bucketed(
        merged,
        next_table,
        bcol,
        n_buckets,
        sort_col=bcol,
        partition_cols=(part_col,) if part_col else (),
    )
    # keep the files, drop the scratch catalog entry (external table)
    spark.sql(f"DROP TABLE IF EXISTS {next_table}")
    loc, next_loc, old_loc = _swap_paths(spark, base, suffix)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if os.path.isdir(old_loc):
        shutil.rmtree(old_loc)
    if os.path.isdir(loc):
        os.rename(loc, old_loc)  # live copy preserved under __old
    os.rename(next_loc, loc)  # the publish point
    if os.path.isdir(old_loc):
        shutil.rmtree(old_loc)
    _create_stored_table(spark, table, spec, n_buckets)


def _replace_chunks_atomic(
    spark: SparkSession, base: str, merged: DataFrame, n_buckets: int
) -> None:
    _replace_table_atomic(spark, base, "_chunks", merged, n_buckets)


def _bucketed_specs(base: str) -> dict[str, tuple[str, str, str]]:
    """table -> (column DDL, partition clause, bucket/sort column) for
    the three bucketed tables of a serving layout — ONE source of truth
    shared by the fresh-session attach and the post-swap re-register."""
    return {
        f"{base}_chunks": (
            "(word string, chunk_id bigint, df bigint, "
            "postings array<bigint>, letter string)",
            "PARTITIONED BY (letter)",
            "word",
        ),
        f"{base}_positions": (
            "(word string, doc_id bigint, positions array<int>, "
            "tf bigint, letter string)",
            "PARTITIONED BY (letter)",
            "word",
        ),
        f"{base}_doclen": ("(doc_id bigint, dl bigint)", "", "doc_id"),
        # doc-major transpose: the query-by-document access path (one
        # bucket per doc) the word-major tables cannot serve; tf only —
        # no idf baked in, so it stays append-only under extends
        f"{base}_docterms": (
            "(doc_id bigint, word string, tf bigint)",
            "",
            "doc_id",
        ),
        # TF-IDF vector norms; idf IS baked in, so extends flag this
        # stale (norms_current) and compaction rebuilds it
        f"{base}_norms": (
            "(doc_id bigint, n2 decimal(38,12))",
            "",
            "doc_id",
        ),
        # reversed-word vocabulary companion: suffix lookup becomes
        # prefix lookup over rword, so rletter (= the word's LAST
        # letter) restores the directory pruning a suffix predicate
        # cannot get from the word-major tables. Append-only under
        # extends (duplicate words across batches tolerated — readers
        # distinct); compaction dedupes
        f"{base}_rwords": (
            "(rword string, word string, rletter string)",
            "PARTITIONED BY (rletter)",
            "rword",
        ),
    }


def _create_stored_table(
    spark: SparkSession, table: str, spec: tuple[str, str, str], n_buckets: int
) -> None:
    """CREATE TABLE ... LOCATION DDL over existing external files,
    carrying the bucket/sort/partition spec so every pruning property
    (PartitionFilters, SelectedBucketsCount, sorted files) survives."""
    cols, part, bcol = spec
    loc = table_location(spark, table)
    if not os.path.isdir(loc):
        raise FileNotFoundError(f"no stored data for {table} at {loc}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} {cols} USING parquet {part} "
        f"CLUSTERED BY ({bcol}) SORTED BY ({bcol}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{loc}'"
    )
    if part:
        spark.catalog.recoverPartitions(table)


def attach_search_index(spark: SparkSession, base: str) -> None:
    """Re-register a previously stored serving layout in THIS session's
    catalog. ``store_search_index`` writes EXTERNAL tables (data under
    the warehouse dir) plus a JSON sidecar; a fresh session — the
    common serving case: build once in an indexing job, query from many
    later sessions — re-attaches them with CREATE TABLE ... LOCATION
    DDL carrying the same bucket/sort/partition spec, so every pruning
    property (PartitionFilters, SelectedBucketsCount, sorted files)
    survives the session boundary. No-op when the tables are already
    registered. Rolls a crashed chunk swap forward before registering.
    The local stand-in for a metastore-backed lake, where this whole
    function is the metastore's job."""
    recover_chunks_swap(spark, base)
    tables = [f"{base}{sfx}" for sfx in ("_chunks", "_positions", "_doclen", "_docterms", "_norms", "_stats")]
    # the rwords companion ships with v5 stores; a pre-v5 store stays
    # attachable (suffix_search_stored falls back to the vocabulary
    # scan), so its presence is a filesystem fact, not a requirement
    if os.path.isdir(table_location(spark, f"{base}_rwords")):
        tables.append(f"{base}_rwords")
    registered = [t for t in tables if spark.catalog.tableExists(t)]
    if len(registered) == len(tables):
        return
    # partial registration (a previous attach failed mid-way): drop the
    # registered external entries (metadata only — data files stay) and
    # re-create everything, so a retry repairs instead of silently
    # no-opping on the first table's existence
    for t in registered:
        spark.sql(f"DROP TABLE {t}")
    meta = _read_meta(spark, base)
    if int(meta.get("version", 1)) < 4:
        # pre-v4 layouts lack the docterms/norms tables and the
        # positions tf column — attaching them through the v4 DDL would
        # silently read nulls; refuse so ensure_search_index rebuilds
        raise FileNotFoundError(
            f"store '{base}' predates the v4 layout "
            "(no docterms/norms/tf) — rebuild with store_search_index"
        )
    n = int(meta["n_buckets"])
    for table, spec in _bucketed_specs(base).items():
        if table == f"{base}_rwords" and not os.path.isdir(
            table_location(spark, table)
        ):
            continue  # pre-v5 store: suffix queries fall back
        _create_stored_table(spark, table, spec, n)
    loc = table_location(spark, f"{base}_stats")
    if not os.path.isdir(loc):
        raise FileNotFoundError(f"no stored data for {base}_stats at {loc}")
    spark.sql(
        f"CREATE TABLE {base}_stats (n_docs bigint, avgdl double) "
        f"USING parquet LOCATION '{loc}'"
    )


def verify_search_index(spark: SparkSession, base: str, docs: DataFrame) -> bool:
    """True iff the store under ``base`` provably corresponds to
    ``docs``: no torn extend in progress, AND the sidecar's stored
    corpus fingerprint matches the one recomputed from ``docs`` (one
    corpus aggregation). A sidecar without a fingerprint (pre-v2 store)
    is UNVERIFIABLE and reports False — callers rebuild, converting an
    invariant-by-convention into an invariant-by-check."""
    if extend_in_progress(spark, base):
        return False
    try:
        meta = _read_meta(spark, base)
    except FileNotFoundError:
        return False
    fp = meta.get("fingerprint")
    return fp is not None and fp == corpus_fingerprint(docs)


def ensure_search_index(
    docs: DataFrame,
    base: str,
    n_buckets: int = 8,
    chunk_size: int = 4096,
) -> None:
    """The one attach-or-build entry point query paths should use:
    after this returns, ``base``'s four tables are registered and
    provably current for ``docs``.

    - tables already registered in THIS session: trusted as-is (they
      were verified or built by the call that registered them; a
      torn extend still invalidates, via the marker check).
    - stored layout on disk but not registered (fresh session): attach,
      then VERIFY the sidecar fingerprint against ``docs`` — a
      regenerated corpus at the same path is caught here and the store
      rebuilt, never silently served stale.
    - nothing on disk / verification fails: full rebuild.
    """
    spark = docs.sparkSession
    tables = [f"{base}{sfx}" for sfx in ("_chunks", "_positions", "_doclen", "_docterms", "_norms", "_stats")]
    if all(spark.catalog.tableExists(t) for t in tables) and not (
        extend_in_progress(spark, base)
    ):
        return
    try:
        attach_search_index(spark, base)
        if verify_search_index(spark, base, docs):
            return
    except FileNotFoundError:
        pass
    store_search_index(docs, base, n_buckets=n_buckets, chunk_size=chunk_size)


def pruned_positions(positions: DataFrame, words: set[str]) -> DataFrame:
    """The query terms' rows of a positional-postings frame,
    double-pruned: the derived letter predicate prunes whole partition
    DIRECTORIES (PartitionFilters — always applies), and the word IN
    filter pushes into the parquet scan (PushedFilters; it additionally
    prunes to the terms' buckets whenever the planner keeps the
    bucketed scan — it drops bucketing when no downstream operation is
    word-keyed, e.g. the phrase path's doc_id aggregation, and the
    pushed filter plus word-sorted files then still skip row groups).
    Works identically over the stored table and a streamed snapshot's
    parquet frame — both carry the letter partitioning. Empty terms
    match nothing (the corpus-scan twins' behavior), never crash."""
    words = {w for w in words if w}
    if not words:
        return positions.where(F.lit(False))
    letters = sorted({w[0] for w in words})
    return positions.where(F.col("letter").isin(*letters)).where(
        F.col("word").isin(*sorted(words))
    )


def _positions_for(
    spark: SparkSession, base: str, words: set[str]
) -> DataFrame:
    return pruned_positions(spark.table(f"{base}_positions"), words)


def bm25_search_stored(
    spark: SparkSession,
    base: str,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """(doc_id, score, rank): BM25 top-k served from the stored index —
    row-identical to index.py bm25_search (same bm25_rank tail), but
    per-query cost is the query terms' pruned positional buckets plus
    one column-pruned doclen read, NOT a corpus re-tokenization. tf
    comes free as size(positions); df derives from the same pruned
    read inside bm25_rank; N and avgdl are the precomputed stats row."""
    st = spark.table(f"{base}_stats").first()
    return bm25_from_frames(
        spark.table(f"{base}_positions"),
        spark.table(f"{base}_doclen"),
        int(st["n_docs"]),
        float(st["avgdl"]),
        query,
        k1=k1,
        b=b,
        k=k,
    )


def bm25_from_frames(
    positions: DataFrame,
    doclen: DataFrame,
    n_docs: int,
    avgdl: float,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """The frame-parameterized BM25 body shared by the stored-table path
    and the streamed-snapshot path (streaming/serving_stream.py) — one
    implementation, two storages."""
    words = sorted(set(normalize_query_tokens(query)))
    if not words:
        raise ValueError(f"query normalizes to nothing: {query!r}")
    pruned = pruned_positions(positions, set(words))
    # v4 stores carry tf as a column — the pruned read then never
    # materializes the positions arrays; older frames (streamed
    # snapshots) derive it from the arrays as before
    tf_col = (
        F.col("tf").cast("long")
        if "tf" in pruned.columns
        else F.size("positions").cast("long")
    )
    tf = pruned.select("word", "doc_id", tf_col.alias("tf"))
    return bm25_rank(tf, doclen, n_docs, avgdl, k1=k1, b=b, k=k)


def phrase_search_stored(
    spark: SparkSession, base: str, phrase: str
) -> DataFrame:
    """(doc_id, match_positions): exact-phrase match served from the
    stored positional index — row-identical to index.py phrase_search
    (same phrase_adjacency_filter tail). The per-word position arrays
    are ALREADY aggregated in storage, so the only work is the pruned
    read plus one groupBy(doc_id) over rows bounded by the phrase
    terms' document frequency."""
    return phrase_from_frames(spark.table(f"{base}_positions"), phrase)


def phrase_from_frames(positions: DataFrame, phrase: str) -> DataFrame:
    """Frame-parameterized phrase-match body (see bm25_from_frames)."""
    words = normalize_query_tokens(phrase)
    if not words:
        raise ValueError(f"phrase normalizes to nothing: {phrase!r}")
    pos = pruned_positions(positions, set(words))
    empty = F.array().cast("array<int>")
    per_doc = pos.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("word") == w, F.col("positions"))), empty
            ).alias(f"p{i}")
            for i, w in enumerate(words)
        ]
    )
    return phrase_adjacency_filter(per_doc, len(words))


def phrase_slop_search_stored(
    spark: SparkSession, base: str, phrase: str, slop: int = 0
) -> DataFrame:
    """(doc_id, match_positions): sloppy-phrase match served from the
    stored positional index — same phrase_slop_filter tail as the
    corpus-scan form (index.py phrase_search_slop), at pruned-lookup
    cost."""
    return phrase_slop_from_frames(
        spark.table(f"{base}_positions"), phrase, slop=slop
    )


def phrase_slop_from_frames(
    positions: DataFrame, phrase: str, slop: int = 0
) -> DataFrame:
    """Frame-parameterized sloppy-phrase body (see bm25_from_frames)."""
    from .index import phrase_slop_filter

    if slop < 0:
        raise ValueError("slop must be >= 0")
    words = normalize_query_tokens(phrase)
    if not words:
        raise ValueError(f"phrase normalizes to nothing: {phrase!r}")
    pos = pruned_positions(positions, set(words))
    empty = F.array().cast("array<int>")
    per_doc = pos.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("word") == w, F.col("positions"))), empty
            ).alias(f"p{i}")
            for i, w in enumerate(words)
        ]
    )
    return phrase_slop_filter(per_doc, len(words), slop)


def proximity_search_stored(
    spark: SparkSession, base: str, t1: str, t2: str, max_dist: int = 3
) -> DataFrame:
    """(doc_id, min_dist): NEAR/k served from the stored positional
    index — row-identical to index.py proximity_search (same
    proximity_min_filter tail), at pruned-lookup cost."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    pos = _positions_for(spark, base, {t1, t2})
    empty = F.array().cast("array<int>")
    per_doc = pos.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("word") == t, F.col("positions"))), empty
            ).alias(f"p{i + 1}")
            for i, t in enumerate((t1, t2))
        ]
    )
    return proximity_min_filter(per_doc, max_dist)


def chunks_current(spark: SparkSession, base: str) -> bool:
    """False when a deferred-chunks extend left the chunks table lagging
    the positions table (see :func:`extend_search_index`'s
    ``defer_chunks``) — chunk-served queries must fall back to the
    positions table until :func:`compact_search_index` runs. Absent
    flag (pre-deferral sidecars) means current."""
    return bool(_read_meta(spark, base).get("chunks_current", True))


def stored_term_postings(
    spark: SparkSession, base: str, terms: list[str]
) -> DataFrame:
    """(letter, word, df, postings) for exact ``terms`` from the store,
    routing around staleness: the chunks table when it is current
    (bucket-pruned point lookup, the fast path), else the positions
    table (same letter-partitioned/word-bucketed pruning; postings
    re-aggregate from the pruned rows — slower per query, but CORRECT
    the instant a deferred extend commits, which is the contract that
    makes deferring the chunks rewrite safe)."""
    words = sorted({t for t in terms if t})
    if not words:
        # empty lookup: an always-false filter keeps the schema without
        # isin() over zero values
        return assemble_term_chunks(
            spark.table(f"{base}_chunks").where(F.lit(False))
        )
    if chunks_current(spark, base):
        return lookup_stored_terms(spark, f"{base}_chunks", words)
    idx = (
        _positions_for(spark, base, set(words))
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("postings"))
    )
    return _with_df_letter(idx).select("letter", "word", "df", "postings")


# Above this many matched vocabulary terms, the stored suffix/fuzzy
# paths stop collecting the match set to the driver (the literal IN
# list is what feeds bucket/partition pruning — worth it for the
# common neighborhood-sized case) and switch to a distributed semi-join
# (a 1-char suffix over a 10^8-word vocabulary must never driver-OOM).
VOCAB_INLINE_CAP = 1024


def stored_postings_for_matched(
    spark: SparkSession,
    base: str,
    matched: DataFrame,
    cap: int = VOCAB_INLINE_CAP,
) -> DataFrame:
    """(letter, word, df, postings) for a matched-vocabulary FRAME
    (single ``word`` column), row-identical to
    ``stored_term_postings(spark, base, collected_words)`` on every
    input by construction (same source tables, same reassembly tails;
    pinned by tests/test_vocab_search.py's branch-identity tests):

    - at most ``cap`` matches (the common case — fuzzy neighborhoods,
      real suffixes): collect the words and route through
      :func:`stored_term_postings`, whose literal IN list prunes
      buckets and pushes into the scan (PushedFilters) — per-query cost
      bounded by the match set, flat in corpus size;
    - above ``cap``: NEVER collect — broadcast semi-join the matched
      frame (with its derived letter, so the join lands on the
      partition key) against the chunks table, or the positions table
      when a deferred extend left chunks stale. Scan cost is then the
      table's, not the driver's memory — unconditionally scale-safe.
    """
    head = [r["word"] for r in matched.limit(cap + 1).collect()]
    if len(head) <= cap:
        return stored_term_postings(spark, base, sorted(head))
    keys = F.broadcast(
        matched.select(
            F.substring("word", 1, 1).alias("letter"), "word"
        ).distinct()
    )
    if chunks_current(spark, base):
        return assemble_term_chunks(
            spark.table(f"{base}_chunks").join(keys, ["letter", "word"], "left_semi")
        )
    idx = (
        spark.table(f"{base}_positions")
        .join(keys, ["letter", "word"], "left_semi")
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("postings"))
    )
    return _with_df_letter(idx).select("letter", "word", "df", "postings")


def prefix_search_stored(
    spark: SparkSession, base: str, prefix: str
) -> DataFrame:
    """(letter, word, df, postings): index.py prefix_search served from
    the stored layout — the prefix's FIRST LETTER prunes to one
    partition directory (PartitionFilters), and the StartsWith predicate
    pushes into the parquet scan over word-sorted files. Row-identical
    to the corpus-scan form (shared reassembly/aggregation tails).
    Routes around a stale chunks table like :func:`stored_term_postings`."""
    p = _normalize_single_term(prefix, "prefix")
    if chunks_current(spark, base):
        return assemble_term_chunks(
            spark.table(f"{base}_chunks").where(
                (F.col("letter") == p[0]) & F.col("word").startswith(p)
            )
        )
    idx = (
        spark.table(f"{base}_positions")
        .where((F.col("letter") == p[0]) & F.col("word").startswith(p))
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("postings"))
    )
    return _with_df_letter(idx).select("letter", "word", "df", "postings")


def fuzzy_term_search_stored(
    spark: SparkSession,
    base: str,
    term: str,
    max_dist: int = 1,
    cap: int = VOCAB_INLINE_CAP,
) -> DataFrame:
    """(letter, word, df, postings): index.py fuzzy_term_search served
    from the stored layout. Two stored reads, each pruned its own way:

    1. vocabulary pass — ONE COLUMN (word) of the chunks table (or
       positions when chunks are stale), distinct, through the SymSpell
       deletion-neighborhood filter + levenshtein verify; vocabulary-
       scale, postings never read.
    2. postings fetch — through :func:`stored_postings_for_matched`:
       a neighborhood-bounded match set (the common case) collects to
       a driver-scalar IN list that prunes buckets/partitions; a match
       set above ``cap`` never collects and semi-joins instead.

    Row-identical to the corpus-scan form by construction (same
    candidate relation, same verify predicate, same postings source of
    truth)."""
    q = _normalize_single_term(term, "fuzzy term")
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    src = "_chunks" if chunks_current(spark, base) else "_positions"
    vocab = spark.table(f"{base}{src}").select("word").distinct()
    q_variants = sorted(_py_deletion_variants(q, max_dist))
    matched = (
        deletion_variants(vocab, max_deletes=max_dist)
        .where(F.col("variant").isin(q_variants))
        .select("word")
        .distinct()
        .where(F.levenshtein(F.col("word"), F.lit(q)) <= max_dist)
    )
    return stored_postings_for_matched(spark, base, matched, cap=cap)


def norms_current(spark: SparkSession, base: str) -> bool:
    """False when any extend has run since the norms table was built —
    norms bake idf in, and every ingested document moves df. Stale
    norms are recomputed on the fly by :func:`mlt_search_stored`
    (slower, never wrong) until :func:`compact_search_index` rebuilds
    the table. Absent flag (pre-v3 sidecars) means current."""
    return bool(_read_meta(spark, base).get("norms_current", True))


def mlt_search_stored(
    spark: SparkSession, base: str, doc_id: int, k: int = 10
) -> DataFrame:
    """(doc_id, score, rank): index.py more_like_this served from the
    stored layout — same mlt_rank scoring tail, so row-identical by
    construction; only the weight/norm sourcing differs:

    - the query document's WORDS come from the doc-major docterms table
      (ONE doc_id bucket — the access path the word-major tables cannot
      serve), collected as a doc-length-bounded driver scalar;
    - candidate weights come from the positions table pruned to those
      words (tf = size(positions)), with df derived from the SAME
      pruned rows (positions holds every (word, doc) pair for the
      query words, so a df window over the candidates is exact — no
      separate df lookup, no extra job, immune to chunk staleness);
    - norms come from the precomputed norms table when current, else
      recomputed on the fly from docterms + stats
      (:func:`_stored_weighted_terms` — bit-identical values, the
      decimal-sum discipline makes recomputation reproducible).

    Per-query cost when everything is current: one doc_id bucket read +
    the query terms' pruned positional buckets + one bucketed norms
    join — never a corpus re-tokenization."""
    norms = (
        spark.table(f"{base}_norms")
        if norms_current(spark, base)
        else None  # recomputed from docterms inside mlt_from_frames
    )
    return mlt_from_frames(
        spark.table(f"{base}_docterms"),
        spark.table(f"{base}_positions"),
        int(spark.table(f"{base}_stats").first()["n_docs"]),
        doc_id,
        k=k,
        norms=norms,
    )


def mlt_from_frames(
    docterms: DataFrame,
    positions: DataFrame,
    n_docs: int,
    doc_id: int,
    k: int = 10,
    norms: DataFrame | None = None,
) -> DataFrame:
    """The frame-parameterized more-like-this body (see
    bm25_from_frames): ``docterms`` is any (doc_id, word, tf) frame,
    ``positions`` any letter-partitioned positional frame (with or
    without the v4 ``tf`` column), so the stored-table path and the
    streamed-snapshot path share one implementation. ``norms`` is the
    precomputed (doc_id, n2) decimal frame when one exists and is
    current; None recomputes norms from ``docterms`` on the fly —
    bit-identical by the decimal-sum discipline, just one extra
    aggregation."""
    qwords = sorted(
        r["word"]
        for r in docterms.where(F.col("doc_id") == doc_id)
        .select("word")
        .collect()
    )
    pruned = pruned_positions(positions, set(qwords))
    tf_col = (
        F.col("tf").cast("long")
        if "tf" in pruned.columns
        else F.size("positions").cast("long")
    )
    cand = pruned.select("word", "doc_id", tf_col.alias("tf"))
    # pinned: the weighted frame feeds the query-vector branch AND the
    # dot branch inside mlt_rank (the scan path's discipline)
    weighted = tfidf_weighted(cand, n_docs).localCheckpoint(eager=False)
    if norms is None:
        norms = tfidf_norms(tfidf_weighted(docterms, n_docs))
    return mlt_rank(weighted, norms, doc_id, k=k)


def boolean_search_stored(
    spark: SparkSession, base: str, t1: str, t2: str
) -> DataFrame:
    """(op, term1, term2, doc_ids): AND/OR/NOT posting ops served from
    the stored chunked index — the lookup reads one bucket per term
    (stored_term_postings; positions-table fallback when a deferred
    extend left chunks stale), the three ops project from ONE collected
    pair of posting arrays. Emits 0 rows when either term is absent,
    matching index.py boolean_search's both-present semantics."""
    merged = stored_term_postings(spark, base, [t1, t2])
    empty = F.array().cast("array<long>")
    two = merged.groupBy().agg(
        F.coalesce(
            F.max(F.when(F.col("word") == t1, F.col("postings"))), empty
        ).alias("p1"),
        F.coalesce(
            F.max(F.when(F.col("word") == t2, F.col("postings"))), empty
        ).alias("p2"),
        F.coalesce(F.max(F.col("word") == t1), F.lit(False)).alias("has1"),
        F.coalesce(F.max(F.col("word") == t2), F.lit(False)).alias("has2"),
    )
    both = F.col("has1") & F.col("has2")
    entries = [
        F.struct(
            F.lit(op).alias("op"),
            F.lit(t1).alias("term1"),
            F.lit(t2).alias("term2"),
            F.sort_array(arr).alias("doc_ids"),
            both.alias("emit"),
        )
        for op, arr in (
            ("and", F.array_intersect("p1", "p2")),
            ("or", F.array_union("p1", "p2")),
            ("not", F.array_except("p1", "p2")),
        )
    ]
    return (
        two.select(F.explode(F.array(*entries)).alias("kv"))
        .where(F.col("kv.emit"))
        .select(
            F.col("kv.op").alias("op"),
            F.col("kv.term1").alias("term1"),
            F.col("kv.term2").alias("term2"),
            F.col("kv.doc_ids").alias("doc_ids"),
        )
    )


# ---------------------------------------------------------------------------
# ANN serving: the IVF inverted lists as a stored, probe-pruned layout —
# the similarity surface's analogue of the stored text index above.
# ---------------------------------------------------------------------------


def embeddings_fingerprint(emb: DataFrame) -> dict:
    """The ANN store's analogue of :func:`corpus_fingerprint`: vector
    count plus the xor of per-row ``xxhash64(vec_id, embedding)``
    (xxhash64 hashes array columns natively). Order-independent, one
    aggregation — a staleness check for "do the stored inverted lists
    still describe THESE embeddings"."""
    row = emb.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("vec_id"), F.col("embedding"))), F.lit(0)
        ).alias("x"),
    ).first()
    return {"n_vecs": int(row["n"]), "xor64": int(row["x"])}


def _quantized_assignment(assigned: DataFrame) -> DataFrame:
    """(vec_id, q, q_scale, list_id): int8-quantize an assignment
    frame's embedding column — the stored row format of a
    quantize=True ANN layout (4x fewer vector bytes on disk and per
    probed scan)."""
    from .quantization import quantize_int8

    return quantize_int8(assigned).select("vec_id", "q", "q_scale", "list_id")


def store_ann_index(
    emb: DataFrame,
    base: str,
    n_list: int = 16,
    n_iters: int = 2,
    quantize: bool = False,
) -> None:
    """Fit the IVF coarse quantizer once and persist the similarity
    serving layout under ``base``:

    - ``<base>_vectors``   — (vec_id, embedding, list_id), external
      parquet PARTITIONED BY list_id: each inverted list is its own
      directory, so a query's nprobe probes prune to nprobe/n_list of
      the corpus at the DIRECTORY level (PartitionFilters), before any
      file is opened. With ``quantize=True`` the rows are
      (vec_id, q array<tinyint>, q_scale, list_id) instead — int8
      symmetric quantization (operators/quantization.py), 4x fewer
      vector bytes in every probed scan; scoring stays exact relative
      to the quantized representation because per-vector scales cancel
      in the cosine (quantized_cosine).
    - ``<base>_centroids`` — (list_id, centroid), n_list rows; query
      time collects them back as the driver-side constant the probe
      expressions fold in (the documented driver-scalar pattern —
      n_list * dim floats). Centroids stay full-precision either way:
      they are n_list rows, and probe selection quality should not pay
      for list compression.

    A JSON sidecar + :func:`attach_ann_index` give the same fresh-
    session re-attachment story as the text index — and the same
    invalidate-first/write-last sidecar hygiene as
    :func:`store_search_index`, so a crashed rebuild cannot leave an
    attachable sidecar beside partial tables."""
    from .similarity import ivf_assign, ivf_fit

    spark = emb.sparkSession
    try:
        os.remove(_meta_path(spark, base, kind="ann"))
    except FileNotFoundError:
        pass
    centroids = ivf_fit(emb, n_list=n_list, n_iters=n_iters)
    # store builds take the Arrow-batched assignment: the layout's
    # correctness anchor (full probe) is assignment-invariant, and the
    # equivalence test pins the two forms equal anyway
    assigned = ivf_assign(emb, centroids, vectorized=True)
    if quantize:
        assigned = _quantized_assignment(assigned)
    write_partitioned_table(assigned, f"{base}_vectors", ("list_id",))
    rows = [(j, [float(x) for x in c]) for j, c in enumerate(centroids)]
    write_table(
        spark.createDataFrame(rows, "list_id int, centroid array<double>"),
        f"{base}_centroids",
    )
    with open(_meta_path(spark, base, kind="ann"), "w") as fh:
        json.dump(
            {
                "version": 2,
                "n_list": len(centroids),
                "quantized": bool(quantize),
                "fingerprint": embeddings_fingerprint(emb),
            },
            fh,
        )
    # a completed rebuild supersedes any torn extend
    try:
        os.remove(_ann_extend_marker_path(spark, base))
    except FileNotFoundError:
        pass


def attach_ann_index(spark: SparkSession, base: str) -> None:
    """Re-register a stored ANN layout in a fresh session (no-op when
    already attached) — CREATE TABLE ... LOCATION DDL over the external
    files, partition spec intact."""
    tables = [f"{base}_vectors", f"{base}_centroids"]
    registered = [t for t in tables if spark.catalog.tableExists(t)]
    if len(registered) == len(tables):
        return
    for t in registered:  # repair a partial attach, never no-op on it
        spark.sql(f"DROP TABLE {t}")
    meta_path = _meta_path(spark, base, kind="ann")
    if not os.path.exists(meta_path):
        # layouts stored before the kind-specific sidecar rename used
        # the text sidecar's name; accept it ONLY when it is actually
        # an ANN sidecar (carries n_list), never a text store's file
        legacy = _meta_path(spark, base)
        if os.path.exists(legacy):
            with open(legacy) as fh:
                if "n_list" in json.load(fh):
                    meta_path = legacy
    with open(meta_path) as fh:
        meta = json.load(fh)  # a missing ANN sidecar is a loud error
    for t in tables:
        if not os.path.isdir(table_location(spark, t)):
            raise FileNotFoundError(
                f"no stored data for {t} at {table_location(spark, t)}"
            )
    loc = table_location(spark, f"{base}_vectors")
    vec_cols = (
        "vec_id bigint, q array<tinyint>, q_scale double, list_id int"
        if meta.get("quantized")
        else "vec_id bigint, embedding array<float>, list_id int"
    )
    spark.sql(
        f"CREATE TABLE {base}_vectors ({vec_cols}) "
        f"USING parquet PARTITIONED BY (list_id) LOCATION '{loc}'"
    )
    spark.catalog.recoverPartitions(f"{base}_vectors")
    loc = table_location(spark, f"{base}_centroids")
    spark.sql(
        f"CREATE TABLE {base}_centroids "
        "(list_id int, centroid array<double>) "
        f"USING parquet LOCATION '{loc}'"
    )


def _read_ann_meta(spark: SparkSession, base: str) -> dict:
    with open(_meta_path(spark, base, kind="ann")) as fh:
        return json.load(fh)


def _ann_extend_marker_path(spark: SparkSession, base: str) -> str:
    return table_location(spark, f"{base}_ann_extend_inprogress.marker")


def ann_extend_in_progress(spark: SparkSession, base: str) -> bool:
    """True when a previous :func:`extend_ann_index` started appending
    and never finished — the vectors table may hold a partial batch the
    sidecar fingerprint does not cover; rebuild (or re-run the extend
    after a rebuild from the pre-extend embeddings)."""
    return os.path.exists(_ann_extend_marker_path(spark, base))


def verify_ann_index(spark: SparkSession, base: str, emb: DataFrame) -> bool:
    """True iff the stored ANN layout provably describes ``emb``: no
    torn extend in progress, AND the sidecar's embeddings fingerprint
    matches the one recomputed from ``emb``. A pre-v2 sidecar (no
    fingerprint) is unverifiable and reports False — the same
    rebuild-on-unverifiable contract as :func:`verify_search_index`."""
    if ann_extend_in_progress(spark, base):
        return False
    try:
        meta = _read_ann_meta(spark, base)
    except FileNotFoundError:
        return False
    fp = meta.get("fingerprint")
    return fp is not None and fp == embeddings_fingerprint(emb)


def ensure_ann_index(
    emb: DataFrame,
    base: str,
    n_list: int = 16,
    n_iters: int = 2,
    quantize: bool = False,
) -> None:
    """Attach-or-build entry point for the stored ANN layout — the
    similarity surface's :func:`ensure_search_index`. After this
    returns, ``<base>_vectors``/``<base>_centroids`` are registered and
    provably current for ``emb``: tables registered this session are
    trusted (built or verified by the registering call), a fresh-session
    attach verifies the sidecar fingerprint, and anything else —
    missing store, regenerated embeddings at the same path, a storage
    format not matching ``quantize``, pre-v2 sidecar — triggers a full
    rebuild."""
    spark = emb.sparkSession
    tables = [f"{base}_vectors", f"{base}_centroids"]
    if all(spark.catalog.tableExists(t) for t in tables) and not (
        ann_extend_in_progress(spark, base)
    ):
        return
    try:
        attach_ann_index(spark, base)
        if verify_ann_index(spark, base, emb) and bool(
            _read_ann_meta(spark, base).get("quantized")
        ) == bool(quantize):
            return
    except FileNotFoundError:
        pass
    store_ann_index(emb, base, n_list=n_list, n_iters=n_iters, quantize=quantize)


def extend_ann_index(
    spark: SparkSession, base: str, new_emb: DataFrame
) -> None:
    """Append-only ingest of NEW vectors into a stored ANN layout — the
    similarity surface's :func:`extend_search_index`.

    Each new vector is assigned to its nearest EXISTING centroid: the
    coarse quantizer is fixed at build time (the standard IVF ingest
    contract — assignments of already-stored vectors must not move, or
    the stored lists would silently disagree with the quantizer), so
    the write is a pure partition-directory append of the batch's rows;
    cost grows with the BATCH, never the store. Re-fitting centroids
    when drift accumulates is a rebuild decision
    (:func:`store_ann_index`), not an append.

    Vec ids must be NEW (one semi-join against the stored vec_id
    column, bounded by the broadcast batch ids). Durability mirrors the
    text extend: assignment is computed and pinned before the store is
    touched; an ``ann_extend_inprogress`` marker brackets the append +
    sidecar update, so a crash mid-append is detectable
    (verify/ensure_ann_index refuse and rebuild); the sidecar
    fingerprint xor-composes with the batch's, so a later ensure over
    (old vectors + batch) verifies clean without a rebuild."""
    new_ids = new_emb.select("vec_id").distinct()
    n_overlap = (
        spark.table(f"{base}_vectors")
        .join(F.broadcast(new_ids), "vec_id", "left_semi")
        .count()
    )
    if n_overlap:
        raise ValueError(
            f"{n_overlap} vec_ids already exist in '{base}' — "
            "extend_ann_index is append-only (re-ingest requires a "
            "rebuild)"
        )
    from .similarity import ivf_assign

    meta = _read_ann_meta(spark, base)
    assigned = ivf_assign(
        new_emb, load_stored_centroids(spark, base), vectorized=True
    )
    if meta.get("quantized"):
        assigned = _quantized_assignment(assigned)
    assigned = assigned.localCheckpoint()
    batch_fp = embeddings_fingerprint(new_emb)

    with open(_ann_extend_marker_path(spark, base), "w") as fh:
        json.dump({"n_new_vecs": batch_fp["n_vecs"]}, fh)
    loc = table_location(spark, f"{base}_vectors")
    (
        assigned.write.format("parquet")
        .mode("append")
        .option("path", loc)
        .partitionBy("list_id")
        .saveAsTable(f"{base}_vectors")
    )
    spark.catalog.recoverPartitions(f"{base}_vectors")
    old_fp = meta.get("fingerprint")
    if old_fp is not None:
        meta["fingerprint"] = {
            "n_vecs": int(old_fp["n_vecs"]) + batch_fp["n_vecs"],
            "xor64": int(old_fp["xor64"]) ^ batch_fp["xor64"],
        }
    with open(_meta_path(spark, base, kind="ann"), "w") as fh:
        json.dump(meta, fh)
    os.remove(_ann_extend_marker_path(spark, base))


def load_stored_centroids(spark: SparkSession, base: str) -> list[list[float]]:
    rows = spark.table(f"{base}_centroids").orderBy("list_id").collect()
    return [[float(x) for x in r["centroid"]] for r in rows]


def ann_search_stored(
    spark: SparkSession,
    base: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    decimal_scores: bool = False,
) -> DataFrame:
    """(vec_a, vec_b, cosine, rank): IVF top-k served from the stored
    layout — row-identical to similarity.py ivf_topk run with the SAME
    centroids/nprobe (shared _topk_by_cosine tail and scoring
    expressions), but per-query-batch cost is the probed lists'
    partition directories, not a corpus re-assignment. ``queries`` is
    any (vec_id, embedding) frame — a query batch, not necessarily
    corpus members; corpus self-matches are excluded by id.

    The probe ids collect to the driver (one tiny action over the
    query batch) so the stored scan carries a STATIC IN filter on the
    partition column — pruning holds unconditionally, no reliance on
    runtime dynamic-partition-pruning kicking in.

    ``decimal_scores`` mirrors ivf_topk's flag: exact decimal cosine
    instead of the fast double fold, making ranks bit-identical to the
    decimal oracle formulation (the cross-engine-checked 'ivf_stored'
    registry part uses this; the double fold stays the production
    scoring path).

    Against a quantize=True store, scoring is quantized_cosine over the
    stored int8 rows and an int8 quantization of the query — per-vector
    scales cancel, so the result is row-identical to brute force over
    the quantized representation (quantization.quantized_topk); probe
    selection still uses the full-precision query and centroids.
    decimal_scores is meaningless there and refused."""
    return ann_from_frames(
        spark.table(f"{base}_vectors"),
        load_stored_centroids(spark, base),
        queries,
        k=k,
        nprobe=nprobe,
        decimal_scores=decimal_scores,
        quantized=bool(_read_ann_meta(spark, base).get("quantized")),
    )


def ann_from_frames(
    vectors: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    decimal_scores: bool = False,
    quantized: bool = False,
) -> DataFrame:
    """The frame-parameterized IVF search body — the similarity
    surface's :func:`bm25_from_frames`: ``vectors`` is any
    (vec_id, embedding|q[,q_scale], list_id) frame (the stored table, a
    streamed snapshot's parquet, an in-memory assignment), so the
    stored and streamed paths share one implementation and answer
    identically by construction. The probed list_ids land as a STATIC
    IN filter, which prunes partition directories whenever the frame is
    list_id-partitioned parquet."""
    from .similarity import (
        _centroid_order,
        _dot_expr,
        _norm_expr,
        _topk_by_cosine,
        norm_sq_expr,
    )

    nprobe = min(nprobe, len(centroids))
    if quantized:
        if decimal_scores:
            raise ValueError(
                "decimal_scores applies to full-precision stores only — "
                "a quantized store's exact representation IS the int8 one"
            )
        from .quantization import quantize_int8, quantized_cosine

        q = (
            quantize_int8(queries)
            .select(
                F.col("vec_id").alias("vec_a"),
                F.col("q").alias("qa"),
                F.explode(
                    F.slice(
                        _centroid_order(F.col("embedding"), centroids),
                        1,
                        nprobe,
                    )
                ).alias("list_id"),
            )
            .localCheckpoint(eager=False)
        )
        probe_ids = sorted(
            r["list_id"] for r in q.select("list_id").distinct().collect()
        )
        cand = vectors.where(F.col("list_id").isin(probe_ids)).select(
            "list_id", F.col("vec_id").alias("vec_b"), F.col("q").alias("qb")
        )
        cos = (
            F.broadcast(q)
            .join(cand, "list_id")
            .where(F.col("vec_a") != F.col("vec_b"))
            .select(
                "vec_a",
                "vec_b",
                quantized_cosine(F.col("qa"), F.col("qb")).alias("cosine"),
            )
        )
        return _topk_by_cosine(cos, k)

    norm = norm_sq_expr if decimal_scores else _norm_expr
    # pinned: the probe subplan (queries scan + centroid-distance sort)
    # is used twice — collected for the partition filter AND broadcast
    # into the join — and `queries` may itself be expensive
    q = queries.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("qn"),
        F.explode(
            F.slice(_centroid_order(F.col("embedding"), centroids), 1, nprobe)
        ).alias("list_id"),
    ).localCheckpoint(eager=False)
    probe_ids = sorted(
        r["list_id"] for r in q.select("list_id").distinct().collect()
    )
    cand = vectors.where(F.col("list_id").isin(probe_ids)).select(
        "list_id",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("ce"),
        norm(F.col("embedding")).alias("cn"),
    )
    joined = (
        F.broadcast(q)
        .join(cand, "list_id")
        .where(F.col("vec_a") != F.col("vec_b"))
    )
    if decimal_scores:
        # Arrow-batched twin of the decimal-cosine expression —
        # bit-identical (similarity.decimal_cosine_pairs_vectorized)
        from .similarity import decimal_cosine_joined_vectorized

        cos = decimal_cosine_joined_vectorized(joined)
    else:
        score = F.round(
            _dot_expr(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6
        )
        cos = joined.select("vec_a", "vec_b", score.alias("cosine"))
    return _topk_by_cosine(cos, k)


def ann_probe_order(spark: SparkSession, base: str, embedding_col) -> F.Column:
    """The stored quantizer's list ids ordered by distance from
    ``embedding_col`` — the probe-order expression callers use to
    reason about (or test) which partitions a query touches."""
    from .similarity import _centroid_order

    return _centroid_order(embedding_col, load_stored_centroids(spark, base))


def extend_search_index(
    spark: SparkSession,
    base: str,
    new_docs: DataFrame,
    defer_chunks: bool = False,
) -> None:
    """Fold NEW documents into a stored serving layout incrementally —
    the daily-ingest path (same role as index.py merge_index_chunked,
    extended to the whole four-table layout).

    Incrementality per table, honestly stated:

    - ``positions`` / ``doclen``: pure bucketed APPENDS. New documents
      only ever add (word, doc_id) rows — no stored row changes — and
      Spark's bucketed writer routes appended files into the same
      bucket ids (verified: filename bucket suffixes match across
      writes, and bucket pruning keeps working over the union). Write
      cost is proportional to the NEW data only.
    - ``stats``: one tiny rewrite (n_docs add + doclen re-average).
    - ``chunks``: COMPUTE-incremental, storage-rewritten — the merge
      re-chunks only the words the new docs touch (untouched words
      pass through byte-identical via merge_index_chunked's anti-join)
      but the rewrite is table-sized, because plain parquet cannot
      replace individual bucketed rows. ``defer_chunks=True`` removes
      this term entirely — the ONE store-proportional cost in the
      extend (measured in BENCH_NOTES.md round 5): the chunks table is
      left as-is and flagged stale in the sidecar
      (``chunks_current: false``), every chunk-served query path
      (:func:`stored_term_postings` and everything built on it)
      transparently falls back to the appended positions table — same
      letter/bucket pruning, correct the instant the extend commits —
      and :func:`compact_search_index` is the scheduled job that
      rebuilds chunks from positions (atomic swap) and restores the
      fast path. A non-deferred extend on a stale store folds the
      catch-up in: chunks rebuild from (positions + batch), so the
      merge can never resurrect a pre-deferral view.

    Doc ids must be NEW: a re-ingested id would corrupt the append-only
    positions contract, so overlap is a loud error (one semi-join
    against the stored doclen, bounded by the new batch's ids).

    Durability protocol (round-5 hardening; crash-injected in
    tests/test_serving_lifecycle.py):

    - EVERYTHING is computed and pinned BEFORE the first byte of the
      store is touched — a failure in the compute phase leaves the
      store byte-identical.
    - an ``extend_inprogress`` marker brackets the multi-table mutation:
      the four tables cannot be updated in one atomic step on plain
      parquet, so a crash mid-extend leaves a TORN store (e.g.
      positions include the new docs while chunks/stats exclude them) —
      the marker makes that state detectable; verify_search_index /
      ensure_search_index refuse it and rebuild.
    - the chunks rewrite goes through :func:`_replace_chunks_atomic`
      (write ``__next`` completely, publish by rename): no crash window
      destroys the only copy of the chunks table, which the previous
      DROP+rmtree+rewrite could.
    - the sidecar fingerprint is updated by xor-composition with the
      batch's fingerprint, so a later ensure over (old corpus + batch)
      verifies clean without a rebuild.
    """
    from .index import merge_index_chunked

    new_ids = new_docs.select("doc_id").distinct()
    n_overlap = (
        spark.table(f"{base}_doclen")
        .join(F.broadcast(new_ids), "doc_id", "left_semi")
        .count()
    )
    if n_overlap:
        raise ValueError(
            f"{n_overlap} doc_ids already exist in '{base}' — "
            "extend_search_index is append-only (re-ingest requires a "
            "rebuild or a versioned swap)"
        )
    meta = _read_meta(spark, base)
    n_buckets, chunk_size = int(meta["n_buckets"]), int(meta["chunk_size"])

    # ---- compute phase: store untouched until everything is pinned ----
    # ONE tokenization of the new batch (pinned positional frame) feeds
    # positions, doclen, AND the chunk merge's new-pairs side
    new_pos = (
        positional_postings(new_docs)
        .withColumn("tf", F.size("positions").cast("long"))
        .withColumn("letter", F.substring("word", 1, 1))
        .localCheckpoint(eager=False)
    )
    # chunks: merge BEFORE touching storage, EAGERLY materialized so the
    # write cannot lazily re-read tables this extend mutates first
    if defer_chunks:
        merged = None  # positions fallback serves until compaction
    elif not meta.get("chunks_current", True):
        # stale store: an incremental merge against the lagging chunks
        # would miss earlier deferred batches — rebuild from the source
        # of truth (stored positions + this batch) instead
        merged = chunk_pairs(
            spark.table(f"{base}_positions")
            .select("word", "doc_id")
            .unionByName(new_pos.select("word", "doc_id")),
            chunk_size=chunk_size,
        ).localCheckpoint()
    else:
        merged = merge_index_chunked(
            spark.table(f"{base}_chunks"),
            new_docs,
            chunk_size=chunk_size,
            new_pairs=new_pos.select("word", "doc_id"),
        ).localCheckpoint()
    batch_fp = corpus_fingerprint(new_docs)

    # ---- mutate phase: bracketed by the torn-extend marker ----
    _write_extend_marker(spark, base, {"n_new_docs": batch_fp["n_docs"]})
    loc = table_location(spark, f"{base}_positions")
    (
        new_pos.write.format("parquet")
        .mode("append")
        .option("path", loc)
        .partitionBy("letter")
        .bucketBy(n_buckets, "word")
        .sortBy("word")
        .saveAsTable(f"{base}_positions")
    )
    new_doclen = new_pos.groupBy("doc_id").agg(
        F.sum(F.size("positions")).cast("long").alias("dl")
    )
    loc = table_location(spark, f"{base}_doclen")
    (
        new_doclen.write.format("parquet")
        .mode("append")
        .option("path", loc)
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(f"{base}_doclen")
    )
    # doc-major transpose: tf only (no idf baked in), so the extend is a
    # pure bucketed append here too
    new_docterms = new_pos.select("doc_id", "word", "tf")
    loc = table_location(spark, f"{base}_docterms")
    (
        new_docterms.write.format("parquet")
        .mode("append")
        .option("path", loc)
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(f"{base}_docterms")
    )
    # reversed-word companion (v5 stores): append the BATCH's distinct
    # words only — a word already stored lands again as a duplicate row,
    # which readers tolerate (distinct at read after partition+prefix
    # pruning bounds the cost by the match set) and compaction dedupes;
    # the alternative, an anti-join against the stored vocabulary,
    # would put a store-proportional read in the ingest path
    rwords_table = f"{base}_rwords"
    loc = table_location(spark, rwords_table)
    if os.path.isdir(loc):
        if not spark.catalog.tableExists(rwords_table):
            _create_stored_table(
                spark, rwords_table,
                _bucketed_specs(base)[rwords_table], n_buckets,
            )
        (
            _rwords_frame(new_pos.select("word"))
            .write.format("parquet")
            .mode("append")
            .option("path", loc)
            .partitionBy("rletter")
            .bucketBy(n_buckets, "rword")
            .sortBy("rword")
            .saveAsTable(rwords_table)
        )
    if merged is not None:
        _replace_chunks_atomic(spark, base, merged, n_buckets)
    old = spark.table(f"{base}_stats").first()
    n_docs = int(old["n_docs"]) + batch_fp["n_docs"]
    stats = spark.table(f"{base}_doclen").agg(
        F.lit(n_docs).cast("long").alias("n_docs"),
        F.coalesce(F.avg("dl"), F.lit(1.0)).alias("avgdl"),
    ).localCheckpoint()
    write_table(stats, f"{base}_stats")
    old_fp = meta.get("fingerprint")
    if old_fp is not None:
        meta["fingerprint"] = {
            "n_docs": int(old_fp["n_docs"]) + batch_fp["n_docs"],
            "xor64": int(old_fp["xor64"]) ^ batch_fp["xor64"],
        }
    # merged is None  -> this extend deferred: chunks now lag positions;
    # merged written  -> chunks cover everything again (incl. catch-up)
    meta["chunks_current"] = merged is not None
    # norms bake idf in and EVERY extend moves df, so norms always go
    # stale here — recomputing them is a corpus-scale aggregation, the
    # exact cost class deferral exists to keep out of the ingest path;
    # mlt_search_stored recomputes on the fly until compaction
    meta["norms_current"] = False
    with open(_meta_path(spark, base), "w") as fh:
        json.dump(meta, fh)
    _clear_extend_marker(spark, base)


def compact_search_index(spark: SparkSession, base: str) -> None:
    """Rebuild the DERIVED tables from the positions table and restore
    every fast lookup path — the scheduled compaction that pairs with
    :func:`extend_search_index`: chunks when a deferred extend left
    them lagging, norms after ANY extend (idf moved). No-op when both
    are current.

    Each rebuild reads one projection of positions — already distinct
    by construction — through the same derivations as a from-scratch
    build, and publishes via the atomic __next-then-rename swap, so a
    crash at any point leaves a complete table on disk. The sidecar
    flags flip only AFTER the swaps: a crash between leaves fresh
    tables still flagged stale — queries stay correct on the fallback
    paths and the next compaction clears it; never the reverse state,
    where a stale table would be trusted."""
    meta = _read_meta(spark, base)
    n_buckets = int(meta["n_buckets"])
    changed = False
    # extends append the batch vocabulary to rwords without dedup (see
    # extend_search_index); stale norms is the reliable "an extend
    # happened since the last compaction" signal, so it also schedules
    # the rwords dedup below
    had_extends = not meta.get("norms_current", True)
    if not meta.get("chunks_current", True):
        merged = chunk_pairs(
            spark.table(f"{base}_positions").select("word", "doc_id"),
            chunk_size=int(meta["chunk_size"]),
        ).localCheckpoint()
        _replace_chunks_atomic(spark, base, merged, n_buckets)
        meta["chunks_current"] = True
        changed = True
    if not meta.get("norms_current", True):
        norms = (
            tfidf_norms(_stored_weighted_terms(spark, base))
            .select("doc_id", F.col("n2").cast("decimal(38,12)").alias("n2"))
            .localCheckpoint()
        )
        _replace_table_atomic(spark, base, "_norms", norms, n_buckets)
        meta["norms_current"] = True
        changed = True
    rwords_table = f"{base}_rwords"
    stored_words = spark.table(f"{base}_positions").select("word")
    if not os.path.isdir(table_location(spark, rwords_table)):
        # upgrade path: a pre-v5 store gains the suffix companion here
        # (one distinct over positions' word column), so compaction is
        # the scheduled job that both maintains AND retrofits it
        write_bucketed(
            _rwords_frame(stored_words),
            rwords_table,
            "rword",
            n_buckets,
            sort_col="rword",
            partition_cols=("rletter",),
        )
        meta["version"] = max(int(meta.get("version", 1)), 5)
        changed = True
    elif had_extends:
        # dedupe the appended vocabulary (atomic swap, same protocol)
        _replace_table_atomic(
            spark, base, "_rwords", _rwords_frame(stored_words)
            .localCheckpoint(), n_buckets,
        )
        changed = True
    if changed:
        with open(_meta_path(spark, base), "w") as fh:
            json.dump(meta, fh)


def _stored_weighted_terms(spark: SparkSession, base: str) -> DataFrame:
    """(word, doc_id, w) TF-IDF weighted terms derived on the fly from
    the stored docterms table + the stats row — the norms-rebuild source
    and the stale-norms query fallback, sharing index.tfidf_weighted so
    values are bit-identical to a fresh build's."""
    n_docs = int(spark.table(f"{base}_stats").first()["n_docs"])
    return tfidf_weighted(
        spark.table(f"{base}_docterms").select("word", "doc_id", "tf"), n_docs
    )


def serving_store_stats(spark: SparkSession, base: str) -> dict:
    """Operational introspection of a stored serving layout — metadata
    and filesystem facts only (no Spark jobs): sidecar version, bucket
    count, corpus fingerprint, per-table file counts and byte sizes,
    and the three health flags an operator acts on (torn extend ->
    rebuild; stale chunks/norms -> schedule compact_search_index; all
    healthy -> nothing to do)."""
    meta = _read_meta(spark, base)
    tables = {}
    for suffix in ("_chunks", "_positions", "_doclen", "_docterms",
                   "_norms", "_rwords", "_stats"):
        loc = table_location(spark, f"{base}{suffix}")
        n_files = n_bytes = 0
        if os.path.isdir(loc):
            for root, _dirs, files in os.walk(loc):
                for f in files:
                    if not f.startswith(("_", ".")):
                        n_files += 1
                        n_bytes += os.path.getsize(os.path.join(root, f))
        tables[suffix.lstrip("_")] = {
            "present": os.path.isdir(loc),
            "n_files": n_files,
            "bytes": n_bytes,
        }
    return {
        "base": base,
        "version": int(meta.get("version", 1)),
        "n_buckets": int(meta["n_buckets"]),
        "chunk_size": int(meta["chunk_size"]),
        "fingerprint": meta.get("fingerprint"),
        "extend_in_progress": extend_in_progress(spark, base),
        "chunks_current": bool(meta.get("chunks_current", True)),
        "norms_current": bool(meta.get("norms_current", True)),
        "tables": tables,
    }


def suffix_matched_words(
    spark: SparkSession, base: str, sfx: str
) -> DataFrame:
    """Single-column ``word`` frame of stored vocabulary terms ending in
    ``sfx`` (already normalized) — the vocabulary pass of
    :func:`suffix_search_stored`, factored out so plan tests can assert
    its pruning. Two shapes:

    - v5 stores carry the ``_rwords`` reversed-vocabulary companion:
      the suffix becomes a PREFIX predicate on ``rword``, so the scan
      prunes to ONE ``rletter`` partition directory (PartitionFilters)
      with the startswith pushed into it — prefix_search_stored's cost,
      bounded by the match set, flat in corpus size. Duplicate rows
      from un-compacted extends are dropped by the distinct.
    - pre-v5 stores fall back to the column-pruned vocabulary scan over
      chunks/positions (the fuzzy_term_search_stored shape)."""
    rwords_table = f"{base}_rwords"
    if os.path.isdir(table_location(spark, rwords_table)):
        if not spark.catalog.tableExists(rwords_table):
            _create_stored_table(
                spark, rwords_table,
                _bucketed_specs(base)[rwords_table],
                int(_read_meta(spark, base)["n_buckets"]),
            )
        rsfx = sfx[::-1]
        return (
            spark.table(rwords_table)
            .where(F.col("rletter") == rsfx[0])
            .where(F.col("rword").startswith(rsfx))
            .select("word")
            .distinct()
        )
    src = "_chunks" if chunks_current(spark, base) else "_positions"
    return (
        spark.table(f"{base}{src}")
        .select("word")
        .distinct()
        .where(F.col("word").endswith(sfx))
    )


def suffix_search_stored(
    spark: SparkSession, base: str, suffix: str, cap: int = VOCAB_INLINE_CAP
) -> DataFrame:
    """(letter, word, df, postings): index.py suffix_search served from
    the stored layout. The vocabulary pass goes through
    :func:`suffix_matched_words` (directory-pruned via the ``_rwords``
    reversed-word companion on v5 stores; column-pruned scan fallback
    on older layouts), then the postings fetch goes through
    :func:`stored_postings_for_matched` (bucket-pruned IN list up to
    ``cap`` matches, collect-free semi-join above it — a short suffix
    over a huge vocabulary must never pull the match set to the
    driver); staleness-aware on both branches."""
    sfx = _normalize_single_term(suffix, "suffix")
    matched = suffix_matched_words(spark, base, sfx)
    return stored_postings_for_matched(spark, base, matched, cap=cap)
