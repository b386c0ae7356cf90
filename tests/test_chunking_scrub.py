"""Chunking coverage/overlap invariants and scrub redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.functions.scrub import (
    scrub_counts,
    scrub_text,
)
from parallel_inverted_index_map_reduce_spark.operators.chunking import (
    chunk_documents,
)
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE

CHUNK, OVERLAP = 32, 8


def test_chunking_invariants(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    base = docs.select("doc_id", F.size(toks).alias("n"))
    chunks = chunk_documents(docs, CHUNK, OVERLAP).cache()

    # reconstruction: stride-prefix of every non-final chunk + the FULL
    # final chunk (which may be longer than a stride) == the document
    stride = CHUNK - OVERLAP
    last = chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("last_id"))
    rebuilt = (
        chunks.join(last, "doc_id")
        .withColumn(
            "head",
            F.when(F.col("chunk_id") == F.col("last_id"), F.col("chunk")).otherwise(
                F.array_join(
                    F.slice(
                        F.expr("filter(split(chunk, ' '), t -> t != '')"), 1, stride
                    ),
                    " ",
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "head"))),
                    lambda s: s["head"],
                ),
                " ",
            ).alias("joined")
        )
    )
    orig = docs.select("doc_id", F.array_join(toks, " ").alias("norm"))
    diff = rebuilt.join(orig, "doc_id").where(F.col("joined") != F.col("norm"))
    assert diff.count() == 0

    # short docs -> exactly one chunk; chunk sizes bounded
    one = base.where((F.col("n") > 0) & (F.col("n") <= CHUNK))
    n_single = (
        chunks.join(one, "doc_id", "left_semi")
        .groupBy("doc_id")
        .count()
        .where(F.col("count") != 1)
        .count()
    )
    assert n_single == 0
    assert chunks.where(F.col("n_tokens") > CHUNK).count() == 0

    # consecutive chunks share exactly OVERLAP tokens of position
    two_plus = chunks.groupBy("doc_id").count().where(F.col("count") >= 2)
    sample = chunks.join(two_plus, "doc_id", "left_semi")
    full = sample.where(F.col("chunk_id") == 0).select("doc_id", "chunk")
    assert full.count() > 0  # fixture has multi-chunk docs


def test_scrub_masks_and_counts(spark):
    rows = [
        (0, "contact me at alice@example.com or +1 (555) 123-4567 now"),
        (1, "server 10.0.0.1 had no issues"),
        (2, "plain text only"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = df.select(
        "id",
        scrub_text(F.col("text")).alias("clean"),
        scrub_counts(F.col("text")).alias("c"),
    ).collect()
    by_id = {r.id: r for r in out}
    assert "<EMAIL>" in by_id[0].clean and "<PHONE>" in by_id[0].clean
    assert "alice@example.com" not in by_id[0].clean
    assert by_id[0].c.n_emails == 1 and by_id[0].c.n_phones == 1
    assert by_id[1].clean == "server <IP> had no issues"
    assert by_id[1].c.n_ips == 1
    assert by_id[2].clean == "plain text only"
    assert (by_id[2].c.n_emails, by_id[2].c.n_ips, by_id[2].c.n_phones) == (0, 0, 0)


def test_scrub_idempotent_and_composes(spark):
    """scrub(scrub(x)) == scrub(x) over a grid of interleaved PII and
    benign-numeric snippets — replacement sentinels must never re-match
    any pattern, and masking one kind must not expose another."""
    pii = [
        "mail alice@example.com",
        "ip 10.0.0.1",
        "call (555) 123-4567",
        "intl +40 721 234 567",
    ]
    benign = ["year 2020-2021", "pi 3.14159265", "count 1000000", "plain words"]
    rows = []
    i = 0
    for a in pii + benign:
        for b in pii + benign:
            rows.append((i, f"{a} then {b} end"))
            i += 1
    df = spark.createDataFrame(rows, ["id", "text"])
    out = df.select(
        "id",
        scrub_text(F.col("text")).alias("once"),
        scrub_text(scrub_text(F.col("text"))).alias("twice"),
    )
    diverged = out.where(F.col("once") != F.col("twice"))
    assert diverged.count() == 0, diverged.take(3)
    # every PII-bearing row got masked; benign-only rows are untouched
    masked = {r.id: r.once for r in out.collect()}
    for rid, text in rows:
        has_pii = any(p.split(" ", 1)[1] in text for p in pii)
        tokens_present = any(t in masked[rid] for t in ("<EMAIL>", "<IP>", "<PHONE>"))
        assert tokens_present == has_pii, (text, masked[rid])


def test_scrub_phone_requires_phone_structure(spark):
    """PHONE_RE masks structured phone shapes only — benign numeric text
    (dates, year ranges, decimals, plain integers) must survive."""
    masked = [
        "+40721234567",
        "+40 721 234 567",
        "(555) 123-4567",
        "555-123-4567",
        "555.123.4567",
        "call 555 123 4567.",
    ]
    unmasked = [
        "the 2020-2021 season",
        "released 2024-01-15 10:30",
        "about 1000000 rows",
        "pi is 3.14159265",
        "thousand-sep chains like 1.234.567.8901",
        "ids 12345678 and 987654321",
        "budget of 10,000,000 dollars",
    ]
    rows = [(i, t) for i, t in enumerate(masked + unmasked)]
    out = {
        r.id: r.clean
        for r in spark.createDataFrame(rows, ["id", "text"])
        .select("id", scrub_text(F.col("text")).alias("clean"))
        .collect()
    }
    for i, text in enumerate(masked):
        assert "<PHONE>" in out[i], f"should mask: {text!r} -> {out[i]!r}"
    for j, text in enumerate(unmasked):
        i = len(masked) + j
        assert out[i] == text, f"should NOT mask: {text!r} -> {out[i]!r}"


def test_cdc_chunks_cover_and_locality(spark):
    from parallel_inverted_index_map_reduce_spark.operators.chunking import (
        cdc_chunks,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    cdc = cdc_chunks(docs, window=3, divisor=8).cache()
    # coverage: concatenating a doc's chunks in chunk_id order rebuilds
    # the normalized (single-spaced, trimmed) document exactly
    rebuilt = cdc.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("re")
    )
    norm = docs.select(
        "doc_id",
        F.array_join(
            F.expr("filter(split(text, ' '), t -> t != '')"), " "
        ).alias("orig"),
    ).where(F.length("orig") > 0)
    joined = norm.join(rebuilt, "doc_id", "left")
    assert joined.where(
        (F.col("re").isNull()) | (F.col("re") != F.col("orig"))
    ).count() == 0

    # chunk ids dense from 0
    agg = cdc.groupBy("doc_id").agg(
        F.min("chunk_id").alias("lo"),
        F.max("chunk_id").alias("hi"),
        F.count("*").alias("n"),
    )
    assert agg.where(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
    ).count() == 0

    # CONTENT-DEFINED locality: editing one token in the middle of a
    # doc leaves every chunk hash outside the edit's neighborhood
    # identical (fixed-width chunking would shift the whole tail)
    one = docs.where(F.col("doc_id") == 1)
    orig = {
        (r.chunk_id): r.chunk
        for r in cdc_chunks(one, window=3, divisor=8).collect()
    }
    assert len(orig) >= 3, "doc 1 must split into several chunks"
    edited = one.select(
        "doc_id",
        F.array_join(
            F.expr(
                "transform(filter(split(text, ' '), t -> t != ''), "
                "(t, i) -> CASE WHEN i = 25 THEN 'EDITEDTOKEN' ELSE t END)"
            ),
            " ",
        ).alias("text"),
    )
    after = {
        (r.chunk_id): r.chunk
        for r in cdc_chunks(edited, window=3, divisor=8).collect()
    }
    shared = set(orig.values()) & set(after.values())
    # all chunks fully before or after the edit window survive verbatim
    assert len(shared) >= max(0, len(orig) - 3)


def test_cdc_chunks_invariant_under_repartition(spark):
    from parallel_inverted_index_map_reduce_spark.operators.chunking import (
        cdc_chunks,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    a = cdc_chunks(docs, window=3, divisor=8)
    b = cdc_chunks(docs.repartition(13), window=3, divisor=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cdc_chunks_edge_params(spark):
    from parallel_inverted_index_map_reduce_spark.operators.chunking import (
        cdc_chunks,
    )
    import pytest as _pt

    docs = spark.createDataFrame(
        [(0, "one"), (1, "a b"), (2, ""), (3, None), (4, "w x y z q r s t")],
        "doc_id long, text string",
    )
    # window longer than every doc: one chunk per non-empty doc
    rows = cdc_chunks(docs, window=50, divisor=2).collect()
    assert {(r.doc_id, r.chunk_id) for r in rows} == {(0, 0), (1, 0), (4, 0)}
    assert all(r.chunk_id == 0 for r in rows)
    # divisor=1: boundary after EVERY position >= window; the first
    # window-1 tokens ride with the first boundary's chunk
    rows1 = cdc_chunks(docs.where("doc_id = 4"), window=3, divisor=1).collect()
    sizes = [r.n_tokens for r in sorted(rows1, key=lambda r: r.chunk_id)]
    assert sizes == [3, 1, 1, 1, 1, 1]  # 8 tokens: [w x y] then singletons
    with _pt.raises(ValueError):
        cdc_chunks(docs, window=0)
    with _pt.raises(ValueError):
        cdc_chunks(docs, divisor=0)


def test_documents_fixture_is_scrub_identity(spark):
    """The pipe_streamed/pipe_batch oracles (plans/queries_dedup.py)
    replay the prep composition over RAW text, relying on scrub_text
    being the identity on the synthetic corpus (no '@', no digits).
    Pin that invariant: if the data generator ever emits PII-shaped
    text, fail HERE with a clear message instead of the driver rows
    going silently red."""
    from pyspark.sql import functions as F

    from parallel_inverted_index_map_reduce_spark.functions.scrub import (
        scrub_counts,
    )
    from parallel_inverted_index_map_reduce_spark.sources.tables import (
        load_table,
    )

    from .conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    c = scrub_counts(F.col("text"))
    row = docs.agg(
        F.sum(c.getField("n_emails")).alias("e"),
        F.sum(c.getField("n_ips")).alias("i"),
        F.sum(c.getField("n_phones")).alias("p"),
    ).first()
    assert (row.e, row.i, row.p) == (0, 0, 0), (
        "documents fixture now contains PII-shaped text; the pipe_* "
        "oracle replay over raw text is no longer valid — scrub the "
        "oracle side or regenerate the fixture"
    )
