"""Multimodal plumbing: the Arrow-batched paths must agree with plain
column-expression recomputation (1:1 features) and with driver-side
chunk math (1:N frame sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators import multimodal as mm


DOCS = [
    (1, "alpha beta gamma delta epsilon zeta"),  # 35 bytes
    (2, "x"),
    (3, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_binary_features_match_column_exprs(spark):
    got = {r.doc_id: r for r in mm.binary_features(_docs(spark)).collect()}
    want = {
        r.doc_id: r
        for r in _docs(spark)
        .select(
            "doc_id",
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g.n_bytes == w.n_bytes, doc_id
    assert got[2].first_byte == ord("x") == got[2].last_byte
    assert got[3].first_byte == -1 and got[3].byte_sum == 0


def test_frame_samples_chunk_math(spark):
    rows = mm.frame_samples(
        _docs(spark), frame_bytes=4, stride=2, max_frames=3
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 35 bytes -> offsets 0, 8, 16 all in range: 3 frames of 4 bytes
    d1 = sorted(by_doc[1], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in d1] == [0, 1, 2]
    text1 = DOCS[0][1].encode()
    assert [bytes(r.frame) for r in d1] == [
        text1[0:4],
        text1[8:12],
        text1[16:20],
    ]
    assert all(r.n_frame_bytes == 4 for r in d1)
    # doc 2: 1 byte -> one short frame; doc 3: empty -> no rows
    assert [bytes(r.frame) for r in by_doc[2]] == [b"x"]
    assert by_doc[2][0].n_frame_bytes == 1
    assert 3 not in by_doc
