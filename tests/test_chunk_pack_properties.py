"""Property-based invariants for chunking and packing.

Hypothesis drives doc shapes (token counts, including empties and
singletons) through one shared SparkSession; each property re-checks
the invariants the fixed-fixture tests pin, but over adversarial
length distributions a real corpus won't volunteer.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.operators.chunking import (
    chunk_documents,
)
from parallel_inverted_index_map_reduce_spark.operators.packing import (
    pack_sequences,
)

CHUNK, OVERLAP = 16, 4
BUDGET = 32

lengths = st.lists(st.integers(min_value=0, max_value=70), min_size=1, max_size=25)


def _docs(spark, ns):
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(n))) for i, n in enumerate(ns)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ns=lengths)
def test_chunking_properties(spark, ns):
    chunks = chunk_documents(_docs(spark, ns), CHUNK, OVERLAP).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(ns):
        got = sorted(by_doc.get(i, []), key=lambda r: r.chunk_id)
        if n == 0:
            assert got == []
            continue
        # every token covered exactly in order, bounded windows, overlap
        stride = CHUNK - OVERLAP
        assert [r.chunk_id for r in got] == list(range(len(got)))
        assert all(r.n_tokens <= CHUNK for r in got)
        seen = []
        for k, r in enumerate(got):
            toks = r.chunk.split(" ")
            start = k * stride
            assert toks == [f"w{i}x{j}" for j in range(start, start + len(toks))]
            seen = toks if not seen else seen + toks[OVERLAP:]
        assert seen == [f"w{i}x{j}" for j in range(n)]
        if n <= CHUNK:
            assert len(got) == 1


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ns=lengths)
def test_packing_properties(spark, ns):
    docs = _docs(spark, ns).select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), t -> t != '')")).alias("n_tokens"),
    )
    packed = pack_sequences(docs, BUDGET).collect()
    assert sorted(r.doc_id for r in packed) == list(range(len(ns)))
    totals: dict[int, int] = {}
    counts: dict[int, int] = {}
    for r in packed:
        totals[r.bin_id] = totals.get(r.bin_id, 0) + r.n_tokens
        counts[r.bin_id] = counts.get(r.bin_id, 0) + 1
    for b, total in totals.items():
        assert counts[b] == 1 or total <= BUDGET
