"""Sequence packing: batch documents into fixed token budgets.

LLM training consumes fixed-length sequences; feeding one short document
per sequence wastes the budget on padding. Packing assigns documents to
"bins" whose token totals approach the budget. Optimal bin packing is
NP-hard and needs global state — the scalable form is partition-local
first-fit-decreasing (FFD): sort each partition's docs by length
descending, open a new bin only when no open bin fits. Partition-local
is the right trade at 100 TB: bins never span executors (no shuffle of
document payloads), quality loss vs global FFD is a few percent of
fill, and the whole pass is one Arrow-batched scan.

The only Python here is the greedy loop itself — state is one array of
open-bin capacities per partition; assignments stream out per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def pack_sequences(
    docs_with_len: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*id_cols, n_tokens, bin_id): every doc in exactly one bin; a
    multi-doc bin never exceeds ``budget``; docs longer than the budget
    get a bin of their own (the caller chunks or drops them).

    ``id_cols`` is a composite row key carried through unchanged — a
    multi-column key (e.g. ``(doc_id, chunk_id)``) avoids bit-packing
    two ids into one long, which silently collides once the high part
    reaches 2^31.

    Deterministic for a fixed partitioning (sortWithinPartitions makes
    the per-partition order canonical); bin ids are globally unique via
    the partition id in the high bits.
    """
    id_cols = tuple(id_cols)
    prepared = (
        docs_with_len.select(
            *[F.col(c).cast("long").alias(c) for c in id_cols],
            F.col(token_col).cast("long").alias("n_tokens"),
        )
        .withColumn("pid", F.spark_partition_id())
        .sortWithinPartitions(
            F.desc("n_tokens"), *[F.asc(c) for c in id_cols]
        )
    )
    out_schema = ", ".join(
        [f"{c} long" for c in id_cols] + ["n_tokens long", "bin_id long"]
    )

    cap = int(budget)

    def pack(batches):
        # Best-fit-decreasing via a capacity-sorted list: find the
        # SMALLEST open bin that fits (bisect, O(log n) compare), pop,
        # re-insert with reduced capacity. A linear first-fit scan goes
        # quadratic exactly in the common case — near-full bins that
        # never fit anything again but are re-scanned for every doc.
        # insort's O(n) memmove is C-level; the Python work per doc is
        # O(log n).
        import bisect

        by_cap: list[list] = []  # sorted [remaining, bin_idx] pairs
        n_bins = 0
        for pdf in batches:
            out_bins = []
            for toks, pid in zip(pdf["n_tokens"], pdf["pid"]):
                t = int(toks)
                i = bisect.bisect_left(by_cap, [t]) if t < cap else len(by_cap)
                if i < len(by_cap):
                    rem, idx = by_cap.pop(i)
                else:  # nothing fits (or doc at/over budget): open a bin
                    rem, idx = cap, n_bins
                    n_bins += 1
                rem -= t
                if rem > 0:
                    bisect.insort(by_cap, [rem, idx])
                out_bins.append((int(pid) << 32) | idx)
            pdf = pdf[list(id_cols) + ["n_tokens"]].copy()
            pdf["bin_id"] = out_bins
            yield pdf

    return prepared.mapInPandas(pack, schema=out_schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """(n_bins, n_docs, fill_pct): the utilization a pipeline monitors.
    Fill counts only bins within budget (oversize singleton bins are the
    input's fault, not the packer's)."""
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("n_docs")
    )
    inside = bins.where(F.col("total") <= budget)
    return bins.agg(
        F.count("*").cast("long").alias("n_bins"),
        F.sum("n_docs").cast("long").alias("n_docs"),
    ).crossJoin(
        inside.agg(
            F.round(100.0 * F.avg(F.col("total") / F.lit(float(budget))), 2).alias(
                "fill_pct"
            )
        )
    )
