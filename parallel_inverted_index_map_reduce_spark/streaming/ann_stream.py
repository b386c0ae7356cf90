"""Streamed maintenance of the ANN serving layout.

The similarity surface's streaming/serving_stream.py: embeddings arrive
as a stream (new documents' vectors landing continuously in a training-
data pipeline), and each micro-batch publishes a complete versioned
snapshot (``batch_id=N/{vectors,centroids}``) under the streaming
sinks' commit-marker protocol — a version is complete-or-invisible,
readers always see the latest COMMITTED snapshot, and a crash between
the data write and the marker leaves an ignored partial directory the
replayed batch overwrites.

Quantizer contract, same as operators/serving.py extend_ann_index: the
FIRST non-empty batch fits the coarse quantizer (seed the stream with a
representative batch); every later batch is assigned under those FIXED
centroids and unioned in, so stored assignments never move. Re-fitting
drifted centroids is a new-store decision, not a stream operation.
Vec ids must be unique across the stream (append-only corpus).

Snapshots write vectors PARTITIONED BY list_id, so query-side probe
pruning (PartitionFilters on the static IN) matches the stored-table
path; queries run through the SAME frame-parameterized body
(serving.ann_from_frames), so streamed answers are the stored path's
answers by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import sinks as eo

ARTIFACTS = {
    "vectors": "vec_id bigint, embedding array<float>, list_id int",
    "centroids": "list_id int, centroid array<double>",
}


def read_ann_version(
    spark: SparkSession, store_dir: str
) -> dict[str, DataFrame] | None:
    """The latest COMMITTED ANN snapshot as {artifact: DataFrame}, or
    None before the first commit. Vectors are read with their WRITTEN
    schema (inference): the embedding element type follows the corpus
    (float32 normally, float64 for a regenerated corpus — the
    schema-drift contract), and pinning float here made a drifted
    snapshot unreadable. The explicit ARTIFACTS schema remains the
    fallback for a zero-row batch's empty directory, where inference
    over no part files raises (the serving_stream lesson)."""
    dirs = eo.committed_batch_dirs(store_dir)
    if not dirs:
        return None
    latest = max(dirs, key=lambda d: int(d.rsplit("=", 1)[1]))
    out = {}
    from pyspark.errors import AnalysisException

    for a, schema in ARTIFACTS.items():
        path = os.path.join(latest, a)
        try:
            out[a] = spark.read.parquet(path)
        except AnalysisException:
            # only the inference failure over a zero-row batch's empty
            # directory falls back to the pinned schema; a genuinely
            # corrupt or partial snapshot must surface, not be re-read
            # under a possibly wrong element type
            out[a] = spark.read.schema(schema).parquet(path)
    return out


def _version_centroids(prev: dict[str, DataFrame]) -> list[list[float]]:
    return [
        [float(x) for x in r["centroid"]]
        for r in prev["centroids"].orderBy("list_id").collect()
    ]


def start_incremental_ann(
    emb_stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    n_list: int = 16,
    n_iters: int = 2,
):
    """Maintain the ANN layout over an embeddings stream; returns the
    StreamingQuery (callers await it)."""
    from ..operators.similarity import ivf_assign, ivf_fit

    def process_batch(batch_emb: DataFrame, batch_id: int) -> None:
        if eo.is_committed(store_dir, batch_id):
            return  # replay of a committed batch: drop it
        spark = batch_emb.sparkSession
        batch = batch_emb.localCheckpoint()
        prev = read_ann_version(spark, store_dir)
        centroids = _version_centroids(prev) if prev is not None else []
        if not centroids and batch.count() > 0:
            # first non-empty batch seeds the fixed quantizer
            centroids = ivf_fit(batch, n_list=n_list, n_iters=n_iters)
        if centroids:
            assigned = ivf_assign(batch, centroids)
            vectors = (
                prev["vectors"].unionByName(assigned)
                if prev is not None
                else assigned
            )
        else:
            # empty stream prefix: publish an empty (but readable)
            # snapshot so commit ordering stays dense
            vectors = spark.createDataFrame([], ARTIFACTS["vectors"])
        out = eo.batch_dir(store_dir, batch_id)
        vectors.write.mode("overwrite").partitionBy("list_id").parquet(
            os.path.join(out, "vectors")
        )
        rows = [(j, list(c)) for j, c in enumerate(centroids)]
        spark.createDataFrame(rows, ARTIFACTS["centroids"]).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "centroids"))
        eo.commit(store_dir, batch_id)

    return (
        emb_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ann_search_version(
    spark: SparkSession,
    store_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    decimal_scores: bool = False,
) -> DataFrame:
    """IVF cosine top-k served from the latest committed streamed
    snapshot — the same frame-parameterized body as the stored-table
    path (serving.ann_from_frames). ``decimal_scores`` scores with the
    exact decimal dot so at nprobe == n_list the ranks are provably the
    brute-force ranks (the registry anchor's contract)."""
    from ..operators.serving import ann_from_frames

    v = read_ann_version(spark, store_dir)
    if v is None:
        raise FileNotFoundError(f"no committed ANN version in {store_dir}")
    return ann_from_frames(
        v["vectors"],
        _version_centroids(v),
        queries,
        k=k,
        nprobe=nprobe,
        decimal_scores=decimal_scores,
    )
