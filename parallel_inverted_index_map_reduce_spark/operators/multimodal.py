"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas functions (``mapInPandas``).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises NotImplementedError unless
given the deterministic fake codec) — but everything Spark-side is
real: binary column schema, Arrow batch transfer, per-batch vectorized
feature extraction, and the partitioning story (binary payloads stay
with their row; feature extraction is a narrow map, no shuffle).

At 100 TB: payloads live in parquet binary columns (or references into
object storage); ``mapInPandas`` keeps the Python cost to one
Arrow-serialized pass per batch with zero per-row overhead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte long, last_byte long, byte_sum long"
)


def decode_image(payload: bytes, codec: str = "real"):
    """Stub decode step — real codecs are not available in this
    environment. ``codec='fake'`` returns a deterministic stand-in so
    the downstream plumbing is testable."""
    if codec == "fake":
        return {"width": len(payload) % 640, "height": len(payload) % 480}
    raise NotImplementedError(
        "image/audio codecs are not installed; use codec='fake' for tests"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of the text — the
    deterministic stand-in for an image/audio payload) plus metadata.
    Input spread to cluster parallelism so the Arrow-batched Python
    stage downstream gets one worker per core, not one total."""
    from ..sources.tables import spread

    docs = spread(docs)
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/bytes").alias("mime"),
            F.length("text").cast("long").alias("n_chars"),
        ).alias("meta"),
    )


def binary_features(docs: DataFrame) -> DataFrame:
    """Arrow-batched byte-level features over the binary payload column.

    This is the real multimodal execution path (schema, batching, UDF
    signature); swap the batch function's internals for an image decode
    + embed once codecs exist.

    The batch function is a *closure* on purpose: cloudpickle then
    serializes it by value, so executor Python workers never need this
    package importable on their own sys.path (a module-level function
    would be pickled by reference and break when the driver runs from
    outside the repo).
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.str.len().astype("int64")
            firsts = payloads.map(lambda b: b[0] if len(b) else -1).astype("int64")
            lasts = payloads.map(lambda b: b[-1] if len(b) else -1).astype("int64")
            sums = payloads.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
            ).astype("int64")
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "first_byte": firsts,
                    "last_byte": lasts,
                    "byte_sum": sums,
                }
            )

    payloads = with_binary_payload(docs)
    return payloads.select("doc_id", "payload").mapInPandas(
        feature_batches, schema=FEATURE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx long, frame binary, n_frame_bytes long"


def frame_samples(
    docs: DataFrame, frame_bytes: int = 16, stride: int = 4, max_frames: int = 8
) -> DataFrame:
    """Video-style frame sampling over binary payloads: each payload
    yields every ``stride``-th ``frame_bytes`` chunk, up to
    ``max_frames`` — the 1:N row-expanding ``mapInPandas`` shape a real
    decoder (ffmpeg frame extraction, audio windowing) would use. The
    chunking stands in for frame decode (no codecs in this
    environment); the Spark plumbing — binary in, multiple typed rows
    out, narrow map with no shuffle, output bounded by
    max_frames per row — is the real thing.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k in range(max_frames):
                    off = k * stride * frame_bytes
                    chunk = payload[off : off + frame_bytes]
                    if not chunk:
                        break
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(bytes(chunk))
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "frame_idx": _pd.Series(idxs, dtype="int64"),
                    "frame": _pd.Series(frames, dtype="object"),
                    "n_frame_bytes": _pd.Series(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    payloads = with_binary_payload(docs)
    return payloads.select("doc_id", "payload").mapInPandas(
        frame_batches, schema=FRAME_SCHEMA
    )
