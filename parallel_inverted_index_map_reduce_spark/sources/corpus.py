"""Manifest + text-file corpus sources (reference O1-O3).

The reference reads a manifest whose first token is a file count followed
by one relative path per line (/root/reference/src/main.cpp:49-83), then
assigns each file a deterministic 0-based id in manifest order via a
FIFO queue + guarded counter (/root/reference/src/main.cpp:96-105) and
prints ids 1-based (/root/reference/src/main.cpp:312).

Spark re-expression: ids derive from the manifest itself (driver-side
enumerate → small DataFrame), NOT ``monotonically_increasing_id()`` —
that function is not stable across partitionings, which is exactly the
trap SURVEY.md §7 calls out. The manifest is tiny metadata (one row per
file); at 100 TB the file *contents* are the big side and are read by
executors via ``spark.read.text``, while the manifest stays a broadcast
dimension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

MANIFEST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),  # 1-based, manifest order
        StructField("path", StringType(), False),
    ]
)


def read_manifest(spark: SparkSession, manifest_path: str, base_dir: str | None = None) -> DataFrame:
    """Parse the reference manifest format: ``<count>\n<path>\n...``.

    Returns (doc_id, path) with doc_id 1-based in manifest order — the
    id the reference prints (main.cpp:312 does ``file_id + 1``).
    Paths resolve relative to ``base_dir`` (defaults to the manifest's
    directory, mirroring the reference's ``../checker/`` convention
    without hardcoding it).
    """
    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(manifest_path))
    with open(manifest_path, encoding="utf-8", errors="replace") as fh:
        tokens = fh.read().split()
    count = int(tokens[0])
    paths = tokens[1 : 1 + count]
    rows = [(i + 1, os.path.join(base_dir, p)) for i, p in enumerate(paths)]
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


def read_manifest_corpus(
    spark: SparkSession, manifest_path: str, base_dir: str | None = None
) -> DataFrame:
    """Load a manifest's files as a ``(doc_id, text)`` documents DataFrame.

    Executors read the text files in parallel (``spark.read.text`` with
    the full path list); the doc_id comes from joining ``input_file_name``
    back to the tiny manifest dimension, which Spark auto-broadcasts.
    One row per line is fine — tokenization explodes on whitespace anyway,
    and keeping lines (not whole files) as rows bounds row size at scale.
    """
    manifest = read_manifest(spark, manifest_path, base_dir)
    lines = spark.read.text(_paths(manifest)).select(
        F.input_file_name().alias("file_uri"), F.col("value").alias("text")
    )
    return _join_manifest(lines, manifest).select("doc_id", "text")


def _paths(manifest: DataFrame) -> list[str]:
    return [r.path for r in manifest.collect()]  # tiny: one entry per file


def _join_manifest(files: DataFrame, manifest: DataFrame) -> DataFrame:
    """Attach manifest doc_ids to rows carrying a ``file_uri`` column.

    ``input_file_name()`` returns a percent-encoded ``file:`` URI; a
    path with a space (or any non-URI byte) would never string-match the
    manifest's raw path and the row would silently drop out of the inner
    join. Decode before stripping the scheme — ``url_decode`` after
    escaping literal ``+`` (URLDecoder treats bare ``+`` as space, which
    file URIs never use for encoding)."""
    decoded = F.expr("url_decode(replace(file_uri, '+', '%2B'))")
    norm = files.withColumn(
        "norm_path", F.regexp_replace(decoded, "^file:(//)?", "")
    )
    manifest_n = manifest.withColumn("norm_path", F.col("path"))
    return norm.join(F.broadcast(manifest_n), "norm_path", "inner")


def manifest_documents(spark: SparkSession, manifest_path: str, base_dir: str | None = None) -> DataFrame:
    """Whole-file variant: one row per document ``(doc_id, text)``.

    Reads each file as ONE row (``wholetext``) instead of re-assembling
    lines with ``collect_list`` after a shuffle: collect_list carries no
    line-order key, so multi-line files would concatenate in
    partition-arrival order — nondeterministic input for every
    order-sensitive consumer (shingles, fingerprints, simhash). The
    wholetext scan preserves byte order by construction and removes the
    groupBy shuffle entirely; newlines normalize to single spaces so the
    result matches the line-join form on single-line corpora.
    """
    manifest = read_manifest(spark, manifest_path, base_dir)
    files = spark.read.text(_paths(manifest), wholetext=True).select(
        F.input_file_name().alias("file_uri"), F.col("value").alias("raw")
    )
    return _join_manifest(files, manifest).select(
        "doc_id",
        F.trim(F.regexp_replace("raw", r"(\r?\n)+", " ")).alias("text"),
    )
