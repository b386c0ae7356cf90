"""Bucketed-table helpers: the shuffle-elimination story at 100 TB.

A fact-fact join (orders-lineitem) shuffles both sides on the join key
every query. Writing both tables bucketed by that key co-locates rows
once at write time; subsequent joins read bucket-aligned scans with NO
exchange — the plan shows SortMergeJoin over two FileScans and zero
Exchange nodes (asserted in tests/test_bucketing.py).

At cluster scale the same calls target a metastore-backed table format;
bucket counts should be sized so bucket × file-size ≈ 128-256 MB.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """Persist a DataFrame as a bucketed (+optionally sorted) managed
    parquet table, replacing any previous version.

    ``partition_cols`` adds hive partitioning ABOVE the buckets: a
    filter on a partition column prunes whole directories
    (PartitionFilters) while an equality filter on the bucket column
    still prunes to one bucket file within each surviving directory —
    the two-level layout a serving-side index store wants.

    Tables are written EXTERNAL (explicit location under the warehouse
    dir): the in-memory catalog forgets metadata between sessions, but
    external files survive a DROP TABLE, so a later session can
    re-attach the same data with a CREATE TABLE ... LOCATION DDL (see
    operators/serving.py attach_search_index) — the local stand-in for
    a metastore-backed lake."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = table_location(spark, table)
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = df.write.format("parquet").mode("overwrite").option("path", loc)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer = writer.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def write_partitioned_table(
    df: DataFrame, table: str, partition_cols: tuple[str, ...]
) -> None:
    """Persist an external hive-partitioned (unbucketed) parquet table —
    directory-level pruning without a bucket spec, for layouts whose
    read pattern filters on the partition column only (e.g. IVF
    inverted lists probed by list_id). Same external/replacement
    hygiene as :func:`write_bucketed`."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = table_location(spark, table)
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", loc)
        .partitionBy(*partition_cols)
        .saveAsTable(table)
    )


def table_location(spark: SparkSession, table: str) -> str:
    """The on-disk directory backing ``table`` under the session's
    warehouse dir — one naming rule shared by writers and re-attachers.

    An EXISTING warehouse root is always used as-is — serving from a
    read-only store (build-once in an indexing job, read-many from
    less-privileged sessions) must keep working, and a write into a
    genuinely read-only root should fail loudly, not silently divert.
    Only a root that does not exist AND cannot be created (a driver
    session with the default RELATIVE ``spark-warehouse`` in a
    read-only cwd) falls back — to a tempdir path keyed on the
    intended root's absolute path, so writers and later re-attachers
    derive the SAME fallback deterministically while unrelated
    warehouse configs cannot collide on one shared directory."""
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    if not os.path.isdir(warehouse):
        try:
            os.makedirs(warehouse, exist_ok=True)
        except OSError:
            import hashlib
            import tempfile

            tag = hashlib.md5(
                os.path.abspath(warehouse).encode()
            ).hexdigest()[:8]
            warehouse = os.path.join(
                tempfile.gettempdir(), f"spark_graft_warehouse_{tag}"
            )
            os.makedirs(warehouse, exist_ok=True)
    return os.path.join(warehouse, table)


def write_table(df: DataFrame, table: str) -> None:
    """Persist a small unbucketed parquet table (stats rows, scalar
    companions), replacing any previous version — same external-table
    and replacement hygiene as :func:`write_bucketed`."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = table_location(spark, table)
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    df.write.format("parquet").mode("overwrite").option("path", loc).saveAsTable(
        table
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — Catalyst
    plans this without any Exchange when bucket specs line up."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
