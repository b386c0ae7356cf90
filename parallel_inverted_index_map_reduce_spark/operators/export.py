"""Deterministic global shuffle + sharded export for trainers.

A trainer wants the corpus (a) well-mixed — adjacent examples should
not share a source document, domain, or crawl batch — and (b)
REPRODUCIBLE: re-running the export must yield byte-identical shards,
or no training run can ever be replayed. Spark's own tools fail (b):

- ``df.repartition(n)`` round-robins rows by their *current* partition
  layout, so the shard a row lands in changes with the input file
  count;
- ``repartitionByRange`` samples range boundaries with an RDD-id-seeded
  RNG, so boundaries (and therefore shard membership) drift run to run;
- ``orderBy(rand(seed))`` is reproducible only per-partitioning.

This module instead derives BOTH the shard and the within-shard order
from a content hash (functions/hashing.py, the same md5 family the
samplers use): shard = hash(key) mod n_shards, order = (hash, key).
Every decision is a pure function of the data — stable across runs,
partitionings, engines, and cluster sizes — while the hash's uniformity
delivers the mixing (documents of one source scatter uniformly over
shards and positions). The tie-break on the key itself makes the order
total even under hash collisions, so determinism never rests on the
hash being collision-free.

Scale: one hash-partition shuffle (n_shards-way) + a within-partition
sort — exactly what a 100 TB export costs at minimum; no global sort,
no sampling pass, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32

SHARD_COL = "shard"
ORDER_COL = "_train_ord"


def training_order(
    df: DataFrame, key: str, n_shards: int, salt: str = "export"
) -> DataFrame:
    """Assign (shard, _train_ord) and sort each shard.

    ``key`` must be unique per row (a doc or chunk id); the salt picks
    an independent mixing for each export so two exports of the same
    corpus don't correlate.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = stable_hash32(F.concat_ws("\x1f", F.lit(salt), F.col(key).cast("string")))
    return (
        df.withColumn(SHARD_COL, F.pmod(h, F.lit(n_shards)).cast("int"))
        .withColumn(ORDER_COL, h)
        .repartition(n_shards, SHARD_COL)
        .sortWithinPartitions(SHARD_COL, ORDER_COL, key)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    salt: str = "export",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Land the shuffled corpus as ``path/shard=K/`` parquet, one writer
    task per shard (bounded file count), rows stored in training order.
    Parquet preserves within-file row order, so a reader consuming one
    shard's files in name order replays the exact export order."""
    (
        training_order(df, key, n_shards, salt)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(SHARD_COL)
        .parquet(path)
    )


def read_training_shard(
    spark: SparkSession, path: str, shard: int, key: str
) -> DataFrame:
    """One shard, in training order: partition pruning keeps the scan to
    that shard's directory, and an explicit sort on the stored
    ``_train_ord`` column (key tie-break, mirroring the writer) recovers
    the total order regardless of how the scan splits files into
    partitions (a within-partition sort would not). Sorting one shard is
    a shard-sized job, not a corpus-sized one — the trainer's per-worker
    cost."""
    return (
        spark.read.parquet(path)
        .where(F.col(SHARD_COL) == shard)
        .orderBy(ORDER_COL, key)
    )
