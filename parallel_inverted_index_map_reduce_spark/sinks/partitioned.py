"""Hive-partitioned parquet sink — the lake layout the engine expects
at scale.

The reference's only sink is 26 per-letter text files
(/root/reference/src/main.cpp:298-320 — itself a partitioned sink, one
file per letter bucket). This is the general form: partition columns
become directory keys, so a reader's predicate on them prunes whole
directories before any file I/O ("partition pruning" — visible as
PartitionFilters in the scan node, verified in
tests/test_partitioned_sink.py).

Scale notes:
- Partition keys must be low-cardinality (a date, not a user id): each
  distinct value is a directory, and each task writing N live keys holds
  N open files — high-cardinality keys melt both the metastore listing
  and the writer's memory.
- ``maxRecordsPerFile`` bounds file size from above; pre-repartitioning
  by the partition columns bounds file COUNT from below (without it,
  every input task writes a file into every output partition:
  tasks x partitions small files at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    coalesce_per_partition: bool = True,
) -> None:
    """Write a partitioned parquet dataset.

    ``coalesce_per_partition`` routes each output partition's rows to
    one task first (a hash repartition on the keys), trading one shuffle
    for a bounded file count — the right default for periodic batch
    landing; turn it off for huge single partitions where parallel
    writers matter more than file count.
    """
    writer = df
    if coalesce_per_partition:
        writer = df.repartition(*partition_cols)
    (
        writer.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; partition columns come back as real
    columns and predicates on them prune directories at planning time."""
    return spark.read.parquet(path)
