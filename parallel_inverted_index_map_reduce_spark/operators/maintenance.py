"""Dataset maintenance: small-file compaction.

Long-running ingestion (streaming sinks, frequent small batch landings)
accretes many small files per partition; at 100 TB that turns every scan
into a metadata storm (one task per tiny file, listing dominates I/O).
Compaction rewrites a partitioned dataset with a bounded file count —
the janitorial half of a lake the write path can't always guarantee.

Row-group-level stats (min/max pushdown) survive because the rewrite is
plain parquet-to-parquet; partition directories are preserved.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sinks.partitioned import read_partitioned, write_partitioned


def compact_partitioned(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
) -> None:
    """Rewrite ``src_path`` into ``dst_path`` with one writer task per
    partition key (file count = ceil(rows / max_records_per_file) per
    partition). Kept out-of-place: compaction must never destroy the
    only copy mid-rewrite; callers swap directories after validating.
    """
    df = read_partitioned(spark, src_path)
    write_partitioned(
        df,
        dst_path,
        partition_cols,
        max_records_per_file=max_records_per_file,
    )
