"""SparkSession construction with scale-oriented defaults.

Local testing runs on ``local[N]`` but every setting is chosen to also
make sense on a 1000-executor cluster: AQE on (runtime skew/coalesce),
Arrow on (Pandas-UDF fast path), UTC session timezone (deterministic
timestamp semantics vs the DuckDB oracle), broadcast threshold left at
default so small dims broadcast automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "parallel_inverted_index_map_reduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes no master and spark-submit supplies it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Split-size formula: maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/minPartitionNum)). The 4 MB
        # default openCost caps small-table scans at totalBytes/4MB splits
        # (a 10 MB file -> 3 tasks on a 32-core box). Parquet open cost on
        # modern storage is far below 4 MB; 256 KB keeps many-small-file
        # packing sane at 100 TB while letting modest scans fan out to
        # full parallelism. Measured: lineitem sf0.1 scan 3 -> 32 tasks.
        .config("spark.sql.files.openCostInBytes", "262144")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    return builder.getOrCreate()
