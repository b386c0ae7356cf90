#!/usr/bin/env python
"""Headline benchmark: runs the bench-flagged registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <scale factor>}

Each query is forced end-to-end with a count() so timing covers scan ->
shuffle -> aggregate without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parallel_inverted_index_map_reduce_spark.plans.registry import all_specs
from parallel_inverted_index_map_reduce_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    specs = [s for s in all_specs().values() if s.bench]
    # Warmup: JVM/codegen/scan caches dominate the first execution
    # (measured 6.4s cold vs 0.8s steady for the same query); report
    # steady-state per-query time, which is what a resident cluster sees.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for spec in specs:
        spec.fn(spark, sf_dir).count()
    timings: dict[str, float] = {}
    for spec in specs:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        timings[spec.name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
