#!/usr/bin/env python
"""Headline benchmark: runs the bench-flagged registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <scale factor>}

Each query is forced end-to-end through the noop datasource sink
(``df.write.format("noop")``), which materializes EVERY output column
JVM-side — unlike ``count()``, which lets Catalyst prune the aggregate
expressions out of the child plan and under-measures. Each query is
timed five times and the minimum reported: the min is the achievable
steady-state latency, robust to transient co-tenant load on the box
(observed 2.5x swings between back-to-back single-pass runs).
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

    # Shuffle partitions sized to the executor-core count (1 task per
    # core): at this data scale 2x cores just doubles per-stage task
    # scheduling overhead (measured ~0.7s across the headline set, 64 vs
    # 32 on a 32-core box). On a real cluster the same rule scales with
    # total cores; AQE coalesces below it when partitions run small.
    default_parts = cpus if cpus.isdigit() else str(os.cpu_count() or 8)
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",  # non-numeric specs like '*' are valid here
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", default_parts)
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    specs = [s for s in all_specs().values() if s.bench]

    def run(spec) -> None:
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warmup: JVM/codegen/scan caches dominate the first execution
    # (measured 6.4s cold vs 0.8s steady for the same query); report
    # steady-state per-query time, which is what a resident cluster sees.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for spec in specs:
        run(spec)
    # Rounds are interleaved ACROSS queries (round-robin) rather than
    # five back-to-back reps per query: transient co-tenant load on the
    # box lasts minutes, so back-to-back reps let one spike poison every
    # rep of one query, while interleaving spreads each query's reps
    # over the whole bench window and the min recovers steady state.
    best: dict[str, float] = {s.name: float("inf") for s in specs}
    for _ in range(5):
        for spec in specs:
            t0 = time.perf_counter()
            run(spec)
            best[spec.name] = min(best[spec.name], time.perf_counter() - t0)
    timings = {name: round(v, 3) for name, v in best.items()}
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
