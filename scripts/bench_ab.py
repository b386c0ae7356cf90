#!/usr/bin/env python
"""Solo A/B adjudication of the round-2 bench regression.

Round 2 changed two session defaults (shuffle partitions 200->32,
openCostInBytes 4MB->256KB) and pricing_summary / inverted_index
regressed cross-round (+134% / +41%). This script runs the 2x2 config
matrix in ONE process, interleaved min-of-5, so co-tenant noise and
JVM warmup can't masquerade as a config effect. Both knobs are runtime
SQL confs, so flipping them per-rep re-plans the scan/shuffle without
a session restart.

Usage: python scripts/bench_ab.py [sf_dir]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_inverted_index_map_reduce_spark.plans.registry import all_specs
from parallel_inverted_index_map_reduce_spark.session import get_spark

QUERIES = ["pricing_summary", "inverted_index"]
CONFIGS = {
    "r2 (open=256K,sp=32)": ("262144", "32"),
    "open=4M,sp=32": ("4194304", "32"),
    "open=256K,sp=200": ("262144", "200"),
    "r1 (open=4M,sp=200)": ("4194304", "200"),
}
REPS = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    def run(qname: str) -> float:
        t0 = time.perf_counter()
        specs[qname].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warmup: JVM + codegen + scan caches, under every config once.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for open_cost, sp in CONFIGS.values():
        spark.conf.set("spark.sql.files.openCostInBytes", open_cost)
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        for q in QUERIES:
            run(q)

    best: dict[tuple[str, str], float] = {
        (c, q): float("inf") for c in CONFIGS for q in QUERIES
    }
    for _ in range(REPS):
        for cname, (open_cost, sp) in CONFIGS.items():
            spark.conf.set("spark.sql.files.openCostInBytes", open_cost)
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            for q in QUERIES:
                key = (cname, q)
                best[key] = min(best[key], run(q))

    out = {q: {c: round(best[(c, q)], 3) for c in CONFIGS} for q in QUERIES}
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
