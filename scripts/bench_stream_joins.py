#!/usr/bin/env python
"""Scale evidence for the stream-stream interval join (streaming/joins.py):
drive the view->purchase attribution stream over the events table staged
as K time-ordered micro-batches and print, per batch, the wall clock and
the join's STATE STORE size from Spark's own progress metrics.

The claim under test is the module docstring's 100 TB property: with
both sides watermarked and a two-sided time bound, state is O(events
per interval) — bounded by the watermark delay — NOT O(stream age). If
eviction were broken, numRowsTotal would grow with every batch and the
per-batch wall would trend up; healthy output is flat-ish state and
flat per-batch wall at any multiplier.

    python scripts/bench_stream_joins.py /root/testdata/sf0.1 5
    python scripts/bench_stream_joins.py /tmp/sf1 5   # 10x events

Prints one JSON line per batch and a closing summary.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from parallel_inverted_index_map_reduce_spark.sources.tables import load_table
from parallel_inverted_index_map_reduce_spark.streaming import joins as sj
from parallel_inverted_index_map_reduce_spark.streaming import sinks as eo


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.cpu_count() or 8
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .appName("bench-stream-joins")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = hi - lo

    tmp = tempfile.mkdtemp(prefix="bench_sjoin_")
    src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ckpt"))
    # K time-ordered slices (ascending event time, the production shape)
    for b in range(n_batches):
        cut_lo = lo + b * span / n_batches
        cut_hi = lo + (b + 1) * span / n_batches
        pred = (F.col("ts") >= F.lit(cut_lo)) & (
            F.col("ts") < F.lit(cut_hi) if b < n_batches - 1 else F.lit(True)
        )
        events.where(pred).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    t0 = time.time()
    q = eo.start_exactly_once_parquet(sj.attribution_stream(stream), out, ckpt)
    assert q.awaitTermination(600), "stream stalled"
    wall = time.time() - t0

    per_batch = []
    for p in q.recentProgress:
        if not p["stateOperators"]:
            continue
        so = p["stateOperators"][0]
        rec = {
            "batch": p["batchId"],
            "input_rows": p["numInputRows"],
            "batch_ms": p["batchDuration"],
            "state_rows_total": so["numRowsTotal"],
            "state_rows_removed": so["numRowsRemoved"],
            "late_rows_dropped": so.get("numRowsDroppedByWatermark", 0),
        }
        per_batch.append(rec)
        print(json.dumps(rec), flush=True)

    n_pairs = eo.read_exactly_once_parquet(spark, out).count()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_events": n_events,
                "n_batches": n_batches,
                "pairs": n_pairs,
                "total_wall_s": round(wall, 1),
                "max_state_rows": max(r["state_rows_total"] for r in per_batch),
                "load_avg": os.getloadavg(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
