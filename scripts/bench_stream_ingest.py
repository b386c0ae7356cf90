#!/usr/bin/env python
"""Per-batch streamed-ingest wall as the store GROWS — the delta
protocol's acceptance evidence (round-10 verdict item 1).

The pre-round-11 streamed maintenance wrote a complete snapshot per
micro-batch, so per-batch wall grew with store size (O(store) per
increment — the streamed ANN build alone was 560 s of sf10 ann_topk);
the delta protocol (streaming/deltas.py) writes O(batch) appends. This
bench feeds a seed batch plus K fixed-size increment batches through
the real streaming entry points and reports the wall of EVERY batch,
measured from the commit markers' mtimes (each batch's marker is the
last thing it writes, so successive mtime deltas are per-batch walls
including all plan/IO cost). FLAT increments while the store grows is
the protocol working; a rising line is O(store) leaking back in.

    python scripts/bench_stream_ingest.py ann /tmp/sf10
    python scripts/bench_stream_ingest.py serving /tmp/sf1
    python scripts/bench_stream_ingest.py ann /tmp/sf10 \
        --package-root /tmp/old_worktree   # A/B the pre-delta protocol

Prints one JSON line: {"mode", "seed_rows", "inc_rows", "n_inc",
"batch_walls_s" (seed first), "total_s"}.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["ann", "serving"])
    ap.add_argument("sf_dir")
    ap.add_argument("--seed-rows", type=int, default=100_000)
    ap.add_argument("--inc-rows", type=int, default=10_000)
    ap.add_argument("--n-inc", type=int, default=8)
    ap.add_argument(
        "--package-root",
        default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        help="repo root whose package to drive (point at a worktree of "
        "an older commit for protocol A/Bs)",
    )
    ap.add_argument("--n-list", type=int, default=64)
    args = ap.parse_args()
    sys.path.insert(0, args.package_root)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .appName("bench-stream-ingest")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix=f"ingest_{args.mode}_")
    src = os.path.join(work, "in")
    store = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    if args.mode == "ann":
        table, key = "embeddings.parquet", "vec_id"
        base = spark.read.parquet(os.path.join(args.sf_dir, table)).select(
            "vec_id", "embedding"
        )
    else:
        table, key = "documents.parquet", "doc_id"
        base = spark.read.parquet(os.path.join(args.sf_dir, table))

    # seed file first (earlier mtime -> first micro-batch), then K
    # equal increments: deterministic contiguous id slices
    lo = 0
    slices = [args.seed_rows] + [args.inc_rows] * args.n_inc
    for i, n in enumerate(slices):
        batch = base.where(
            (F.col(key) >= lo) & (F.col(key) < lo + n)
        ).coalesce(4)
        batch.write.parquet(os.path.join(src, f"b{i:03d}"))
        # one FILE per batch: move parts up under distinct names
        parts = glob.glob(os.path.join(src, f"b{i:03d}", "*.parquet"))
        merged = os.path.join(work, f"m{i:03d}.parquet")
        spark.read.parquet(*parts).coalesce(1).write.parquet(merged)
        part = glob.glob(os.path.join(merged, "*.parquet"))[0]
        os.replace(part, os.path.join(src, f"file_{i:03d}.parquet"))
        shutil.rmtree(os.path.join(src, f"b{i:03d}"))
        shutil.rmtree(merged)
        lo += n
        time.sleep(0.05)  # distinct mtimes pin the batch order

    if args.mode == "ann":
        from parallel_inverted_index_map_reduce_spark.streaming import ann_stream as mod

        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        t0 = time.time()
        q = mod.start_incremental_ann(
            stream, store, ckpt, n_list=args.n_list, n_iters=1
        )
    else:
        from parallel_inverted_index_map_reduce_spark.streaming import (
            serving_stream as mod,
        )

        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        t0 = time.time()
        q = mod.start_incremental_serving(stream, store, ckpt)
    assert q.awaitTermination(7200), "stream did not finish"
    total = time.time() - t0

    markers = sorted(
        glob.glob(os.path.join(store, "_committed_*")),
        key=lambda p: int(p.rsplit("_", 1)[1]),
    )
    times = [os.path.getmtime(m) for m in markers]
    walls = [round(times[0] - t0, 2)] + [
        round(b - a, 2) for a, b in zip(times, times[1:])
    ]
    print(
        json.dumps(
            {
                "mode": args.mode,
                "package_root": args.package_root,
                "seed_rows": args.seed_rows,
                "inc_rows": args.inc_rows,
                "n_inc": args.n_inc,
                "batch_walls_s": walls,
                "total_s": round(total, 2),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
