"""ANN ingest-path scale-growth evidence run (round 5): extend_ann_index
cost vs BATCH size and vs STORE size.

The claim under test (operators/serving.py extend_ann_index docstring):
the append is assignment of the NEW batch against the fixed stored
quantizer (one codegen pass over the batch) plus a pure
partition-directory append — so extend time should grow ~linearly with
the batch at fixed store size and be ~flat in the store size at fixed
batch (no store-proportional term exists anywhere in the path: unlike
the text extend there is not even a chunks-rewrite residual; the only
store-side reads are the n_list centroids and the overlap semi-join's
vec_id column).

Design mirrors scripts/bench_ingest.py: stores built at 1x and 10x of
the sf0.1 embeddings (replicated with offset vec_ids), then
  - extend(10x store, {1x, 3x, 10x} batch)  -> batch-growth curve
  - extend(1x store, 1x batch)              -> store-growth pair with
    the 10x-store/1x-batch point
Batches are localCheckpointed before the clock.

Usage: python scripts/bench_ann_ingest.py
Prints one JSON line per measurement and a closing summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .appName("bench_ann_ingest")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from parallel_inverted_index_map_reduce_spark.operators import serving as srv  # noqa: E402

BASE_EMB = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
    "vec_id", "embedding"
)
N_BASE = BASE_EMB.count()

results = []
NEXT_ID = [0]


def fresh_batch(mult: int):
    """mult replicas with fresh vec_ids (append-only contract)."""
    reps = []
    for k in range(mult):
        reps.append(
            BASE_EMB.select(
                (F.col("vec_id") + NEXT_ID[0] + k * N_BASE).alias("vec_id"),
                "embedding",
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    NEXT_ID[0] += mult * N_BASE + 1000
    return out.localCheckpoint()


def build_store(name: str, mult: int):
    emb = fresh_batch(mult)
    t0 = time.perf_counter()
    srv.store_ann_index(emb, name, n_list=16, n_iters=2)
    dt = round(time.perf_counter() - t0, 3)
    row = {"measure": "build", "store": name, "store_vecs": emb.count(), "sec": dt}
    results.append(row)
    print(json.dumps(row), flush=True)


def measure(label: str, base: str, batch):
    n = batch.count()  # materialize before the clock
    t0 = time.perf_counter()
    srv.extend_ann_index(spark, base, batch)
    dt = round(time.perf_counter() - t0, 3)
    row = {"measure": label, "store": base, "batch_vecs": n, "sec": dt}
    results.append(row)
    print(json.dumps(row), flush=True)


build_store("anning1x", 1)
build_store("anning10x", 10)

# store-growth pair: the SAME batch size against 1x vs 10x stores
measure("extend_batch1x_into_store1x", "anning1x", fresh_batch(1))
measure("extend_batch1x_into_store10x", "anning10x", fresh_batch(1))
# batch-growth curve into the (growing) 10x store
measure("extend_batch3x_into_store10x", "anning10x", fresh_batch(3))
measure("extend_batch10x_into_store10x", "anning10x", fresh_batch(10))

print(json.dumps({"summary": results}))
spark.stop()
