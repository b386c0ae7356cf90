"""ANN quality/latency at scale: recall@k vs nprobe for the IVF paths.

tests/test_similarity.py pins IVF recall at fixture scale; this
measures the claim that matters at 100 TB — how much recall each
probed fraction of the corpus buys, and what a probe costs — on a real
scale directory (sf10 = 2M vectors after the round-9 sign-mask fix
made scaled embeddings non-degenerate).

Ground truth per query = ivf_topk at nprobe == n_list, which
degenerates to exact brute force by construction (same rounding and
tie-break as every measured point, so boundary ties cannot read as
recall loss). Both the in-memory path (ivf_topk with pre-fit
centroids) and the persisted layout (ann_search_stored over the
list_id-partitioned store) are swept over the same nprobe ladder.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 python scripts/bench_ann_quality.py
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_LIST = int(os.environ.get("ANNQ_N_LIST", "64"))
N_QUERIES = int(os.environ.get("ANNQ_QUERIES", "64"))
K = int(os.environ.get("ANNQ_K", "10"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
NPROBES = [1, 2, 4, 8, 16, 32]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    .config("spark.ui.enabled", "false")
    .appName("bench_ann_quality")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from parallel_inverted_index_map_reduce_spark.operators import serving as srv  # noqa: E402
from parallel_inverted_index_map_reduce_spark.operators import similarity as sim  # noqa: E402
from parallel_inverted_index_map_reduce_spark.plans.stores import tuned_shuffle  # noqa: E402

emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
n_corpus = emb.count()
print(f"corpus: {n_corpus} vectors", flush=True)

t0 = time.time()
centroids = sim.ivf_fit(emb, n_list=N_LIST, n_iters=2)
t_fit = time.time() - t0
print(f"ivf_fit n_list={N_LIST} n_iters=2: {t_fit:.1f}s", flush=True)


def topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["vec_a"], set()).add(r["vec_b"])
    return out


def recall(got: dict, want: dict) -> float:
    hits = sum(len(got.get(q, set()) & wk) for q, wk in want.items())
    total = sum(len(wk) for wk in want.values())
    return hits / total if total else 1.0


gt = topk_sets(
    sim.ivf_topk(
        emb, k=K, n_queries=N_QUERIES, n_list=N_LIST, nprobe=N_LIST,
        centroids=centroids,
    )
)
print(f"ground truth: {len(gt)} queries x top-{K}", flush=True)

rows = []
for nprobe in NPROBES:
    best = float("inf")
    got = None
    for _ in range(N_RUNS):
        t0 = time.time()
        df = sim.ivf_topk(
            emb, k=K, n_queries=N_QUERIES, n_list=N_LIST, nprobe=nprobe,
            centroids=centroids,
        )
        got = topk_sets(df)
        best = min(best, time.time() - t0)
    rows.append(
        {"path": "ivf_topk", "nprobe": nprobe,
         "recall": round(recall(got, gt), 4), "min_sec": round(best, 3)}
    )
    print(json.dumps(rows[-1]), flush=True)

import hashlib  # noqa: E402

base = "annq_" + hashlib.md5(f"{SF_DIR}|{N_LIST}".encode()).hexdigest()[:8]
t0 = time.time()
with tuned_shuffle(spark):
    srv.ensure_ann_index(emb, base, n_list=N_LIST, n_iters=2)
t_store = time.time() - t0
print(f"stored layout build/attach: {t_store:.1f}s", flush=True)

queries = emb.where(F.col("vec_id") < N_QUERIES)
for nprobe in NPROBES:
    best = float("inf")
    got = None
    for _ in range(N_RUNS):
        t0 = time.time()
        df = srv.ann_search_stored(spark, base, queries, k=K, nprobe=nprobe)
        got = topk_sets(df)
        best = min(best, time.time() - t0)
    rows.append(
        {"path": "ann_search_stored", "nprobe": nprobe,
         "recall": round(recall(got, gt), 4), "min_sec": round(best, 3)}
    )
    print(json.dumps(rows[-1]), flush=True)

print(json.dumps({
    "sf_dir": SF_DIR, "corpus": n_corpus, "n_list": N_LIST, "k": K,
    "n_queries": N_QUERIES, "fit_sec": round(t_fit, 1),
    "store_sec": round(t_store, 1), "rows": rows,
}))
