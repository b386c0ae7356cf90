"""Scale-growth evidence for the INCREMENTAL prep pipeline
(streaming/pipeline.py): land the sf0.1 corpus as N sequential
micro-batches and measure, per batch, the wall time, the landed-doc
and signature-store row counts it ran against, and the batch's own
kept/suppressed split.

What to look for (the subsystem's scale shape): per-batch wall should
grow only with the SIGNATURE-STORE probe (a banded equi-join against
16-long rows per landed doc — slow growth), never with re-reading
landed TEXT; kept counts should track the batch's own size; and
cross-batch suppression should keep firing as the store accumulates.

Usage: python scripts/bench_prep_stream.py [n_batches]  (default 6)
Prints one JSON line per batch and a closing summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_inverted_index_map_reduce_spark.session import get_spark  # noqa: E402
from parallel_inverted_index_map_reduce_spark.streaming import (  # noqa: E402
    pipeline as spipe,
    sinks as eo,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="bench_prep_stream", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()

    tmp = tempfile.mkdtemp(prefix="sparkgraft_prepbench_")
    src = os.path.join(tmp, "src")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    rows = []
    try:
        for b in range(n_batches):
            sl = docs.where(F.col("doc_id") % n_batches == b)
            n_in = sl.count()
            landed_before = len(eo.committed_batch_dirs(out))
            sig_rows = 0
            sig_dir = out.rstrip("/") + "_sigs"
            if os.path.isdir(sig_dir):
                import glob as g

                files = [
                    f
                    for d in eo.committed_batch_dirs(out)
                    for f in g.glob(
                        os.path.join(sig_dir, os.path.basename(d), "*.parquet")
                    )
                ]
                if files:
                    sig_rows = spark.read.parquet(*files).count()
            sl.coalesce(1).write.mode("append").parquet(src)
            stream = spark.readStream.schema(docs.schema).parquet(src)
            t0 = time.monotonic()
            q = spipe.start_incremental_prep(
                stream,
                out,
                ckpt,
                cross_batch_threshold=0.8,
                min_quality=0.3,
                languages=(),
                dedup_threshold=0.8,
                chunk_tokens=32,
                overlap=8,
                budget=256,
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError(f"batch {b} did not finish in 600s")
            wall = time.monotonic() - t0
            kept = (
                spipe.read_prepared(spark, out)
                .where(F.col("batch_id") == b)
                .select("doc_id")
                .distinct()
                .count()
            )
            rec = {
                "batch": b,
                "n_in": n_in,
                "store_docs_before": sig_rows,
                "committed_before": landed_before,
                "kept_docs": kept,
                "wall_sec": round(wall, 2),
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)
        total_landed = spipe.read_prepared(spark, out).select("doc_id").distinct().count()
        print(
            json.dumps(
                {
                    "summary": rows,
                    "n_docs": n_docs,
                    "total_landed_docs": total_landed,
                    "suppressed_or_filtered": n_docs - total_landed,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
