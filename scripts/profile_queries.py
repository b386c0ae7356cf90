#!/usr/bin/env python
"""Per-query stage-level profile: run registry queries through the noop
sink with the Spark event log on, then aggregate per-query stage wall,
task time, shuffle bytes and task counts from the log.

Usage: python scripts/profile_queries.py [query ...] [--all] [--reps N]
Prints one table row per query: noop wall (min of reps), number of
jobs/stages/tasks, summed task time, shuffle read/write bytes — the
§1 "measure first" evidence for OPTIMIZATION_r*.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_inverted_index_map_reduce_spark.plans.registry import all_specs
from parallel_inverted_index_map_reduce_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--log-dir", default="/tmp/spark-events")
    args = ap.parse_args()

    os.makedirs(args.log_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # session.get_spark has no extra-conf hook; replicate its defaults
    # plus the two event-log keys through the builder chain.
    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", args.log_dir)
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    specs = all_specs()
    if args.all:
        names = list(specs)
    elif args.names:
        names = args.names
    else:
        names = [n for n, s in specs.items() if s.bench]

    def run(name: str) -> None:
        specs[name].fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    # warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        run(name)

    walls: dict[str, float] = {n: float("inf") for n in names}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"q:{name}:rep{rep}")
            t0 = time.perf_counter()
            run(name)
            walls[name] = min(walls[name], time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # --- parse the event log -------------------------------------------------
    log_path = os.path.join(args.log_dir, app_id)
    if os.path.exists(log_path):
        log_files = [log_path]
    else:
        # Spark 4 rolling layout: eventlog_v2_<appId>/events_1_<appId>...
        d = os.path.join(args.log_dir, f"eventlog_v2_{app_id}")
        log_files = sorted(
            os.path.join(d, p) for p in os.listdir(d) if p.startswith("events_")
        )
    jobs: dict[int, str] = {}          # job id -> query name
    job_stages: dict[int, list[int]] = {}
    stage_info: dict[int, dict] = {}   # stage id -> metrics
    import itertools

    _EMPTY = {"wall_ms": 0, "n_tasks": 0, "task_ms": 0, "sh_read": 0, "sh_write": 0, "input": 0}
    for line in itertools.chain.from_iterable(open(p) for p in log_files):
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get("spark.job.description", "")
            if desc.startswith("q:"):
                name = desc.split(":")[1]
                jid = ev["Job ID"]
                jobs[jid] = name
                job_stages[jid] = [s["Stage ID"] for s in ev["Stage Infos"]]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            # TaskEnd events precede StageCompleted: merge, don't replace
            st = stage_info.setdefault(sid, dict(_EMPTY))
            st["wall_ms"] = (comp - sub) if sub and comp else 0
            st["n_tasks"] = si.get("Number of Tasks", 0)
        elif e == "SparkListenerTaskEnd":
            # task end can precede stage completed; buffer lazily
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            if tm:
                st = stage_info.setdefault(sid, dict(_EMPTY))
                st["task_ms"] += tm.get("Executor Run Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                st["sh_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                st["sh_write"] += (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                st["input"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)

    agg: dict[str, dict] = {}
    for jid, name in jobs.items():
        a = agg.setdefault(
            name, {"jobs": 0, "stages": 0, "tasks": 0, "task_ms": 0, "sh_read": 0, "sh_write": 0, "input": 0}
        )
        a["jobs"] += 1
        for sid in job_stages[jid]:
            st = stage_info.get(sid)
            if not st or st.get("_seen"):
                continue
            st["_seen"] = True
            a["stages"] += 1
            a["tasks"] += st["n_tasks"]
            a["task_ms"] += st["task_ms"]
            a["sh_read"] += st["sh_read"]
            a["sh_write"] += st["sh_write"]
            a["input"] += st["input"]

    reps = args.reps
    print(f"\n{'query':28s} {'wall_min':>8s} {'jobs/rep':>8s} {'stages':>7s} {'tasks':>6s} {'task_s':>7s} {'shW_MB':>7s} {'shR_MB':>7s} {'in_MB':>6s}")
    for name in names:
        a = agg.get(name, {})
        print(
            f"{name:28s} {walls[name]:8.3f} {a.get('jobs', 0) / reps:8.1f} {a.get('stages', 0):7d} "
            f"{a.get('tasks', 0):6d} {a.get('task_ms', 0) / 1000:7.1f} "
            f"{a.get('sh_write', 0) / 1e6:7.1f} {a.get('sh_read', 0) / 1e6:7.1f} {a.get('input', 0) / 1e6:6.1f}"
        )
    print(
        f"\n(event log: {log_files}; stage metrics summed over {reps} timed "
        "reps; stages reused across queries via shuffle/exchange reuse are "
        "attributed wholly to the FIRST query whose job listed them)"
    )


if __name__ == "__main__":
    main()
