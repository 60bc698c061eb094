#!/usr/bin/env python
"""Event-log job profiler for the optimization rounds (guide §1/§7).

Runs one query with the Spark event log enabled and prints a per-job
timeline: job duration, inter-job driver gap, and the job's first stage
name — the breakdown that separates "Spark is computing" from "the
driver is between jobs" on a job-count-dominated query.

Usage: python tools/evprofile.py [--sf DIR] query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--timeline", action="store_true",
                    help="print every job chronologically with its gap-before")
    args = ap.parse_args()

    from mammoth_spark.protobuf_shim import ensure_protobuf

    ensure_protobuf()
    evdir = tempfile.mkdtemp(prefix="evlog_")
    from mammoth_spark.plans.session import tuned_builder

    spark = (
        tuned_builder("evprofile")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from mammoth_spark.queries import QUERIES

    # warmup
    QUERIES["cdc_last_per_key"](spark, args.sf).write.format("noop").mode("overwrite").save()

    for name in args.queries:
        sc = spark.sparkContext
        sc.setJobDescription(f"evprofile:{name}")
        t0_ms = int(time.time() * 1000)
        t0 = time.perf_counter()
        QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        t1_ms = int(time.time() * 1000)
        sc.setJobDescription(None)
        spark.catalog.clearCache()

        # flush and parse the event log
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        logs = []
        for root, _dirs, files in os.walk(evdir):
            for f in files:
                if "inprogress" in f or f.startswith("local-") or f.startswith("events_"):
                    logs.append(os.path.join(root, f))
        logs.sort(key=os.path.getmtime)
        jobs = {}
        stages = {}
        with open(logs[-1]) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"],
                        "desc": props.get("spark.job.description", ""),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:80],
                        "tasks": si["Number of Tasks"],
                    }
        # attribute by TIME WINDOW, not description: streaming-thread
        # jobs (micro-batch work) don't inherit the main thread's
        # description, and they are usually the point
        mine = sorted(
            (
                j
                for j in jobs.items()
                if "end" in j[1] and t0_ms <= j[1]["start"] <= t1_ms
            ),
            key=lambda kv: kv[1]["start"],
        )
        if not mine:
            print(f"{name}: no jobs captured (wall {wall:.2f}s)")
            continue
        total_dur = sum(j["end"] - j["start"] for _, j in mine) / 1000
        gaps = []
        for (ia, a), (ib, bj) in zip(mine, mine[1:]):
            gaps.append((bj["start"] - a["end"]) / 1000)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(mine)} jobs, "
              f"job-dur sum {total_dur:.2f}s, gap sum {sum(gaps):.2f}s ===")
        ranked = sorted(mine, key=lambda kv: kv[1]["end"] - kv[1]["start"], reverse=True)
        for jid, j in ranked[: args.top]:
            d = (j["end"] - j["start"]) / 1000
            sid = max(j["stages"]) if j["stages"] else None
            sname = stages.get(sid, {}).get("name", "?") if sid is not None else "?"
            ntasks = sum(stages.get(s, {}).get("tasks", 0) for s in j["stages"] if s in stages)
            print(f"  job {jid}: {d:6.2f}s  tasks={ntasks:<4d} {sname}")
        big_gaps = sorted(enumerate(gaps), key=lambda x: -x[1])[:5]
        print("  biggest gaps:", ", ".join(f"after#{i}:{g:.2f}s" for i, g in big_gaps))
        if args.timeline:
            print("  -- timeline (gap-before | dur | tasks | stage) --")
            prev_end = None
            for jid, j in mine:
                d = (j["end"] - j["start"]) / 1000
                gap = (j["start"] - prev_end) / 1000 if prev_end is not None else 0.0
                prev_end = j["end"]
                sid = max(j["stages"]) if j["stages"] else None
                sname = stages.get(sid, {}).get("name", "?") if sid is not None else "?"
                ntasks = sum(stages.get(s, {}).get("tasks", 0) for s in j["stages"] if s in stages)
                print(f"  j{jid:<4d} gap={gap:5.2f} dur={d:5.2f} tasks={ntasks:<4d} {sname}")


if __name__ == "__main__":
    main()
