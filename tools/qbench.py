#!/usr/bin/env python
"""Focused per-query profiler for the optimization rounds (guide §1).

Times individual queries with the noop sink (same methodology as
bench.py), optionally repeating, optionally dumping the formatted plan
to plans/r14/<query>_<tag>.txt, and optionally counting the Spark jobs
a query launches (statusTracker job-id delta — the per-epoch fixed-cost
signal for the streaming/catalog queries).

Usage (from the repo root):
    python tools/qbench.py q1 q2 ...            # time each once
    python tools/qbench.py -n 3 q1              # 3 repeats (min/median)
    python tools/qbench.py --plan before q1     # dump plans/r14/q1_before.txt
    python tools/qbench.py --sf /root/testdata/sf0.01 q1
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=1, help="repeats per query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan", default=None, metavar="TAG",
                    help="dump plans/r14/<query>_<TAG>.txt (formatted explain)")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from mammoth_spark.protobuf_shim import ensure_protobuf

    ensure_protobuf()
    from mammoth_spark.plans import get_spark
    from mammoth_spark.queries import QUERIES

    spark = get_spark("qbench")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if not args.no_warmup:
        QUERIES["cdc_last_per_key"](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    # host constants, same probes as bench.py
    t0 = time.perf_counter()
    spark.range(1).count()
    trivial = time.perf_counter() - t0
    t0 = time.perf_counter()
    (spark.range(1_000_000).repartition(32).selectExpr("id % 97 AS k")
     .groupBy("k").count().write.format("noop").mode("overwrite").save())
    shuffle = time.perf_counter() - t0
    print(f"host: trivial={trivial:.3f}s shuffle={shuffle:.3f}s", flush=True)

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    results = {}
    for name in args.queries:
        if name not in QUERIES:
            print(f"!! unknown query {name}", flush=True)
            continue
        fn = QUERIES[name]
        times = []
        jobs_delta = None

        def _next_job_id():
            try:
                # py4j converts the AtomicInteger to int (non-mutating read)
                return int(sc._jsc.sc().dagScheduler().nextJobId())
            except Exception:
                return None

        for i in range(args.n):
            sc.setJobDescription(f"qbench:{name}#{i}")
            j0 = _next_job_id()
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            j1 = _next_job_id()
            jobs_delta = (j1 - j0) if j0 is not None and j1 is not None else None
            if i == 0 and args.plan:
                os.makedirs(plan_dir, exist_ok=True)
                with open(os.path.join(plan_dir, f"{name}_{args.plan}.txt"), "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            sc.setJobDescription(None)
            spark.catalog.clearCache()
            gc.collect()
        results[name] = {
            "min": round(min(times), 3),
            "med": round(statistics.median(times), 3),
            "all": [round(t, 3) for t in times],
            "jobs": jobs_delta,
        }
        print(f"{name}: min={results[name]['min']}s med={results[name]['med']}s "
              f"jobs={jobs_delta} all={results[name]['all']}", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
