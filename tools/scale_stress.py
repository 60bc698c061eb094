#!/usr/bin/env python
"""Scale-stress the heavy tail: measure the 10 most expensive BATCH
queries at sf1 (10x the bench scale) and record per-query scaling ratios
vs sf0.1 in BENCH_SF1.json (VERDICT r03 next-round #4 — turn the
"100 TB shape" arguments into measured curves).

sf1 is synthesized from the driver-provided sf0.1 fixtures (never from
scratch): each fact table is 10 key-shifted replicas, so every join key
stays consistent within a replica and cardinalities grow 10x.
Deliberate skew choices:
  - events keep their user_ids (10x events PER USER — stresses per-key
    window/session state rather than just key count);
  - documents keep their texts (every doc gains 9 exact clones —
    stresses the dedup family's bounded-pair caps with real 10-member
    duplicate clusters);
  - nation/region stay as-is (fixed dimensions, as in TPC-H).

Streaming/TWS queries are excluded: their bench cost is documented
scale-independent fixed overhead (state-server + sentinel batches), so
a 10x-data ratio would measure trigger mechanics, not data work.

Usage: python tools/scale_stress.py [--top N] [--dest /tmp/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

# key columns shifted per replica; all other columns copy through
SHIFT_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id"],  # user_id kept: 10x events per user
    "documents": ["doc_id"],  # text kept: 10-member exact-dup clusters
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation"]

# columns sharing a key DOMAIN must shift by the SAME offset or joins
# desynchronize across replicas (e.g. max(c_custkey) and max(o_custkey)
# straddling a power of 10 would give customer and orders different
# offsets — every join would then match only replica 0 and the measured
# "scaling" would time dangling foreign keys). The offset per domain is
# the next power of 10 above the max over ALL columns in the domain.
KEY_DOMAINS = {
    "l_orderkey": "orderkey",
    "o_orderkey": "orderkey",
    "l_partkey": "partkey",
    "p_partkey": "partkey",
    "l_suppkey": "suppkey",
    "s_suppkey": "suppkey",
    "o_custkey": "custkey",
    "c_custkey": "custkey",
}


def compute_offsets(spark, src: str = SRC) -> dict[str, int]:
    """Per-COLUMN replica offsets, equal within each key domain."""
    from pyspark.sql import functions as F

    domain_max: dict[str, int] = {}
    col_domain: dict[str, str] = {}
    for t, keys in SHIFT_KEYS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        maxima = df.agg(*[F.max(k).alias(k) for k in keys]).first()
        for k in keys:
            dom = KEY_DOMAINS.get(k, k)
            col_domain[k] = dom
            domain_max[dom] = max(domain_max.get(dom, 0), int(maxima[k]))
    offsets = {}
    for k, dom in col_domain.items():
        off = 1
        while off <= domain_max[dom]:
            off *= 10
        offsets[k] = off
    return offsets


def build_sf1(spark, dest: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dest, exist_ok=True)
    for t in COPY_TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dest}/{t}.parquet"
        )
    offsets = compute_offsets(spark)
    for t, keys in SHIFT_KEYS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(REPLICAS):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, (F.col(k) + i * offsets[k]).cast(df.schema[k].dataType))
            parts.append(rep)
        out = parts[0]
        for rep in parts[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
        print(f"  {t}: x{REPLICAS} (offsets {({k: offsets[k] for k in keys})})", flush=True)


def pick_heavy_batch_queries(n: int) -> list[str]:
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
        timings = json.load(fh)["queries"]
    # exclude the streaming family: trigger/state-server overhead is
    # documented scale-independent, and file-stream staging reads the
    # single-file testdata layout (stream_stream_attribution's
    # pathGlobFilter matches "events.parquet" the FILE — against the
    # synthesized sf1 directory layout it matches nothing, so its first
    # measurement was a no-data artifact, not a scaling number)
    batch = {
        k: v
        for k, v in timings.items()
        if not k.startswith("streaming_")
        and "_tws_" not in k
        and k != "stream_stream_attribution"
    }
    return [k for k, _ in sorted(batch.items(), key=lambda kv: -kv[1])[:n]]


def time_query(spark, fn, sf_dir: str) -> float:
    import gc

    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    gc.collect()
    return round(dt, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--dest", default="/tmp/sf1")
    args = ap.parse_args()

    from mammoth_spark.plans import get_spark
    from mammoth_spark.queries import QUERIES

    spark = get_spark("mammoth_spark_scale_stress")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{args.dest}/lineitem.parquet"):
        print("building sf1 ...", flush=True)
        build_sf1(spark, args.dest)

    names = pick_heavy_batch_queries(args.top)
    print("stressing:", names, flush=True)

    # warmup (JVM + codegen) outside any timed region
    QUERIES["cdc_last_per_key"](spark, SRC).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        fn = QUERIES[name]
        t01 = time_query(spark, fn, SRC)
        t1 = time_query(spark, fn, args.dest)
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        # 10x rows with fixed per-query overhead should land well under
        # 10x wall; flag anything beyond 13x as super-linear
        results[name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": ratio,
            "superlinear": bool(ratio and ratio > 13),
        }
        print(f"  {name}: {t01}s -> {t1}s (x{ratio})", flush=True)

    out = {
        "metric": "sf1_scale_stress",
        "replicas": REPLICAS,
        "unit": "sec",
        "queries": results,
        "n_superlinear": sum(1 for r in results.values() if r["superlinear"]),
    }
    path = os.path.join(REPO, "BENCH_SF1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
