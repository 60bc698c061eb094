"""SparkSession construction with scale-oriented defaults.

The reference engine is a single-process Go pipeline with hand-tuned
buffers (sync/stream/stream.go:255-319). On Spark the equivalents are
cluster-level knobs: AQE for runtime re-planning (skew joins, partition
coalescing), Arrow for the few Pandas-UDF paths, and a shuffle-partition
count sized for the tested scale while remaining AQE-coalescible at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Knobs chosen for scale-readiness, not just local tests:
#  - AQE on: runtime partition coalescing + skew-join splitting means the
#    same plan survives a 1000x data scale-up without re-tuning.
#  - advisoryPartitionSizeInBytes 64m: target post-shuffle partition size;
#    AQE coalesces tiny local shuffles and splits skewed ones toward this.
#  - Arrow enabled: the CDC exact-fold path and multimodal UDFs move data
#    via Arrow record batches, not pickled rows.
#  - maxRecordsPerBatch bounds Arrow batch memory for wide binary columns.
_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # honor the 64m advisory target when coalescing instead of keeping
    # one partition per core (r13, guide §2.2/§6): parallelismFirst=true
    # (the default) pins tiny post-shuffle stages at max parallelism —
    # dozens of near-empty tasks per stage for micro-batch-sized
    # shuffles; false is the documented recommendation ("respect the
    # configured target size") and is scale-ADAPTIVE, not a local-mode
    # constant: any shuffle past 64m per partition keeps full
    # parallelism at any cluster size, smaller ones stop paying
    # per-task overhead they can't use
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.session.timeZone": "UTC",
    # honored only by older Sparks for TIMESTAMP(NANOS) fixtures; current
    # fixtures are timestamp[us] and event-time goes through
    # model.ts_ns_expr, which dispatches on the surfaced type
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def tuned_builder(app_name: str = "mammoth_spark") -> SparkSession.Builder:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    return builder


def get_spark(app_name: str = "mammoth_spark") -> SparkSession:
    """Get or create the tuned session (idempotent within a JVM)."""
    return tuned_builder(app_name).getOrCreate()
