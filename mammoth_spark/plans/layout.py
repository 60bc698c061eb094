"""Partition-layout helpers for compute-bound stages.

Parquet scan parallelism follows file/row-group layout
(spark.sql.files.maxPartitionBytes), which is right for IO-bound scans
but wrong for CPU-bound per-row stages: a small file = one task = one
core, no matter how expensive the per-row work (measured here: the
5000-doc fixture arrives as ONE partition, serializing shingling/
fingerprinting ~4x slower than the same work spread over the cluster).
At 100 TB the same mismatch appears as too-coarse 128 MB partitions
feeding a decode/embed stage. The fix is the same at both scales:
repartition to compute parallelism before the expensive projection —
one cheap shuffle of the raw rows buys full-width execution."""

from __future__ import annotations

from pyspark.sql import DataFrame


def repartition_for_compute(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Spread rows across the cluster's cores before a CPU-bound stage."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism * multiplier)
