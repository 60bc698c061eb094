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
from pyspark.sql import functions as F


def repartition_for_compute(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Spread rows across the cluster's cores before a CPU-bound stage."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism * multiplier)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: spread each hot fact key over ``salt_buckets``
    reducers by salting the fact side deterministically (hash of the whole
    row mod buckets) and replicating the dim side once per salt value.

    At 100 TB a single hot key (one customer generating 10% of events)
    turns a plain shuffle join into one straggler task; AQE's skew-join
    split handles sort-merge inputs, but salting is the general fix that
    also works for aggregations-after-join and for state-store keys. Cost:
    dim side inflates x``salt_buckets`` — use for genuinely skewed facts
    against small-to-medium dims.

    Only fact-side join types are semantics-preserving: each fact row
    lives in exactly ONE salt bucket, but each unmatched dim row appears
    in ``salt_buckets`` replicas — a right/full outer join would emit it
    once per salt. Those types are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
               "left_semi", "anti", "leftanti", "left_anti", "cross"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join: join type {how!r} is not semantics-preserving "
            "(unmatched dim rows would be replicated once per salt bucket); "
            "use inner/left/semi/anti"
        )
    # salt by row hash MIXED with the physical partition id: a hot key
    # whose rows are byte-identical would otherwise hash to one salt and
    # re-create the very straggler the salt exists to break up
    fact_salted = fact.withColumn(
        "_salt",
        F.pmod(
            F.hash(*[F.col(c) for c in fact.columns]) + F.spark_partition_id(),
            F.lit(salt_buckets),
        ),
    )
    dim_replicated = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    # force the shuffled join: if Catalyst broadcasts the replicated dim,
    # no key-partitioned shuffle happens and the salt is inert — the whole
    # point is partitioning the exchange on (key, salt)
    out = fact_salted.join(dim_replicated.hint("shuffle_hash"), on=[key, "_salt"], how=how)
    return out.drop("_salt")
