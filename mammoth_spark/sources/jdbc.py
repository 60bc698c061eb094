"""JDBC snapshot source (A1 snapshot_scan against a live Postgres).

The reference backfills with ``COPY ... TO STDOUT`` inside a REPEATABLE
READ transaction pinned to the replication slot's snapshot
(reference sync/service/sync_service.go:159-221). Spark's equivalent bulk
path is a PARTITIONED JDBC read: split the table on its primary key into
``num_partitions`` range predicates so every executor pulls its own slice
concurrently — one JDBC connection per task, no single-reader bottleneck.
That is the difference between a 100 TB backfill finishing and not.

The container has no live Postgres, but the read path EXECUTES against a
real JDBC database in tests: Spark's bundled embedded Derby serves a
genuine driver round-trip (tests/test_jdbc_exec.py — 4-way partitioned
read + predicate pushdown into the database). Snapshot
consistency note: JDBC reads don't share one transaction across
partitions; against a live source you pin consistency the way the
reference does — export the slot's snapshot (pg_export_snapshot) and have
each partition's session run SET TRANSACTION SNAPSHOT before reading, via
``sessionInitStatement``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_snapshot_options(
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    snapshot_name: str | None = None,
) -> dict[str, str]:
    """Build the partitioned-read option map.

    - ``partitionColumn/lowerBound/upperBound/numPartitions``: Spark
      generates ``num_partitions`` non-overlapping range predicates over
      the PK — the parallel analog of the reference's single COPY stream.
    - ``fetchsize``: cursor batch size; default 10k rows keeps memory flat
      (JDBC drivers default to tiny or unbounded fetches).
    - ``sessionInitStatement``: pins every partition's transaction to the
      exported snapshot, reproducing the reference's gap-free backfill
      boundary (sync_service.go:176-185).
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if upper_bound < lower_bound:
        raise ValueError("upper_bound must be >= lower_bound")
    opts = {
        "url": url,
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }
    if snapshot_name:
        opts["sessionInitStatement"] = (
            "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; "
            f"SET TRANSACTION SNAPSHOT '{snapshot_name}'"
        )
    return opts


def bounds_query(table: str, partition_column: str) -> str:
    """The min/max probe Spark needs before a partitioned read — one cheap
    index-only scan on the source (the reference's introspection phase
    issues similar catalog probes, sync_service.go:323-412)."""
    return f"SELECT min({partition_column}), max({partition_column}) FROM {table}"


def read_snapshot_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    **extra: str,
) -> DataFrame:
    """Partitioned JDBC snapshot read (executable shell over the option
    builder; requires a reachable database and driver jar)."""
    opts = jdbc_snapshot_options(
        url, table, partition_column, lower_bound, upper_bound, num_partitions
    )
    opts.update(extra)
    reader = spark.read.format("jdbc")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()
