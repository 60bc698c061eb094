"""Snapshot / backfill sources (A1 snapshot_scan, A22 csv_chunk).

The reference backfills by streaming a consistent-snapshot ``COPY … TO
STDOUT (format csv)`` into chunked staged CSV loads
(sync/service/sync_service.go:159-221, target/common/csvsplit/csvsplit.go).
Spark's CSV reader with multiLine=True is embedded-newline-correct (the
exact bug csvsplit guards against, csvsplit.go:33-36), and chunking is the
writer's partitioning — ``maxRecordsPerFile`` reproduces the 20,000-row
chunk constant (snowflake_target.go:28) declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..types import Relation
from .target import ParquetMergeTarget

BACKFILL_ROWS_PER_FILE = 20_000  # reference rowsPerChunk (snowflake_target.go:28)


def read_csv_snapshot(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """A1+A22: read a CSV snapshot export. multiLine handles quoted
    embedded newlines; an explicit schema skips the inference pass (at
    100 TB, schema inference is a full extra scan — never rely on it)."""
    reader = (
        spark.read.option("header", header)
        .option("multiLine", True)
        .option("escape", '"')
        .option("emptyValue", "")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def snapshot_to_target(
    df: DataFrame,
    target: ParquetMergeTarget,
    rows_per_file: int = BACKFILL_ROWS_PER_FILE,
) -> None:
    """A11+A12: staged bulk load + atomic publish. The chunked parallel
    upload is the writer's task parallelism; maxRecordsPerFile mirrors the
    reference's 20k-row chunks; the version-pointer publish is the swap."""
    target.spark.conf.set("spark.sql.files.maxRecordsPerFile", str(rows_per_file))
    target.initialize(df)
