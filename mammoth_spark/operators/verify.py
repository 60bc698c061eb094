"""Schema verification & set-equality operators (A18 schema_verify,
A19 publication_manage).

The reference diffs the Postgres schema against the target's by loading
both column lists and running UNION ALL → GROUP BY (column, type) →
COUNT(*)=1 means "only in one side" (reference
target/snowflake/snowflake_target.go:241-250), and checks the publication
table list against config by set equality
(sync/service/sync_service.go:278-290). Both are pure relational ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def schema_as_df(spark: SparkSession, df: DataFrame, side: str) -> DataFrame:
    """Catalog listing of one table's columns as rows (name, type, side)."""
    rows = [(f.name, f.dataType.simpleString(), side) for f in df.schema.fields]
    schema = T.StructType(
        [
            T.StructField("column_name", T.StringType()),
            T.StructField("column_type", T.StringType()),
            T.StructField("side", T.StringType()),
        ]
    )
    from ..model import local_df

    return local_df(spark, rows, schema)


def schema_diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """The reference's verify query shape (snowflake_target.go:241-250):
    UNION ALL both column listings, GROUP BY (column, type); groups with
    COUNT(*)=1 exist on only one side. Empty result == schemas match.

    ``left``/``right`` are (column_name, column_type, side) listings from
    :func:`schema_as_df`.
    """
    unioned = left.unionByName(right)
    return (
        unioned.groupBy("column_name", "column_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("side").alias("only_in"))
        .filter(F.col("n") == 1)
        .select("column_name", "column_type", "only_in")
    )


def set_equality(left: DataFrame, right: DataFrame) -> DataFrame:
    """A19: two-way anti-join set difference over single-column listings —
    rows present in exactly one side, tagged. Empty == sets equal
    (the reference's nested-loop equality, sync_service.go:278-290,
    re-expressed as the scalable anti-join)."""
    lcol, rcol = left.columns[0], right.columns[0]
    only_left = left.join(right, left[lcol] == right[rcol], "left_anti").select(
        F.col(lcol).alias("member"), F.lit("left").alias("only_in")
    )
    only_right = right.join(left, right[rcol] == left[lcol], "left_anti").select(
        F.col(rcol).alias("member"), F.lit("right").alias("only_in")
    )
    return only_left.unionByName(only_right)
