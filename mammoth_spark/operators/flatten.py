"""change_flatten — encode compacted actions as wide staging rows (A13).

The reference serializes each compacted action as one wide CSV row for the
Snowflake stage: ``_IDENTITY_<pk>`` columns, a ``_DELETE_ROW`` flag, the
per-column new value, and ``_IS_UNCHANGED_<col>`` / ``_IS_NULL_<col>``
flags (reference target/snowflake/snowflake_target.go:406-523, column
layout spec :441-450). Here it is a pure projection — zero shuffles, fully
codegen'd, and column-prunable at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import KIND_DELETE


def change_flatten(
    compacted: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    kind_col: str = "kind",
    flagged: bool = False,
) -> DataFrame:
    """Project a compacted change set into the staging layout.

    ``flagged=True`` means value columns are struct<v,is_null,is_unchanged>
    cells; otherwise they are plain columns where SQL NULL on a non-DELETE
    action means "set NULL" (no TOAST tri-state).
    """
    cols = [F.col(k).alias(f"_identity_{k}") for k in key_cols]
    cols.append((F.col(kind_col) == KIND_DELETE).alias("_delete_row"))
    for c in value_cols:
        if flagged:
            cell = F.col(c)
            cols.append(cell["v"].alias(c))
            cols.append(F.coalesce(cell["is_null"], F.lit(False)).alias(f"_is_null_{c}"))
            cols.append(
                # a NULL cell after compaction means every action left the
                # column unchanged -> inherit target value at merge time
                F.coalesce(cell["is_unchanged"], cell.isNull()).alias(f"_is_unchanged_{c}")
            )
        else:
            cols.append(F.col(c))
            cols.append(
                (F.col(c).isNull() & (F.col(kind_col) != KIND_DELETE)).alias(f"_is_null_{c}")
            )
            cols.append(F.lit(False).alias(f"_is_unchanged_{c}"))
    return compacted.select(*cols)
