"""merge_upsert / apply_changes — set-based MERGE semantics (A14/A15).

The reference applies each micro-batch as ONE ``MERGE INTO target USING
scratch ON pk`` per table with three branches (reference
target/snowflake/snowflake_target.go:536-602):

    WHEN MATCHED AND _DELETE_ROW THEN DELETE
    WHEN MATCHED THEN UPDATE SET col = CASE WHEN _IS_UNCHANGED_col
        THEN target.col WHEN _IS_NULL_col THEN NULL ELSE scratch.col END
    WHEN NOT MATCHED [AND NOT _DELETE_ROW] THEN INSERT

Without Delta in the container, the exact relational equivalent is a
full-outer join on the key + per-column conditional projection — the same
set-based shape Catalyst would plan for MERGE. The change side is a
compacted micro-batch (small — ≤25k rows by the batching contract), so the
join is explicitly **broadcast**: the big target table never shuffles, and
the plan is a single pass over the target at any scale. The result can be
written back atomically with mode("overwrite") (A12 atomic_swap — Spark's
file-commit protocol gives scratch-and-swap for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import KIND_DELETE


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    kind_col: str = "kind",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a compacted change set to a target table.

    ``changes`` must be compacted (≤1 action per key) — the reference has
    the same precondition: MERGE requires unique source keys, which is WHY
    compaction is a mandatory pre-step (SURVEY §4). ``value_cols`` are
    plain columns (NULL on an UPDATE/INSERT means set NULL; there is no
    TOAST tri-state on this path — see merge_upsert_flagged).
    """
    ch = changes.select(
        *key_cols,
        F.col(kind_col).alias("_kind"),
        *[F.col(c).alias(f"_new_{c}") for c in value_cols],
    )
    if broadcast_changes:
        ch = F.broadcast(ch)
    joined = (
        target.withColumn("_t_exists", F.lit(True))
        .alias("t")
        .join(ch.alias("c"), on=key_cols, how="full_outer")
    )
    kind = F.col("_kind")
    is_delete = F.coalesce(kind == KIND_DELETE, F.lit(False))
    # matched DELETE removes the row; unmatched (ghost) DELETE emits nothing
    out = joined.filter(~is_delete)
    return out.select(
        *key_cols,
        *[
            F.when(kind.isNull(), F.col(f"t.{c}")).otherwise(F.col(f"_new_{c}")).alias(c)
            for c in value_cols
        ],
    )


def merge_upsert_flagged(
    target: DataFrame,
    flattened: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    broadcast_changes: bool = True,
) -> DataFrame:
    """MERGE with the full tri-state column semantics over a
    ``change_flatten`` staging frame (``_identity_*``, ``_delete_row``,
    ``_is_null_*``, ``_is_unchanged_*``).

    Per column, exactly the reference's CASE (snowflake_target.go:552):
    unchanged -> keep target's value; is_null -> NULL; else the new value.
    """
    ch = flattened.select(
        *[F.col(f"_identity_{k}").alias(k) for k in key_cols],
        "_delete_row",
        *[F.col(c).alias(f"_new_{c}") for c in value_cols],
        *[F.col(f"_is_null_{c}") for c in value_cols],
        *[F.col(f"_is_unchanged_{c}") for c in value_cols],
    )
    if broadcast_changes:
        ch = F.broadcast(ch)
    joined = (
        target.withColumn("_t_exists", F.lit(True))
        .alias("t")
        .join(ch.alias("c"), on=key_cols, how="full_outer")
    )
    in_target = F.coalesce(F.col("_t_exists"), F.lit(False))
    in_changes = F.col("_delete_row").isNotNull()
    delete_row = F.coalesce(F.col("_delete_row"), F.lit(False))
    out = joined.filter(~delete_row)  # drops matched deletes AND ghost deletes
    cols = [F.col(k) for k in key_cols]
    for c in value_cols:
        cols.append(
            F.when(~in_changes, F.col(f"t.{c}"))
            .when(F.col(f"_is_unchanged_{c}") & in_target, F.col(f"t.{c}"))
            .when(F.col(f"_is_null_{c}"), F.lit(None))
            .otherwise(F.col(f"_new_{c}"))
            .alias(c)
        )
    return out.select(*cols)


def apply_changes(
    target: DataFrame,
    change_log: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    seq_col: str = "seq",
    kind_col: str = "kind",
) -> DataFrame:
    """End-to-end batch apply: compact the raw change log, then merge it
    into the target — the body of the reference's ``Write``
    (snowflake_target.go:283-340) as two DataFrame ops."""
    from .compact import compact_last_wins

    compacted = compact_last_wins(change_log, key_cols, value_cols, seq_col, kind_col)
    return merge_upsert(target, compacted.drop("last_seq", "n_actions"), key_cols, value_cols)
