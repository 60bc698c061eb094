"""merge_upsert / apply_changes — set-based MERGE semantics (A14/A15).

The reference applies each micro-batch as ONE ``MERGE INTO target USING
scratch ON pk`` per table with three branches (reference
target/snowflake/snowflake_target.go:536-602):

    WHEN MATCHED AND _DELETE_ROW THEN DELETE
    WHEN MATCHED THEN UPDATE SET col = CASE WHEN _IS_UNCHANGED_col
        THEN target.col WHEN _IS_NULL_col THEN NULL ELSE scratch.col END
    WHEN NOT MATCHED [AND NOT _DELETE_ROW] THEN INSERT

Without Delta in the container, the relational equivalent is a join on the
key + per-column conditional projection. A naive full-outer join would be
wrong at scale: **Spark cannot broadcast any full-outer join** (the hint
is silently dropped), so the whole target table would shuffle into a
sort-merge join. Instead MERGE decomposes into two broadcast-friendly
branches:

  1. ``target LEFT OUTER JOIN broadcast(changes)`` — updates, deletes and
     untouched rows in ONE narrow pass; the target never shuffles.
  2. inserts: ``changes LEFT ANTI JOIN target.select(keys)`` — the probe
     side is the (small) change set and the target contributes only its
     pruned key column(s); at 100 TB this scans a few percent of the
     table instead of shuffling all of it.

The result can be written back atomically with mode("overwrite") (A12
atomic_swap — Spark's file-commit protocol gives scratch-and-swap for
free).
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

    Additive schema evolution (Delta-style): a ``value_cols`` entry the
    TARGET does not yet carry is backfilled as typed NULL before the
    merge, so the first batch after an ``ALTER TABLE ADD COLUMN``
    upstream merges cleanly — existing rows read NULL for the new
    column until a change touches them. Purely a projection on the
    target scan; no extra pass.
    """
    missing = [c for c in value_cols if c not in changes.columns]
    if missing:
        raise ValueError(
            f"change batch lacks value column(s) {missing}: plain-column "
            "MERGE sets every value column from the batch row (absent ≠ "
            "inherit — that is the flagged/TOAST path), so post-evolution "
            "batches must carry the full schema"
        )
    for c in value_cols:
        if c not in target.columns:
            target = target.withColumn(
                c, F.lit(None).cast(changes.schema[c].dataType)
            )
    ch = changes.select(
        *key_cols,
        F.col(kind_col).alias("_kind"),
        *[F.col(c).alias(f"_new_{c}") for c in value_cols],
    )
    if broadcast_changes:
        ch = F.broadcast(ch)
    kind = F.col("_kind")

    # branch 1: one narrow pass over the target (updates/deletes/kept rows)
    joined = target.alias("t").join(ch.alias("c"), on=key_cols, how="left_outer")
    is_delete = F.coalesce(kind == KIND_DELETE, F.lit(False))
    existing = joined.filter(~is_delete).select(
        *key_cols,
        *[
            F.when(kind.isNull(), F.col(f"t.{c}")).otherwise(F.col(f"_new_{c}")).alias(c)
            for c in value_cols
        ],
    )

    # branch 2: change keys absent from the target insert as new rows;
    # the anti join probes only the target's pruned key column(s)
    inserts = (
        ch.filter(kind != KIND_DELETE)  # ghost DELETEs emit nothing
        .join(target.select(*key_cols), on=key_cols, how="left_anti")
        .select(*key_cols, *[F.col(f"_new_{c}").alias(c) for c in value_cols])
    )
    return existing.unionByName(inserts)


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

    Additive schema evolution composes exactly as on the plain path
    (ADVICE r11): a ``value_cols`` entry the TARGET does not yet carry
    is backfilled as typed NULL (type from the staging frame's plain
    column) before the merge, so the first flagged batch after an
    upstream ``ADD COLUMN`` merges cleanly instead of failing on the
    missing ``t.<col>`` reference. An ``unchanged`` cell on the new
    column then correctly inherits that NULL.
    """
    missing = [c for c in value_cols if c not in flattened.columns]
    if missing:
        raise ValueError(
            f"flagged change batch lacks value column(s) {missing}: "
            "change_flatten staging frames carry every declared value "
            "column (unchanged cells mark inheritance), so post-evolution "
            "batches must carry the full schema"
        )
    for c in value_cols:
        if c not in target.columns:
            target = target.withColumn(
                c, F.lit(None).cast(flattened.schema[c].dataType)
            )
    ch = flattened.select(
        *[F.col(f"_identity_{k}").alias(k) for k in key_cols],
        "_delete_row",
        *[F.col(c).alias(f"_new_{c}") for c in value_cols],
        *[F.col(f"_is_null_{c}") for c in value_cols],
        *[F.col(f"_is_unchanged_{c}") for c in value_cols],
    )
    if broadcast_changes:
        ch = F.broadcast(ch)
    in_changes = F.col("_delete_row").isNotNull()
    delete_row = F.coalesce(F.col("_delete_row"), F.lit(False))

    # branch 1: narrow pass over the target — matched rows merge per-column
    # with the reference's CASE (unchanged -> target, null -> NULL, else new)
    joined = target.alias("t").join(ch.alias("c"), on=key_cols, how="left_outer")
    cols = [F.col(k) for k in key_cols]
    for c in value_cols:
        cols.append(
            F.when(~in_changes, F.col(f"t.{c}"))
            .when(F.col(f"_is_unchanged_{c}"), F.col(f"t.{c}"))
            .when(F.col(f"_is_null_{c}"), F.lit(None))
            .otherwise(F.col(f"_new_{c}"))
            .alias(c)
        )
    existing = joined.filter(~delete_row).select(*cols)

    # branch 2: not-matched inserts (reference insert branch: only the
    # is_null CASE applies — there is no target value to inherit)
    inserts = (
        ch.filter(~F.col("_delete_row"))
        .join(target.select(*key_cols), on=key_cols, how="left_anti")
        .select(
            *key_cols,
            *[
                F.when(F.col(f"_is_null_{c}"), F.lit(None))
                .otherwise(F.col(f"_new_{c}"))
                .alias(c)
                for c in value_cols
            ],
        )
    )
    return existing.unionByName(inserts)


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
