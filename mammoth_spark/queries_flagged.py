"""Oracle-checked queries for the tri-state (TOAST) CDC path:
change_flatten (A13) and merge with per-column CASE semantics (A14).

A deterministic flagged change log is derived from ``events``:

    kind:  signup->INSERT, error->DELETE, else UPDATE (model.py)
    props cell on non-DELETE actions:
      purchase -> explicit NULL        (is_null=true)
      view     -> TOAST-unchanged      (is_unchanged=true, only on UPDATE)
      others   -> explicit value
    value_c: integer cents = floor(value*100), always explicit on
      non-DELETE actions (string cell; integer formatting is
      engine-portable, double formatting is not)

Compaction per column picks the LATEST action whose cell is usable
(non-DELETE and not unchanged) — three arg_max's over the same ordering
key select consistently from the same winning row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import EVENTS_KIND_SQL, KIND_DELETE, events_as_change_log, read_table
from .operators import change_flatten, compact_last_wins_flagged, merge_upsert_flagged
from .registry import register

# ---- flagged change log construction (Spark + mirrored SQL) ----


def _flagged_cells(events: DataFrame) -> DataFrame:
    """events -> flagged change log with struct cells for props/value_c."""
    base = events.select(
        F.col("event_id").alias("seq"),
        F.col("user_id").cast("bigint").alias("key"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
    kind = (
        F.when(F.col("event_type") == "signup", F.lit("INSERT"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
    )
    is_del = kind == KIND_DELETE
    props_cell = F.struct(
        F.when(is_del | (F.col("event_type") == "purchase") | (F.col("event_type") == "view"), F.lit(None))
        .otherwise(F.col("props"))
        .alias("v"),
        (~is_del & (F.col("event_type") == "purchase")).alias("is_null"),
        ((kind == "UPDATE") & (F.col("event_type") == "view")).alias("is_unchanged"),
    )
    value_cell = F.struct(
        F.when(is_del, F.lit(None))
        .otherwise(F.floor(F.col("value") * 100).cast("bigint").cast("string"))
        .alias("v"),
        F.lit(False).alias("is_null"),
        F.lit(False).alias("is_unchanged"),
    )
    return base.select(
        "seq", "key", kind.alias("kind"), props_cell.alias("props"), value_cell.alias("value_c")
    )


# SQL mirror of _flagged_cells + flagged compaction
_FLAGGED_COMPACT_CTE = f"""
flagged AS (
  SELECT event_id AS seq,
         CAST(user_id AS BIGINT) AS key,
         {EVENTS_KIND_SQL} AS kind,
         CASE WHEN {EVENTS_KIND_SQL} = 'DELETE' OR event_type IN ('purchase','view')
              THEN NULL ELSE props END AS props_v,
         ({EVENTS_KIND_SQL} <> 'DELETE' AND event_type = 'purchase') AS props_is_null,
         ({EVENTS_KIND_SQL} = 'UPDATE' AND event_type = 'view') AS props_is_unchanged,
         CASE WHEN {EVENTS_KIND_SQL} = 'DELETE' THEN NULL
              ELSE CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) END AS value_c_v
  FROM events
),
agg AS (
  SELECT key,
         arg_min(kind, seq) AS first_kind,
         arg_max(kind, seq) AS last_kind,
         max(seq) AS last_seq,
         count(*) AS n_actions,
         arg_max({{'v': props_v, 'isnull': props_is_null}},
                 CASE WHEN kind <> 'DELETE' AND NOT props_is_unchanged THEN seq END) AS props_cell,
         arg_max({{'v': value_c_v, 'isnull': false}},
                 CASE WHEN kind <> 'DELETE' THEN seq END) AS value_cell
  FROM flagged GROUP BY key
),
compacted AS (
  SELECT key,
         CASE WHEN first_kind = 'INSERT' AND last_kind = 'DELETE' THEN NULL
              WHEN last_kind = 'DELETE' THEN 'DELETE'
              WHEN first_kind = 'INSERT' THEN 'INSERT'
              ELSE 'UPDATE' END AS kind,
         last_seq, n_actions, props_cell, value_cell
  FROM agg
  WHERE NOT (first_kind = 'INSERT' AND last_kind = 'DELETE')
)
"""


@register(
    "change_flatten",
    oracle=f"""
WITH {_FLAGGED_COMPACT_CTE}
SELECT key AS _identity_key,
       kind = 'DELETE' AS _delete_row,
       props_cell.v AS props,
       coalesce(props_cell.isnull, false) AS _is_null_props,
       props_cell IS NULL AS _is_unchanged_props,
       value_cell.v AS value_c,
       coalesce(value_cell.isnull, false) AS _is_null_value_c,
       value_cell IS NULL AS _is_unchanged_value_c
FROM compacted
""",
)
def change_flatten_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: wide staging projection of the flagged, compacted change set —
    _identity_*, _delete_row, per-column value + _is_null_* /
    _is_unchanged_* flags (layout: snowflake_target.go:441-450)."""
    log = _flagged_cells(read_table(spark, sf_dir, "events"))
    compacted = compact_last_wins_flagged(log, ["key"], ["props", "value_c"])
    flat = change_flatten(
        compacted.drop("last_seq", "n_actions"), ["key"], ["props", "value_c"], flagged=True
    )
    return flat


@register(
    "cdc_apply_flagged",
    oracle=f"""
WITH {_FLAGGED_COMPACT_CTE}
SELECT coalesce(t.c_custkey, c.key) AS c_custkey,
       t.c_name, t.c_nationkey, t.c_acctbal,
       CASE WHEN c.key IS NULL THEN t.c_mktsegment           -- untouched
            WHEN c.props_cell IS NULL AND t.c_custkey IS NOT NULL
              THEN t.c_mktsegment                            -- TOAST: inherit
            WHEN coalesce((c.props_cell).isnull, false) THEN NULL  -- explicit NULL
            ELSE (c.props_cell).v END AS c_mktsegment
FROM customer t FULL OUTER JOIN compacted c ON t.c_custkey = c.key
WHERE coalesce(c.kind, '') <> 'DELETE'
""",
)
def cdc_apply_flagged_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 with full tri-state semantics: apply the flagged change log to
    ``customer`` mapping props -> c_mktsegment. Unchanged inherits the
    target's value; explicit NULL nulls it; values win otherwise —
    exactly the reference MERGE CASE (snowflake_target.go:552)."""
    target = read_table(spark, sf_dir, "customer")
    log = _flagged_cells(read_table(spark, sf_dir, "events"))
    compacted = compact_last_wins_flagged(log, ["key"], ["props", "value_c"]).drop(
        "last_seq", "n_actions"
    )
    flat = change_flatten(compacted, ["key"], ["props", "value_c"], flagged=True)
    # align staging frame to the target's merge columns: props -> c_mktsegment
    staged = flat.select(
        F.col("_identity_key").alias("_identity_c_custkey"),
        "_delete_row",
        F.col("props").alias("c_mktsegment"),
        F.col("_is_null_props").alias("_is_null_c_mktsegment"),
        F.col("_is_unchanged_props").alias("_is_unchanged_c_mktsegment"),
    )
    merged = merge_upsert_flagged(
        target.select("c_custkey", "c_mktsegment"),
        staged,
        ["c_custkey"],
        ["c_mktsegment"],
    )
    # re-attach the pass-through columns (kept verbatim by the reference
    # MERGE since only c_mktsegment participates)
    rest = target.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    return merged.join(rest, "c_custkey", "left").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
