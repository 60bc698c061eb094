"""The oracle-checked query surface (driver contract).

Each entry pairs a Spark DataFrame implementation (built from the
operators in this package) with an equivalent ANSI-SQL oracle that DuckDB
runs on the same parquet fixtures. Column names/aliases match exactly on
both sides — the driver hashes values after sorting columns by name.

Registered here and re-exported by /root/repo/__spark_entry__.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .model import EVENTS_KIND_SQL, KIND_DELETE, events_as_change_log, local_df, read_table
from .operators import (
    apply_changes,
    compact_last_wins,
    empty_tx_filter,
    group_by_relation,
    merge_upsert,
    micro_batch_stats,
    offset_commit,
    schema_diff,
    set_equality,
    tx_assemble,
)

from .registry import ORACLES, QUERIES, register


# Common oracle CTE: the events->change-log mapping (model.py, FIXTURES.md §3)
CHANGE_LOG_CTE = f"""
change_log AS (
  SELECT CAST(floor(event_id / 50) AS BIGINT) AS lsn,
         event_id AS seq,
         'public' AS schema, 'users' AS tbl,
         {EVENTS_KIND_SQL} AS kind,
         CAST(user_id AS BIGINT) AS key,
         value, props,
         CAST(epoch_ns(ts) AS BIGINT) AS ts_ns
  FROM events
)
"""


# --------------------------- CDC core (SURVEY §2 A-table) ---------------------------


@register(
    "cdc_last_per_key",
    driver=False,
    oracle=f"""
WITH {CHANGE_LOG_CTE}
SELECT key, kind, value, props, seq AS last_seq FROM (
  SELECT key, kind, value, props, seq,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM change_log
) WHERE rn = 1
""",
)
def cdc_last_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last action per row identity — the window primitive under A9.

    Implemented as max_by aggregation (map-side combinable; one shuffle,
    no sort) rather than a row_number window."""
    log = events_as_change_log(read_table(spark, sf_dir, "events"))
    return log.groupBy("key").agg(
        F.max_by("kind", "seq").alias("kind"),
        F.max_by("value", "seq").alias("value"),
        F.max_by("props", "seq").alias("props"),
        F.max("seq").alias("last_seq"),
    )


@register(
    "cdc_net_effect",
    # local-only: A9 stays driver-evidenced by cdc_last_per_key,
    # cdc_compact_exact, cdc_apply_multikey, invalid_sequence_detect
    driver=False,
    oracle=f"""
WITH {CHANGE_LOG_CTE},
agg AS (
  SELECT key,
         arg_min(kind, seq) AS first_kind,
         arg_max(kind, seq) AS last_kind,
         max(seq) AS last_seq,
         count(*) AS n_actions,
         arg_max(value, CASE WHEN kind <> 'DELETE' THEN seq END) AS value,
         arg_max(props, CASE WHEN kind <> 'DELETE' THEN seq END) AS props
  FROM change_log GROUP BY key
)
SELECT key,
       CASE WHEN first_kind = 'INSERT' AND last_kind = 'DELETE' THEN NULL
            WHEN last_kind = 'DELETE' THEN 'DELETE'
            WHEN first_kind = 'INSERT' THEN 'INSERT'
            ELSE 'UPDATE' END AS kind,
       last_seq, n_actions, value, props
FROM agg
WHERE NOT (first_kind = 'INSERT' AND last_kind = 'DELETE')
""",
)
def cdc_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cdc_compact fast path (A9): net kind + latest values per key."""
    log = events_as_change_log(read_table(spark, sf_dir, "events"))
    return compact_last_wins(log, ["key"], ["value", "props"]).select(
        "key", "kind", "last_seq", "n_actions", "value", "props"
    )


@register(
    "cdc_apply",
    # local-only: cdc_apply_flagged runs the same merge path plus the
    # TOAST tri-state, so A14 keeps a strictly stronger driver entry
    driver=False,
    oracle=f"""
WITH {CHANGE_LOG_CTE},
agg AS (
  SELECT key,
         arg_min(kind, seq) AS first_kind,
         arg_max(kind, seq) AS last_kind,
         arg_max(value, CASE WHEN kind <> 'DELETE' THEN seq END) AS value
  FROM change_log GROUP BY key
),
compacted AS (
  SELECT key,
         CASE WHEN last_kind = 'DELETE' THEN 'DELETE'
              WHEN first_kind = 'INSERT' THEN 'INSERT'
              ELSE 'UPDATE' END AS kind,
         value
  FROM agg
  WHERE NOT (first_kind = 'INSERT' AND last_kind = 'DELETE')
)
SELECT coalesce(t.c_custkey, c.key) AS c_custkey,
       t.c_name,
       t.c_nationkey,
       CASE WHEN c.kind IS NULL THEN t.c_acctbal ELSE c.value END AS c_acctbal,
       t.c_mktsegment
FROM customer t FULL OUTER JOIN compacted c ON t.c_custkey = c.key
WHERE coalesce(c.kind, '') <> 'DELETE'
""",
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+A14+A15 end-to-end: compact the change log and MERGE it into the
    ``customer`` base table (key c_custkey = user_id; c_acctbal takes the
    change's value; other columns keep target values — NULL for inserts).

    MERGE shape (see operators/merge.py): Spark cannot broadcast a
    full-outer join, so the merge decomposes into a broadcast LEFT OUTER
    pass over the target (updates/deletes — the target never shuffles)
    unioned with anti-join inserts probing only the target's key column."""
    target = read_table(spark, sf_dir, "customer")
    log = events_as_change_log(read_table(spark, sf_dir, "events")).select(
        "seq", "kind", "key", "value"
    )
    compacted = F.broadcast(
        compact_last_wins(log, ["key"], ["value"]).select("key", "kind", "value")
    )
    kind = F.col("c.kind")
    existing = (
        target.alias("t")
        .join(compacted.alias("c"), F.col("t.c_custkey") == F.col("c.key"), "left_outer")
        .filter(F.coalesce(kind, F.lit("")) != KIND_DELETE)
        .select(
            F.col("t.c_custkey").alias("c_custkey"),
            F.col("t.c_name").alias("c_name"),
            F.col("t.c_nationkey").alias("c_nationkey"),
            F.when(kind.isNull(), F.col("t.c_acctbal"))
            .otherwise(F.col("c.value"))
            .alias("c_acctbal"),
            F.col("t.c_mktsegment").alias("c_mktsegment"),
        )
    )
    inserts = (
        compacted.filter(F.col("kind") != KIND_DELETE)
        .join(
            target.select("c_custkey"),
            F.col("key") == F.col("c_custkey"),
            "left_anti",
        )
        .select(
            F.col("key").alias("c_custkey"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            F.col("value").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
    )
    return existing.unionByName(inserts)


@register(
    "tx_assemble",
    oracle=f"""
WITH {CHANGE_LOG_CTE}
SELECT lsn, count(*) AS n_actions, min(seq) AS first_seq, max(seq) AS last_seq,
       CAST(sum(CASE WHEN kind = 'INSERT' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
       CAST(sum(CASE WHEN kind = 'UPDATE' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
       CAST(sum(CASE WHEN kind = 'DELETE' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete
FROM change_log GROUP BY lsn
""",
)
def tx_assemble_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: WAL message -> transaction assembly as a groupBy(lsn)."""
    log = events_as_change_log(read_table(spark, sf_dir, "events"))
    return tx_assemble(log)


@register(
    "micro_batch_stats",
    oracle=f"""
WITH {CHANGE_LOG_CTE},
txs AS (
  SELECT lsn, count(*) AS n_actions FROM change_log GROUP BY lsn
),
cum AS (
  SELECT lsn, n_actions,
         sum(n_actions) OVER (ORDER BY lsn ROWS UNBOUNDED PRECEDING) AS cum_actions
  FROM txs
)
SELECT CAST(floor((cum_actions - 1) / 500.0) AS BIGINT) AS batch_id,
       count(*) AS n_transactions, CAST(sum(n_actions) AS BIGINT) AS n_actions,
       min(lsn) AS first_lsn, max(lsn) AS last_lsn
FROM cum GROUP BY 1
""",
)
def micro_batch_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: count-bounded micro-batch accounting (500 actions per batch at
    test scale; 25k in production per reference config/config.go:49)."""
    log = events_as_change_log(read_table(spark, sf_dir, "events"))
    return micro_batch_stats(log, batch_max_items=500)


@register(
    "group_by_relation",
    driver=False,  # r3 rotation: A8 evidenced by wal_batch_pipeline
    oracle=f"""
WITH {CHANGE_LOG_CTE}
SELECT schema, tbl, count(*) AS n_actions, count(DISTINCT lsn) AS n_transactions,
       min(seq) AS first_seq, max(seq) AS last_seq
FROM change_log GROUP BY schema, tbl
""",
)
def group_by_relation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-relation batch partitioning accounting."""
    log = events_as_change_log(read_table(spark, sf_dir, "events"))
    return group_by_relation(log)


@register(
    "offset_commit",
    driver=False,  # r3 rotation: A16 evidenced by wal_batch_pipeline
    oracle=f"""
WITH {CHANGE_LOG_CTE}
SELECT max(lsn) + 1 AS committed_lsn, max(seq) AS committed_seq,
       count(*) AS acked_actions
FROM change_log
""",
)
def offset_commit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: committed-LSN register after a durable batch write."""
    log = events_as_change_log(read_table(spark, sf_dir, "events"))
    return offset_commit(log)


@register(
    "empty_tx_filter",
    driver=False,  # r3 rotation: A7 evidenced by wal_batch_pipeline
    oracle=f"""
WITH {CHANGE_LOG_CTE},
txs AS (
  SELECT lsn, count(*) AS n_actions, min(seq) AS first_seq, max(seq) AS last_seq,
         CAST(sum(CASE WHEN kind = 'INSERT' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
         CAST(sum(CASE WHEN kind = 'UPDATE' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
         CAST(sum(CASE WHEN kind = 'DELETE' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete
  FROM change_log GROUP BY lsn
)
SELECT * FROM txs WHERE n_actions > 0
""",
)
def empty_tx_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: drop keepalive-only transactions before the sink."""
    log = events_as_change_log(read_table(spark, sf_dir, "events"))
    return empty_tx_filter(tx_assemble(log))


@register(
    "wal_batch_pipeline",
    oracle="""
WITH msgs AS (
  SELECT CAST(floor(event_id / 3) AS BIGINT) AS lsn,
         event_id AS seq,
         CASE WHEN event_type = 'signup' THEN 'INSERT'
              WHEN event_type = 'error' THEN 'DELETE'
              WHEN event_type IN ('click', 'purchase') THEN 'UPDATE' END AS kind,
         CASE WHEN event_type IN ('signup', 'error') THEN 'users'
              WHEN event_type IN ('click', 'purchase') THEN 'user_metrics' END AS tbl
  FROM events
),
txs AS (SELECT lsn, count(kind) AS n_actions FROM msgs GROUP BY lsn),
rel AS (
  SELECT 'public' AS schema, tbl, count(*) AS n_actions,
         count(DISTINCT lsn) AS n_transactions,
         min(seq) AS first_seq, max(seq) AS last_seq
  FROM msgs WHERE kind IS NOT NULL GROUP BY tbl
),
stats AS (
  SELECT max(lsn) + 1 AS committed_lsn, max(seq) AS committed_seq,
         count(*) AS acked_actions
  FROM msgs
),
txc AS (
  SELECT CAST(sum(CASE WHEN n_actions > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nonempty_tx,
         count(*) AS n_tx_total
  FROM txs
)
SELECT rel.*, stats.*, txc.n_nonempty_tx, txc.n_tx_total,
       txc.n_tx_total - txc.n_nonempty_tx AS n_empty_tx
FROM rel, stats, txc
""",
)
def wal_batch_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite batch pipeline: decode -> assemble -> drop empties ->
    group by relation -> commit offset, in ONE plan (A5+A7+A8+A16).

    Models the reference's full per-batch path (sync/stream/stream.go:
    255-345): protocol messages that produce no row action ('view' events
    here stand in for Relation/Type/Origin messages) still flow through
    assembly, so transactions whose 3-message window is all noise become
    EMPTY and are dropped by A7 — yet their LSNs still advance the
    committed cursor (A16 aggregates over ALL messages, not just sink
    actions). Two published relations ('users' for identity changes,
    'user_metrics' for activity updates) exercise A8's per-relation
    partitioning.

    Plan shape at 100 TB: one scan feeding two hash aggregations (both
    map-side combinable); the offset/empty-count sides are 1-row
    aggregates broadcast onto the 2-row relation summary — no shuffle of
    the big side beyond the two keyed aggs."""
    ev = read_table(spark, sf_dir, "events")
    noise_free_kind = (
        F.when(ev.event_type == "signup", F.lit("INSERT"))
        .when(ev.event_type == "error", F.lit("DELETE"))
        .when(ev.event_type.isin("click", "purchase"), F.lit("UPDATE"))
    )
    msgs = ev.select(
        F.floor(ev.event_id / F.lit(3)).cast("long").alias("lsn"),
        ev.event_id.alias("seq"),
        noise_free_kind.alias("kind"),
        F.when(ev.event_type.isin("signup", "error"), F.lit("users"))
        .when(ev.event_type.isin("click", "purchase"), F.lit("user_metrics"))
        .alias("tbl"),
    )
    # A5 assembly at message level: per-tx count of *sink* actions
    txs = msgs.groupBy("lsn").agg(F.count("kind").alias("n_actions"))
    nonempty_cnt = empty_tx_filter(txs).agg(  # A7
        F.count(F.lit(1)).alias("n_nonempty_tx")
    )
    total_cnt = txs.agg(F.count(F.lit(1)).alias("n_tx_total"))
    actions = msgs.filter(F.col("kind").isNotNull()).withColumn(
        "schema", F.lit("public")
    )
    rel = group_by_relation(actions)  # A8
    stats = (
        offset_commit(msgs)  # A16: empty txs still advance the cursor
        .crossJoin(nonempty_cnt)
        .crossJoin(total_cnt)
        .withColumn("n_empty_tx", F.col("n_tx_total") - F.col("n_nonempty_tx"))
    )
    return rel.crossJoin(F.broadcast(stats))


@register(
    "schema_verify",
    oracle="""
WITH pg_side AS (
  SELECT 'c_custkey' AS column_name, 'bigint' AS column_type, 'pg' AS side UNION ALL
  SELECT 'c_name', 'string', 'pg' UNION ALL
  SELECT 'c_nationkey', 'int', 'pg' UNION ALL
  SELECT 'c_acctbal', 'double', 'pg' UNION ALL
  SELECT 'c_mktsegment', 'string', 'pg' UNION ALL
  SELECT 'c_comment', 'string', 'pg'
),
tgt_side AS (
  SELECT 'c_custkey' AS column_name, 'bigint' AS column_type, 'target' AS side UNION ALL
  SELECT 'c_name', 'string', 'target' UNION ALL
  SELECT 'c_nationkey', 'bigint', 'target' UNION ALL
  SELECT 'c_acctbal', 'double', 'target' UNION ALL
  SELECT 'c_mktsegment', 'string', 'target'
)
SELECT column_name, column_type, min(side) AS only_in FROM (
  SELECT * FROM pg_side UNION ALL SELECT * FROM tgt_side
) GROUP BY column_name, column_type HAVING count(*) = 1
""",
)
def schema_verify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18: UNION ALL / GROUP BY schema diff. Drift injected: target lacks
    c_comment and types c_nationkey as bigint (mirrors the reference's
    verify query, snowflake_target.go:241-250)."""
    pg_rows = [
        ("c_custkey", "bigint", "pg"),
        ("c_name", "string", "pg"),
        ("c_nationkey", "int", "pg"),
        ("c_acctbal", "double", "pg"),
        ("c_mktsegment", "string", "pg"),
        ("c_comment", "string", "pg"),
    ]
    tgt_rows = [
        ("c_custkey", "bigint", "target"),
        ("c_name", "string", "target"),
        ("c_nationkey", "bigint", "target"),
        ("c_acctbal", "double", "target"),
        ("c_mktsegment", "string", "target"),
    ]
    cols = ["column_name", "column_type", "side"]
    left = local_df(spark, pg_rows, cols)
    right = local_df(spark, tgt_rows, cols)
    return schema_diff(left, right)


@register(
    "publication_set_equality",
    oracle="""
WITH config_tables AS (
  SELECT DISTINCT 'n_' || CAST(n_nationkey AS VARCHAR) AS member
  FROM nation WHERE n_nationkey < 20
),
pub_tables AS (
  SELECT DISTINCT 'n_' || CAST(n_nationkey AS VARCHAR) AS member
  FROM nation WHERE n_nationkey >= 5
)
SELECT member, 'left' AS only_in FROM config_tables
WHERE member NOT IN (SELECT member FROM pub_tables)
UNION ALL
SELECT member, 'right' AS only_in FROM pub_tables
WHERE member NOT IN (SELECT member FROM config_tables)
""",
)
def publication_set_equality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: config-vs-publication table-list set equality as two anti-joins
    (the scalable rewrite of the reference's nested loop,
    sync_service.go:278-290)."""
    nation = read_table(spark, sf_dir, "nation")
    member = F.concat(F.lit("n_"), F.col("n_nationkey").cast("string")).alias("member")
    left = nation.filter(F.col("n_nationkey") < 20).select(member).distinct()
    right = nation.filter(F.col("n_nationkey") >= 5).select(member).distinct()
    return set_equality(left, right)


@register(
    "schema_evolution_apply",
    oracle=f"""
WITH {CHANGE_LOG_CTE},
agg AS (
  SELECT key,
         arg_min(kind, seq) AS first_kind,
         arg_max(kind, seq) AS last_kind,
         arg_max(value, CASE WHEN kind <> 'DELETE' THEN seq END) AS value
  FROM change_log GROUP BY key
),
compacted AS (
  SELECT key,
         CASE WHEN last_kind = 'DELETE' THEN 'DELETE'
              WHEN first_kind = 'INSERT' THEN 'INSERT'
              ELSE 'UPDATE' END AS kind,
         value,
         CASE WHEN value >= 500 THEN 'gold' ELSE 'std' END AS c_tier
  FROM agg
  WHERE NOT (first_kind = 'INSERT' AND last_kind = 'DELETE')
)
SELECT coalesce(t.c_custkey, c.key) AS c_custkey,
       t.c_name,
       t.c_nationkey,
       CASE WHEN c.kind IS NULL THEN t.c_acctbal ELSE c.value END AS c_acctbal,
       t.c_mktsegment,
       c.c_tier
FROM customer t FULL OUTER JOIN compacted c ON t.c_custkey = c.key
WHERE coalesce(c.kind, '') <> 'DELETE'
""",
)
def schema_evolution_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution through the MERGE path: the change batch
    carries a column the target does not have yet (`c_tier`), and the
    apply WIDENS the target schema in the same operation — touched rows
    get the new column's value, untouched rows NULL-backfill. This is
    the mergeSchema behavior of Delta/Iceberg targets, built here on the
    same broadcast-decomposed merge as cdc_apply; the reference instead
    aborts and re-backfills on any relation change
    (supervisor ErrRelationChanged loop,
    /root/reference/supervisor/supervisor.go:31-83, and our
    streaming/pipeline.py drift path) — additive widening is the cheap
    in-place alternative when the change is purely additive.

    Scale: identical plan to cdc_apply — the target never shuffles, the
    compacted batch broadcasts; widening is a projection, not a rewrite
    (NULL backfill is metadata-only in columnar formats)."""
    target = read_table(spark, sf_dir, "customer")
    log = events_as_change_log(read_table(spark, sf_dir, "events")).select(
        "seq", "kind", "key", "value"
    )
    tier = (
        F.when(F.col("value") >= 500, F.lit("gold")).otherwise(F.lit("std"))
    )
    compacted = F.broadcast(
        compact_last_wins(log, ["key"], ["value"]).select(
            "key", "kind", "value", tier.alias("c_tier")
        )
    )
    kind = F.col("c.kind")
    existing = (
        target.alias("t")
        .join(compacted.alias("c"), F.col("t.c_custkey") == F.col("c.key"), "left_outer")
        .filter(F.coalesce(kind, F.lit("")) != KIND_DELETE)
        .select(
            F.col("t.c_custkey").alias("c_custkey"),
            F.col("t.c_name").alias("c_name"),
            F.col("t.c_nationkey").alias("c_nationkey"),
            F.when(kind.isNull(), F.col("t.c_acctbal"))
            .otherwise(F.col("c.value"))
            .alias("c_acctbal"),
            F.col("t.c_mktsegment").alias("c_mktsegment"),
            F.col("c.c_tier").alias("c_tier"),
        )
    )
    inserts = (
        compacted.filter(F.col("kind") != KIND_DELETE)
        .join(
            target.select("c_custkey"),
            F.col("key") == F.col("c_custkey"),
            "left_anti",
        )
        .select(
            F.col("key").alias("c_custkey"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            F.col("value").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
            F.col("c_tier"),
        )
    )
    return existing.unionByName(inserts)


# pull in the training-data-pipeline query surface (text analysis, dedup,
# similarity search) and the tri-state CDC surface — registration happens
# on import
from . import queries_analytics  # noqa: E402,F401
from . import queries_classifier  # noqa: E402,F401
from . import queries_cleaning  # noqa: E402,F401
from . import queries_corpus  # noqa: E402,F401
from . import queries_curation  # noqa: E402,F401
from . import queries_decision  # noqa: E402,F401
from . import queries_drift  # noqa: E402,F401
from . import queries_embed_eval  # noqa: E402,F401
from . import queries_evalmetrics  # noqa: E402,F401
from . import queries_evalprep  # noqa: E402,F401
from . import queries_flagged  # noqa: E402,F401
from . import queries_governance  # noqa: E402,F401
from . import queries_joins  # noqa: E402,F401
from . import queries_lm  # noqa: E402,F401
from . import queries_misc  # noqa: E402,F401
from . import queries_mixture  # noqa: E402,F401
from . import queries_selection  # noqa: E402,F401
from . import queries_unigram  # noqa: E402,F401
from . import queries_wordpiece  # noqa: E402,F401
from . import queries_preference  # noqa: E402,F401
from . import queries_pipeline  # noqa: E402,F401


@register(
    "scd2_history",
    oracle=f"""
WITH {CHANGE_LOG_CTE},
vers AS (
  SELECT key, seq,
         CAST(floor(value * 1000) AS BIGINT) AS value_milli,
         kind,
         lead(seq) OVER (PARTITION BY key ORDER BY seq) AS next_seq
  FROM change_log
)
SELECT key,
       value_milli,
       seq AS valid_from_seq,
       next_seq AS valid_to_seq,
       next_seq IS NULL AS is_current
FROM vers
WHERE kind <> 'DELETE'
""",
)
def scd2_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 history from the change log: the
    warehouse twin of last-wins MERGE (A14 keeps only the latest row;
    SCD2 keeps EVERY version with its validity interval). Each
    non-DELETE action opens a version at its seq; the key's next action
    closes it (DELETE closes without opening — the interval algebra
    falls out of one lead() pass). ONE shuffle on the key serves the
    whole derivation, and because versions only ever append, at 100 TB
    this runs incrementally: a new batch only (re)writes the affected
    keys' open intervals, the same touch-set as the merge itself.
    as-of queries over the result are `operators/asof.py` on
    valid_from_seq."""
    log = events_as_change_log(read_table(spark, sf_dir, "events"))
    w = Window.partitionBy("key").orderBy("seq")
    vers = log.select(
        "key",
        "seq",
        F.floor(F.col("value") * 1000).cast("bigint").alias("value_milli"),
        "kind",
        F.lead("seq").over(w).alias("next_seq"),
    )
    return vers.filter(F.col("kind") != "DELETE").select(
        "key",
        "value_milli",
        F.col("seq").alias("valid_from_seq"),
        F.col("next_seq").alias("valid_to_seq"),
        F.col("next_seq").isNull().alias("is_current"),
    )


# ------------------- point-in-time-correct feature join -------------------


@register(
    "pit_feature_join",
    oracle=f"""
WITH {CHANGE_LOG_CTE},
p AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS user_id, event_id AS at_seq
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       CASE WHEN c.kind IS NOT NULL AND c.kind <> 'DELETE'
            THEN CAST(floor(c.value * 1000) AS BIGINT) END AS feature_milli,
       c.kind IS NOT NULL AND c.kind <> 'DELETE' AS had_profile
FROM p ASOF LEFT JOIN change_log c
  ON p.user_id = c.key AND p.at_seq >= c.seq
""",
)
def pit_feature_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-correct feature join — the feature-store operation
    that prevents label leakage in training data: each observation
    (purchase) is enriched with the dimension value that was live AT the
    observation's position in the change stream, never a later one. The
    subtlety a naive as-of join misses: a DELETE closes the key's
    validity without opening a new version, so an observation after a
    DELETE has NO profile (NULL feature), even though an older version
    exists earlier in the log — the as-of match must carry the action
    KIND and null itself out on DELETE.

    Spark shape: operators/asof.py's union+window as-of join — ONE
    shuffle on the key, no inequality join, no per-version explosion.
    Composes the same change-log versions scd2_history materializes;
    at 100 TB the observation side streams through the single keyed
    exchange with the window sorted per key."""
    from .operators.asof import asof_join

    log = events_as_change_log(read_table(spark, sf_dir, "events")).select(
        F.col("key").alias("user_id"),
        "seq",
        "kind",
        F.floor(F.col("value") * 1000).cast("bigint").alias("value_milli"),
    )
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").alias("at_seq"),
    )
    joined = asof_join(
        purchases,
        log,
        by=["user_id"],
        left_on="at_seq",
        right_on="seq",
        payload_cols=["kind", "value_milli"],
    )
    live = F.col("r_kind").isNotNull() & (F.col("r_kind") != "DELETE")
    return joined.select(
        "event_id",
        "user_id",
        F.when(live, F.col("r_value_milli")).alias("feature_milli"),
        live.alias("had_profile"),
    )
