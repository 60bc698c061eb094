"""Batch/transaction shaping operators (A5 tx_assemble, A6 micro_batch,
A7 empty_tx_filter, A8 group_by_relation).

The reference assembles decoded WAL messages into transactions
(sync/stream/message_accumulator.go:42-202), groups transactions into
size/time-bounded micro-batches (sync/stream/stream.go:255-319), drops
empty transactions before the sink (stream.go:327-345), and partitions a
batch's actions by relation preserving intra-table order
(target/common/multirowaction/multi_row_action.go:36-63).

On Spark these are aggregations over the change-log DataFrame — all
hash-aggregations with map-side partial combine, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tx_assemble(change_log: DataFrame, lsn_col: str = "lsn") -> DataFrame:
    """Assemble actions into per-transaction summaries, keyed by commit LSN.

    The wire-protocol statefulness of the reference's Accumulator (open on
    Begin, emit on Commit) is a non-issue in the DataFrame model: grouping
    by ``lsn`` IS the assembly. Emits per-tx action counts, kind breakdown
    and seq bounds — the WalTransaction envelope (sync/db/db.go:116-122).
    """
    return (
        change_log.groupBy(F.col(lsn_col).alias("lsn"))
        .agg(
            F.count(F.lit(1)).alias("n_actions"),
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
            F.sum(F.when(F.col("kind") == "INSERT", 1).otherwise(0)).alias("n_insert"),
            F.sum(F.when(F.col("kind") == "UPDATE", 1).otherwise(0)).alias("n_update"),
            F.sum(F.when(F.col("kind") == "DELETE", 1).otherwise(0)).alias("n_delete"),
        )
    )


def empty_tx_filter(transactions: DataFrame) -> DataFrame:
    """Drop action-less transactions (keepalive-only) before the sink
    (stream.go:327-345). Their LSNs still advance the commit cursor — in
    Spark, offset progress on empty batches is the checkpoint's job."""
    return transactions.filter(F.col("n_actions") > 0)


def micro_batch_stats(
    change_log: DataFrame, batch_max_items: int = 25_000, lsn_col: str = "lsn"
) -> DataFrame:
    """Micro-batch accounting (A6): assign transactions to count-bounded
    batches (default 25,000 actions, reference config/config.go:49) and
    report per-batch totals.

    Spark's trigger model bounds batches by time/files, not exact row
    count; this operator exists to make the batching algebra testable —
    a cumulative-sum window over tx order, then a group-by batch id.
    """
    from pyspark.sql import Window

    txs = tx_assemble(change_log, lsn_col)
    w = Window.orderBy("lsn").rowsBetween(Window.unboundedPreceding, 0)
    # batch id = how many full batch_max_items multiples precede this tx
    with_cum = txs.withColumn("_cum_actions", F.sum("n_actions").over(w))
    batched = with_cum.withColumn(
        "batch_id", F.floor((F.col("_cum_actions") - 1) / F.lit(batch_max_items))
    )
    return (
        batched.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_transactions"),
            F.sum("n_actions").alias("n_actions"),
            F.min("lsn").alias("first_lsn"),
            F.max("lsn").alias("last_lsn"),
        )
    )


def group_by_relation(change_log: DataFrame) -> DataFrame:
    """Per-relation action accounting (A8): the reference's
    ``actionsByRelation`` partitions a batch by (schema, table) keeping
    intra-table order; the DataFrame equivalent is the groupBy itself —
    downstream operators order by ``seq`` where order matters."""
    return (
        change_log.groupBy("schema", "tbl")
        .agg(
            F.count(F.lit(1)).alias("n_actions"),
            F.countDistinct("lsn").alias("n_transactions"),
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
        )
    )


def offset_commit(change_log: DataFrame, lsn_col: str = "lsn") -> DataFrame:
    """A16: the committed-offset register. After a durable write the cursor
    advances to max(LSN)+1, strictly monotone (sync/lsn/lsn.go:32-45,
    stream.go:334-345). As a query: the batch's commit watermark."""
    return change_log.agg(
        (F.max(lsn_col) + 1).alias("committed_lsn"),
        F.max("seq").alias("committed_seq"),
        F.count(F.lit(1)).alias("acked_actions"),
    )
