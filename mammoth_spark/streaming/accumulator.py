"""Stateful transaction assembly (A5) for streams where transactions can
span micro-batches.

The reference's Accumulator folds decoded pgoutput messages into
transactions: BEGIN opens, DML appends, COMMIT emits; DML before BEGIN,
relation drift mid-tx, and missing identities are hard errors
(sync/stream/message_accumulator.go:42-202).

In the DataFrame model a *complete* batch assembles with a groupBy (see
operators/batch.py::tx_assemble). This module covers the genuinely
stateful case — a transaction whose BEGIN arrived in micro-batch N but
whose COMMIT arrives in N+k — with ``applyInPandasWithState`` keyed by
transaction id: state buffers actions until COMMIT, then the completed
transaction summary is emitted and the state dropped. Un-committed
transactions survive restarts via the checkpoint, exactly like the
reference's in-memory accumulator + LSN cursor (which replays from the
slot on restart).

Also provides ``validate_action_sequences`` — the batch-mode error check
for invalid per-key action pairs (multi_row_action.go:176-179).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("xid", T.LongType()),       # transaction id (group key)
        T.StructField("seq", T.LongType()),       # in-tx order
        T.StructField("msg_type", T.StringType()),  # BEGIN|INSERT|UPDATE|DELETE|COMMIT
        T.StructField("lsn", T.LongType()),       # commit LSN (on COMMIT)
        T.StructField("tbl", T.StringType()),
    ]
)

TX_SCHEMA = T.StructType(
    [
        T.StructField("xid", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("n_actions", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_seq", T.LongType()),
    ]
)

# state: action count + seq bounds + whether BEGIN seen
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_actions", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("began", T.BooleanType()),
    ]
)

_DML = {"INSERT", "UPDATE", "DELETE"}


def _assemble(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (xid,) = key
    if state.exists:
        n, first_seq, last_seq, began = state.get
    else:
        n, first_seq, last_seq, began = 0, None, None, False

    commit_lsn = None
    for pdf in pdfs:
        for row in pdf.sort_values("seq").itertuples(index=False):
            if row.msg_type == "BEGIN":
                began = True
            elif row.msg_type == "TRUNCATE":
                # the reference refuses truncate outright — it cannot be
                # expressed as keyed row changes (message_accumulator.go's
                # truncate branch); full re-sync is the recovery
                raise RuntimeError(f"tx {xid}: TRUNCATE is not replicable (re-sync required)")
            elif row.msg_type in _DML:
                if not began:
                    # message_accumulator.go: DML before BEGIN is a lost-
                    # message error; surface it through the query
                    raise RuntimeError(f"tx {xid}: DML before BEGIN (seq {row.seq})")
                n += 1
                first_seq = row.seq if first_seq is None else min(first_seq, row.seq)
                last_seq = row.seq if last_seq is None else max(last_seq, row.seq)
            elif row.msg_type == "COMMIT":
                commit_lsn = row.lsn

    if commit_lsn is not None:
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "xid": xid,
                    "lsn": commit_lsn,
                    "n_actions": n,
                    "first_seq": first_seq,
                    "last_seq": last_seq,
                }
            ]
        )
    else:
        state.update((n, first_seq, last_seq, began))


def assemble_transactions_stateful(messages: DataFrame) -> DataFrame:
    """Fold a message stream into completed transactions; incomplete
    transactions persist in checkpointed state across micro-batches."""
    return messages.groupBy("xid").applyInPandasWithState(
        _assemble,
        outputStructType=TX_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def validate_action_sequences(change_log: DataFrame, key_cols: list[str]) -> DataFrame:
    """Batch-mode invalid-pair detector: adjacent (by seq) actions per key
    matching (I,I), (U,I), (D,U) or (D,D) — the sequences the reference
    refuses to compact (multi_row_action.go:176-179). Empty == valid."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("seq")
    pairs = change_log.select(
        *key_cols,
        F.col("seq"),
        F.col("kind"),
        F.lag("kind").over(w).alias("prev_kind"),
    )
    invalid = (
        ((F.col("prev_kind") == "INSERT") & (F.col("kind") == "INSERT"))
        | ((F.col("prev_kind") == "UPDATE") & (F.col("kind") == "INSERT"))
        | ((F.col("prev_kind") == "DELETE") & (F.col("kind") == "UPDATE"))
        | ((F.col("prev_kind") == "DELETE") & (F.col("kind") == "DELETE"))
    )
    return pairs.filter(invalid)
