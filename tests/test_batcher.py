"""Exact count-bounded batch close (streaming/accumulator.py:
TransactionBatcher) — the reference's batcher rule (stream.go:275-315):
complete transactions accumulate, the batch closes the moment actions
reach batchMaxItems, a transaction is never split, the timer/end-of-
stream flushes the remainder. Rounds 1-5 approximated this with
trigger+rate caps; these tests pin the exact rule and that the staged
batch boundaries reach Structured Streaming micro-batches 1:1.
"""

import pytest

from mammoth_spark.sources.pgoutput import decode_to_change_messages
from mammoth_spark.streaming.accumulator import (
    CHANGE_MESSAGE_SCHEMA,
    TransactionBatcher,
    batches_from_change_messages,
    stage_batches,
)

from test_pgoutput import enc_begin, enc_commit, enc_insert, enc_relation


def _txn(xid, n_actions):
    rows = [{"msg_type": "BEGIN", "xid": xid}]
    rows += [{"msg_type": "INSERT", "xid": xid, "i": i} for i in range(n_actions)]
    rows += [{"msg_type": "COMMIT", "xid": xid}]
    return rows


def test_batch_closes_at_bound_transaction_aligned():
    b = TransactionBatcher(batch_max_items=15)
    assert b.add(_txn(1, 10)) is None  # 10 < 15: stays open
    closed = b.add(_txn(2, 10))  # 20 >= 15: closes NOW, txn 2 intact
    assert closed is not None
    xids = {r["xid"] for r in closed}
    assert xids == {1, 2}  # never split: both whole transactions in one batch
    assert sum(1 for r in closed if r["msg_type"] == "INSERT") == 20
    assert b.flush() is None  # nothing pending
    assert b.add(_txn(3, 10)) is None
    tail = b.flush()  # the expire/end-of-stream path
    assert {r["xid"] for r in tail} == {3}


def test_exact_bound_and_framing_rows_dont_count():
    b = TransactionBatcher(batch_max_items=10)
    closed = b.add(_txn(1, 10))  # exactly the bound: closes
    assert closed is not None
    # BEGIN/COMMIT are framing, not actions: 9 actions stay open even
    # though the row count is 11
    assert b.add(_txn(2, 9)) is None
    assert {r["xid"] for r in b.flush()} == {2}


def test_bad_bound_rejected():
    with pytest.raises(ValueError):
        TransactionBatcher(batch_max_items=0)


def _capture_payloads(n_txns, actions_per_txn):
    payloads = [enc_relation(1000, "s", "docs", [(1, "id"), (0, "a")])]
    key = 0
    for x in range(n_txns):
        payloads.append(enc_begin(10 * x, 0, x + 1))
        for _ in range(actions_per_txn):
            payloads.append(enc_insert(1000, [str(key), "v"]))
            key += 1
        payloads.append(enc_commit(10 * x, 10 * x + 1, 0))
    return payloads


def test_batches_from_decoded_stream():
    rows = list(decode_to_change_messages(_capture_payloads(5, 6)))
    batches = list(batches_from_change_messages(rows, batch_max_items=10))
    # 6 actions/txn, bound 10: txns (1,2) close at 12, (3,4) at 12, 5 flushes
    assert len(batches) == 3
    acts = [sum(1 for r in b if r["msg_type"] == "INSERT") for b in batches]
    assert acts == [12, 12, 6]
    # nothing lost, order preserved
    flat = [r for b in batches for r in b]
    assert flat == rows


def test_staged_batches_are_microbatch_boundaries(spark, tmp_path):
    """stage_batches + maxFilesPerTrigger=1: each count-bounded batch IS
    one Structured Streaming micro-batch — the exact boundary reaches
    foreachBatch (where the TxnCatalog epoch commit runs), not an
    approximation of it."""
    rows = list(decode_to_change_messages(_capture_payloads(5, 6)))
    batches = list(batches_from_change_messages(rows, batch_max_items=10))
    src = str(tmp_path / "staged")
    assert stage_batches(batches, src) == 3

    seen = []
    stream = (
        spark.readStream.schema(CHANGE_MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.writeStream.foreachBatch(lambda df, eid: seen.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # per-epoch row counts == staged batch sizes (framing rows included)
    assert seen == [len(b) for b in batches]
