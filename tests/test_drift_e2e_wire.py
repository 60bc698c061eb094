"""Wire-fed schema drift, end to end (VERDICT r06 "Next round" #3):

    libpq session -> slot -> copy-both pump -> pgoutput decode
    (Relation messages feed relation_columns LIVE) -> staged batches
    -> ChangeLogPipeline -> RelationChangedError raised from the
    foreachBatch drift check -> supervisor: drop slot + delete
    checkpoint + fresh snapshot backfill + new slot -> convergence.

The drift signal originates in an actual changed Relation message ON
THE SOCKET — not a synthetic rel_cols injection: the replay walsender
emits `Relation(users: id,name)` for the first two transactions, then
`Relation(users: id,name,email)` mid-stream; the lazily-chained decode
adapter flips the advertised columns on exactly the rows that follow,
and the pipeline aborts when they disagree with its declared schema
(reference message_accumulator.go:118-122 + supervisor.go:73-76 +
sync_service.go:111-125: drop slot, resync from a fresh snapshot).
"""

import shutil

from mammoth_spark.sources import ParquetMergeTarget
from mammoth_spark.sources.libpq import (
    ReplicationSession,
    WalsenderReplayServer,
    negotiate_start,
)
from mammoth_spark.sources.pgoutput import (
    XLogData,
    decode_to_change_messages,
    encode_xlog_data,
)
from mammoth_spark.streaming.accumulator import batches_from_plain_rows, stage_batches
from mammoth_spark.streaming.pipeline import (
    ChangeLogPipeline,
    plain_rows_from_change_messages,
    run_with_restart,
)

from test_pgoutput import enc_begin, enc_commit, enc_insert, enc_relation, enc_update


def _phase_a():
    """Old schema (id, name) for two txns, then the relation GROWS a
    column mid-stream and txn 3 writes through the new shape."""
    p = [
        enc_relation(1000, "public", "users", [(1, "id"), (0, "name")]),
        enc_begin(100, 0, 1),
        enc_insert(1000, ["1", "Alice"]),
        enc_insert(1000, ["2", "Bob"]),
        enc_commit(100, 101, 0),
        enc_begin(200, 0, 2),
        enc_update(1000, ["2", "Bobby"]),
        enc_commit(200, 201, 0),
        # ALTER TABLE users ADD COLUMN email — pgoutput re-sends Relation
        enc_relation(1000, "public", "users", [(1, "id"), (0, "name"), (0, "email")]),
        enc_begin(300, 0, 3),
        enc_insert(1000, ["3", "Carol", "c@x"]),
        enc_commit(300, 301, 0),
    ]
    return [encode_xlog_data(XLogData(5, 301, 0, x)) for x in p]


def _phase_b():
    """WAL generated after the resync: new schema throughout."""
    p = [
        enc_relation(1000, "public", "users", [(1, "id"), (0, "name"), (0, "email")]),
        enc_begin(400, 0, 4),
        enc_update(1000, ["3", "Caroline", "c2@x"]),
        enc_insert(1000, ["4", "Dan", "d@x"]),
        enc_commit(400, 401, 0),
    ]
    return [encode_xlog_data(XLogData(5, 401, 0, x)) for x in p]


def test_wire_fed_drift_supervisor_resync(spark, tmp_path):
    server = WalsenderReplayServer()

    # ---- initial sync: slot + empty snapshot, then phase-A WAL arrives
    state = {
        "value_cols": ["name"],
        "src": str(tmp_path / "src_a"),
        "ckpt": str(tmp_path / "ckpt_a"),
        "epoch": "a",
    }

    def make_target():
        t = ParquetMergeTarget(
            spark,
            str(tmp_path / f"users_{state['epoch']}"),
            ["id"],
            state["value_cols"],
        )
        return t

    import pyspark.sql.types as T

    def empty_df(cols):
        return spark.createDataFrame(
            [], T.StructType([T.StructField(c, T.StringType()) for c in ["id", *cols]])
        )

    target = make_target()
    s0 = ReplicationSession("127.0.0.1", server.port)
    start, snapshot = negotiate_start(s0, "slot_drift")
    assert snapshot is not None  # fresh slot: snapshot brackets the backfill
    target.initialize(empty_df(state["value_cols"]))  # snapshot is empty here
    server.add_frames(_phase_a())
    pump = s0.start_replication("slot_drift", start)
    relation_columns: dict[str, list[str]] = {}
    msgs = decode_to_change_messages(
        (v for k, v in pump.stream() if k == "payload"),
        relation_columns=relation_columns,
    )
    plain = list(
        plain_rows_from_change_messages(msgs, ["name"], relation_columns)
    )
    s0.finish_copy()
    s0.close()
    # the wire delivered BOTH relation shapes; rows after the change
    # advertise the grown column list
    assert plain[0]["rel_cols"] == ["name"]
    assert plain[-1]["rel_cols"] == ["name", "email"]
    stage_batches(list(batches_from_plain_rows(plain, batch_max_items=3)), state["src"])

    # ---- supervisor loop: drift aborts the stream, backfill resyncs
    targets_holder = {"users": target}

    def make_pipeline():
        return ChangeLogPipeline(
            spark,
            source_dir=state["src"],
            checkpoint_dir=state["ckpt"],
            targets=targets_holder,
            value_cols=state["value_cols"],
            max_files_per_trigger=1,
        )

    def backfill():
        """The reference's resync (sync_service.go:111-125): drop the
        slot, take a FRESH snapshot of the current upstream state, start
        a new slot, re-point the pipeline at a new checkpoint+schema."""
        s = ReplicationSession("127.0.0.1", server.port)
        s.drop_slot("slot_drift")
        state.update(
            value_cols=["name", "email"],
            src=str(tmp_path / "src_b"),
            ckpt=str(tmp_path / "ckpt_b"),
            epoch="b",
        )
        shutil.rmtree(str(tmp_path / "ckpt_a"))  # checkpoint delete
        # recreate the slot FIRST — its consistent point brackets the
        # snapshot; WAL generated after it (phase B) streams, everything
        # before it arrives via the snapshot
        start, snap_name = negotiate_start(s, "slot_drift")
        assert snap_name is not None
        # fresh snapshot = the upstream table as of NOW (after txn 3)
        snap = spark.createDataFrame(
            [("1", "Alice", None), ("2", "Bobby", None), ("3", "Carol", "c@x")],
            ["id", "name", "email"],
        )
        new_target = make_target()
        new_target.initialize(snap)
        targets_holder["users"] = new_target
        server.add_frames(_phase_b())
        pump = s.start_replication("slot_drift", start)
        relation_columns: dict[str, list[str]] = {}
        msgs = decode_to_change_messages(
            (v for k, v in pump.stream() if k == "payload"),
            relation_columns=relation_columns,
        )
        plain_b = list(
            plain_rows_from_change_messages(msgs, state["value_cols"], relation_columns)
        )
        s.finish_copy()
        s.close()
        stage_batches(
            list(batches_from_plain_rows(plain_b, batch_max_items=3)), state["src"]
        )

    restarts = run_with_restart(make_pipeline, backfill)
    assert restarts == 1  # exactly one drift-triggered resync

    # ---- convergence: snapshot state + phase-B stream, new schema
    final = {
        r["id"]: (r["name"], r["email"])
        for r in targets_holder["users"].read().collect()
    }
    assert final == {
        "1": ("Alice", None),
        "2": ("Bobby", None),
        "3": ("Caroline", "c2@x"),
        "4": ("Dan", "d@x"),
    }
    # slot bookkeeping: the drift slot was dropped and recreated; the
    # new one's restart_lsn reflects phase-B acks only
    assert server.slots["slot_drift"].restart_lsn == 402
    server.close()
