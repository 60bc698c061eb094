"""The COMPLETE reference sync loop, socket to table state:

    TCP walsender replay -> SocketReplicationClient (acks per epoch)
    -> pgoutput decode -> count-bounded transaction batcher
    -> staged files (micro-batch boundaries 1:1)
    -> ChangeLogPipeline foreachBatch: compact -> MERGE
    -> TxnCatalog: ONE cross-table commit per micro-batch

This is the reference's eventSource -> eventBatcher -> eventSink
pipeline (sync/stream/stream.go:354-381) with every round-5 gap closed:
live wire transport (was file-staged), exact 25k-rule batch close (was
trigger-approximated), atomic cross-table apply (was per-table
compensated). One PG transaction in the capture touches BOTH tables;
the final assertion shows it landed atomically in one catalog epoch.
"""

from mammoth_spark.sources import ParquetMergeTarget
from mammoth_spark.sources.pgoutput import XLogData, decode_to_change_messages, encode_xlog_data
from mammoth_spark.sources.target import TxnCatalog
from mammoth_spark.sources.wire import ReplayServer, SocketReplicationClient
from mammoth_spark.streaming.accumulator import batches_from_plain_rows, stage_batches
from mammoth_spark.streaming.pipeline import (
    ChangeLogPipeline,
    plain_rows_from_change_messages,
)

from test_pgoutput import enc_begin, enc_commit, enc_delete, enc_insert, enc_relation, enc_update


def _capture():
    """Four transactions over two tables; txn 2 spans BOTH tables."""
    p = [
        enc_relation(1000, "public", "users", [(1, "id"), (0, "name")]),
        enc_relation(2000, "public", "albums", [(1, "id"), (0, "title")]),
        # txn 1: users only
        enc_begin(100, 0, 1),
        enc_insert(1000, ["1", "Taylor Swift"]),
        enc_insert(1000, ["2", "Van Morrison"]),
        enc_commit(100, 101, 0),
        # txn 2: CROSS-TABLE — one PG transaction touching users+albums
        enc_begin(200, 0, 2),
        enc_update(1000, ["2", "Van The Man"]),
        enc_insert(2000, ["a", "Astral Weeks"]),
        enc_insert(2000, ["b", "Moondance"]),
        enc_commit(200, 201, 0),
        # txn 3: delete on users
        enc_begin(300, 0, 3),
        enc_delete(1000, ["1"]),
        enc_commit(300, 301, 0),
        # txn 4: albums only
        enc_begin(400, 0, 4),
        enc_update(2000, ["b", "His Band and the Street Choir"]),
        enc_commit(400, 401, 0),
    ]
    return p


def test_full_sync_loop_socket_to_catalog(spark, tmp_path):
    payloads = _capture()
    frames = [encode_xlog_data(XLogData(5, 401, 0, p)) for p in payloads]
    server = ReplayServer(frames, keepalive_every=6)

    # stage 1: wire pump (acks flow back per committed epoch)
    client = SocketReplicationClient("127.0.0.1", server.port, "slot_e2e")
    wire_payloads = [v for k, v in client.stream() if k == "payload"]
    client.close()
    server.close()
    assert wire_payloads == payloads
    assert all(a <= b for a, b in zip(server.acks, server.acks[1:]))
    assert server.acks[-1] == 402  # last commit end_lsn + 1

    # stage 2: decode -> exact count-bounded, txn-aligned batches.
    # bound=3 actions: txn1(2)+txn2(3)=5 closes batch 1; txn3(1)+txn4(1)
    # flush as batch 2. The cross-table txn 2 stays whole.
    msgs = list(decode_to_change_messages(wire_payloads))
    plain = list(plain_rows_from_change_messages(msgs, ["name", "title"]))
    batches = list(batches_from_plain_rows(plain, batch_max_items=3))
    src = str(tmp_path / "staged")
    assert stage_batches(batches, src) == 2

    # stage 3: streaming apply, one atomic cross-table commit per batch
    targets = {
        "users": ParquetMergeTarget(spark, str(tmp_path / "users"), ["id"], ["name", "title"]),
        "albums": ParquetMergeTarget(spark, str(tmp_path / "albums"), ["id"], ["name", "title"]),
    }
    cat = TxnCatalog(spark, str(tmp_path / "catalog"), targets)
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField("id", T.StringType())]
            + [T.StructField(c, T.StringType()) for c in ("name", "title")]
        ),
    )
    cat.initialize({"users": empty, "albums": empty})
    pipeline = ChangeLogPipeline(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        targets=targets,
        value_cols=["name", "title"],
        max_files_per_trigger=1,  # micro-batch == count-bounded batch
        txn_catalog=cat,
    )
    pipeline.run_available()

    assert pipeline.batches_applied == 2
    users = {r["id"]: r["name"] for r in cat.read("users").collect()}
    albums = {r["id"]: r["title"] for r in cat.read("albums").collect()}
    assert users == {"2": "Van The Man"}  # 1 inserted then deleted; 2 updated
    assert albums == {"a": "Astral Weeks", "b": "His Band and the Street Choir"}
    # both micro-batches committed through the catalog: epoch advanced to 1
    # and both tables' versions moved in lockstep
    m = cat.manifest()
    assert m["epoch"] == 1
    assert m["versions"]["users"] == m["versions"]["albums"] == 3  # init + 2 epochs
    # replay the whole stream: checkpoint + epoch record make it a no-op
    pipeline.run_available()
    assert cat.manifest() == m


def test_full_sync_loop_tls_scram_to_catalog(spark, tmp_path):
    """Round 9: the SAME complete loop through the hardened front door —
    SSLRequest -> TLS tunnel -> SCRAM-SHA-256-PLUS (certificate-bound)
    -> slot negotiation -> copy-both -> decode -> exact txn-aligned
    batches -> one atomic cross-table catalog commit per micro-batch.
    Everything the reference's conninfo gives it (TLS + auth) now wraps
    the full pipeline, with byte-identical results to the plaintext
    path and acks flowing back through the tunnel into the slot."""
    import pyspark.sql.types as T

    from mammoth_spark.sources.libpq import (
        SCRAM_PLUS_MECHANISM,
        ReplicationSession,
        WalsenderReplayServer,
        negotiate_start,
    )

    from test_libpq_tls import mint_tls_pair

    cert, key = mint_tls_pair(tmp_path)
    payloads = _capture()
    frames = [encode_xlog_data(XLogData(5, 401, 0, p)) for p in payloads]
    server = WalsenderReplayServer(
        password="pipeline-pw", tls_certfile=cert, tls_keyfile=key,
        require_tls=True, keepalive_every=6,
    )

    s = ReplicationSession(
        "127.0.0.1", server.port, password="pipeline-pw", sslmode="require"
    )
    assert s.tls_established
    start, snapshot = negotiate_start(s, "slot_tls_e2e")
    assert snapshot is not None  # fresh slot: backfill bracket
    server.add_frames(frames)
    pump = s.start_replication("slot_tls_e2e", start)
    wire_payloads = [v for k, v in pump.stream() if k == "payload"]
    s.finish_copy()
    s.close()
    assert wire_payloads == payloads  # byte-identical through the tunnel
    assert server.auth_log[0][0] == SCRAM_PLUS_MECHANISM
    assert server.slots["slot_tls_e2e"].restart_lsn == 402  # acks landed
    server.close()

    msgs = list(decode_to_change_messages(wire_payloads))
    plain = list(plain_rows_from_change_messages(msgs, ["name", "title"]))
    batches = list(batches_from_plain_rows(plain, batch_max_items=3))
    src = str(tmp_path / "staged")
    assert stage_batches(batches, src) == 2

    targets = {
        "users": ParquetMergeTarget(spark, str(tmp_path / "users"), ["id"], ["name", "title"]),
        "albums": ParquetMergeTarget(spark, str(tmp_path / "albums"), ["id"], ["name", "title"]),
    }
    cat = TxnCatalog(spark, str(tmp_path / "catalog"), targets)
    empty = spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField("id", T.StringType())]
            + [T.StructField(c, T.StringType()) for c in ("name", "title")]
        ),
    )
    cat.initialize({"users": empty, "albums": empty})
    pipeline = ChangeLogPipeline(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        targets=targets,
        value_cols=["name", "title"],
        max_files_per_trigger=1,
        txn_catalog=cat,
    )
    pipeline.run_available()
    assert pipeline.batches_applied == 2
    users = {r["id"]: r["name"] for r in cat.read("users").collect()}
    albums = {r["id"]: r["title"] for r in cat.read("albums").collect()}
    assert users == {"2": "Van The Man"}
    assert albums == {"a": "Astral Weeks", "b": "His Band and the Street Choir"}
    assert cat.manifest()["epoch"] == 1


def test_full_sync_loop_toast_unchanged_wire(spark, tmp_path):
    """TOAST-unchanged columns over the REAL wire (closes the last
    undisclosed tri-state gap): the pgoutput decoder already preserves
    the 'u' TupleData kind as is_unchanged cells — this pins that the
    adapter's flagged mode carries them into ChangeLogPipeline(flagged)
    intact, and that BOTH storage strategies inherit: the COW MERGE
    CASE and the flagged-MOR read-time resolution converge on the same
    state from the same staged batches. The plain (non-flagged) adapter
    would have collapsed the unchanged bio to SQL NULL — the exact
    clobber the flagged path exists to prevent."""
    import pyspark.sql.types as T

    from mammoth_spark.sources.target import ParquetMorTarget

    payloads = [
        enc_relation(1000, "public", "users", [(1, "id"), (0, "name"), (0, "bio")]),
        enc_begin(100, 0, 1),
        enc_insert(1000, ["1", "Taylor", "long-bio-1"]),
        enc_insert(1000, ["2", "Van", "long-bio-2"]),
        enc_commit(100, 101, 0),
        # txn 2: rename user 1, bio TOAST-unchanged (the 'u' kind)
        enc_begin(200, 0, 2),
        enc_update(1000, ["1", "Taylor Swift", ...]),
        enc_commit(200, 201, 0),
        # txn 3: user 1 name unchanged + bio explicit NULL (tri-state,
        # not 2-state); user 2 renamed with bio still unchanged
        enc_begin(300, 0, 3),
        enc_update(1000, ["1", ..., None]),
        enc_update(1000, ["2", "Van Morrison", ...]),
        enc_commit(300, 301, 0),
    ]
    frames = [encode_xlog_data(XLogData(5, 301, 0, p)) for p in payloads]
    server = ReplayServer(frames)
    client = SocketReplicationClient("127.0.0.1", server.port, "slot_toast")
    wire_payloads = [v for k, v in client.stream() if k == "payload"]
    client.close()
    server.close()

    msgs = list(decode_to_change_messages(wire_payloads))
    plain = list(
        plain_rows_from_change_messages(msgs, ["name", "bio"], flagged=True)
    )
    # the wire preserved the tri-state end to end: txn 2's update (the
    # first UPDATE row) carries bio as the unchanged marker, not NULL
    upd1 = next(r for r in plain if r["kind"] == "UPDATE")
    assert upd1["bio"] == {"v": None, "is_null": False, "is_unchanged": True}
    batches = list(batches_from_plain_rows(plain, batch_max_items=2))
    assert len(batches) == 2  # txn1 closes batch 1; txn2+txn3 close batch 2

    expected = {"1": ("Taylor Swift", None), "2": ("Van Morrison", "long-bio-2")}
    empty = spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField(c, T.StringType()) for c in ("id", "name", "bio")]
        ),
    )
    for flavor in ("cow", "mor"):
        src = str(tmp_path / flavor / "staged")
        stage_batches(batches, src)
        if flavor == "cow":
            target = ParquetMergeTarget(
                spark, str(tmp_path / flavor / "tgt"), ["id"], ["name", "bio"]
            )
        else:
            target = ParquetMorTarget(
                spark, str(tmp_path / flavor / "tgt"), ["id"], ["name", "bio"],
                flagged=True,
            )
        target.initialize(empty)
        ChangeLogPipeline(
            spark,
            source_dir=src,
            checkpoint_dir=str(tmp_path / flavor / "ckpt"),
            targets={"users": target},
            value_cols=["name", "bio"],
            max_files_per_trigger=1,
            flagged=True,
        ).run_available()
        state = {r["id"]: (r["name"], r["bio"]) for r in target.read().collect()}
        assert state == expected, (flavor, state)
