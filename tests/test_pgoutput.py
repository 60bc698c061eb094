"""Golden tests for the pgoutput binary decoder (A4 wire level).

The encoder here is test-only and follows the public PostgreSQL
"Logical Replication Message Formats" docs; scenarios mirror the
reference's accumulator tests
(/root/reference/sync/stream/message_accumulator_test.go:34-320).
"""

import json
import struct

import pytest

from mammoth_spark.sources.pgoutput import (
    Begin,
    Commit,
    Delete,
    Insert,
    Origin,
    PgOutputError,
    Relation,
    Truncate,
    TypeMessage,
    Update,
    decode_to_change_messages,
    parse_message,
)

TEXT_OID = 25


def _cstr(s):
    return s.encode() + b"\x00"


def _tuple(cells):
    out = struct.pack(">h", len(cells))
    for c in cells:
        if c is None:
            out += b"n"
        elif c == ...:
            out += b"u"  # unchanged TOAST
        else:
            raw = c.encode()
            out += b"t" + struct.pack(">i", len(raw)) + raw
    return out


def enc_begin(lsn, ts, xid):
    return b"B" + struct.pack(">qqi", lsn, ts, xid)


def enc_commit(lsn, end_lsn, ts, flags=0):
    return b"C" + struct.pack(">bqqq", flags, lsn, end_lsn, ts)


def enc_relation(oid, ns, name, cols, replica_identity=1):
    out = b"R" + struct.pack(">i", oid) + _cstr(ns) + _cstr(name)
    out += struct.pack(">b", replica_identity) + struct.pack(">h", len(cols))
    for flags, cname in cols:
        out += struct.pack(">b", flags) + _cstr(cname) + struct.pack(">ii", TEXT_OID, -1)
    return out


def enc_insert(oid, cells):
    return b"I" + struct.pack(">i", oid) + b"N" + _tuple(cells)


def enc_update(oid, new_cells, old_cells=None, old_kind=b"K"):
    out = b"U" + struct.pack(">i", oid)
    if old_cells is not None:
        out += old_kind + _tuple(old_cells)
    return out + b"N" + _tuple(new_cells)


def enc_delete(oid, old_cells, old_kind=b"K"):
    return b"D" + struct.pack(">i", oid) + old_kind + _tuple(old_cells)


def enc_truncate(oids, options=0):
    return b"T" + struct.pack(">ib", len(oids), options) + b"".join(
        struct.pack(">i", o) for o in oids
    )


def test_parse_begin_golden_bytes():
    # hand-pinned golden frame, not produced by the test encoder
    msg = parse_message(bytes.fromhex("42000000000000000a000000000000000000000b85"))
    assert msg == Begin(final_lsn=10, commit_ts=0, xid=2949)


def test_parse_each_message_type():
    rel = parse_message(
        enc_relation(1000, "schema_a", "table_1", [(1, "fruit"), (0, "plant")])
    )
    assert isinstance(rel, Relation)
    assert rel.oid == 1000 and rel.namespace == "schema_a" and rel.name == "table_1"
    assert [c.name for c in rel.columns] == ["fruit", "plant"]
    assert rel.columns[0].is_key and not rel.columns[1].is_key

    assert parse_message(enc_begin(10, 123, 7)) == Begin(10, 123, 7)
    assert parse_message(enc_commit(10, 11, 123)) == Commit(0, 10, 11, 123)
    assert parse_message(b"O" + struct.pack(">q", 5) + _cstr("origin1")) == Origin(5, "origin1")
    assert parse_message(b"Y" + struct.pack(">i", 600) + _cstr("public") + _cstr("citext")) == (
        TypeMessage(600, "public", "citext")
    )

    ins = parse_message(enc_insert(1000, ["apple", "tree"]))
    assert isinstance(ins, Insert)
    assert [c.v for c in ins.new] == ["apple", "tree"]

    upd = parse_message(enc_update(1000, ["apple", ...], old_cells=["apple", None]))
    assert isinstance(upd, Update)
    assert upd.old_kind == "K" and upd.old[1].is_null
    assert upd.new[1].is_unchanged and not upd.new[1].is_null

    dele = parse_message(enc_delete(1000, ["apple", None]))
    assert isinstance(dele, Delete)
    assert dele.old_kind == "K" and dele.old[0].v == "apple"

    tr = parse_message(enc_truncate([1000, 1001], options=1))
    assert tr == Truncate(1, [1000, 1001])


def test_parse_errors():
    with pytest.raises(PgOutputError, match="empty"):
        parse_message(b"")
    with pytest.raises(PgOutputError, match="unknown message tag"):
        parse_message(b"Z123")
    with pytest.raises(PgOutputError, match="truncated"):
        parse_message(enc_begin(10, 123, 7)[:-2])
    with pytest.raises(PgOutputError, match="trailing"):
        parse_message(enc_begin(10, 123, 7) + b"xx")
    with pytest.raises(PgOutputError, match="unterminated"):
        parse_message(b"O" + struct.pack(">q", 5) + b"no-null-terminator")
    with pytest.raises(PgOutputError, match="marker"):
        parse_message(b"I" + struct.pack(">i", 1) + b"N" + struct.pack(">h", 1) + b"x")


def test_decode_successful_insert_scenario():
    # mirrors message_accumulator_test.go "successful insert": Begin,
    # Relation (fruit=key, plant=value), two inserts, Commit
    frames = [
        enc_begin(10, 0, 42),
        enc_relation(1000, "schema_a", "table_1", [(1, "fruit"), (0, "plant")]),
        enc_insert(1000, ["apple", "tree"]),
        enc_insert(1000, ["strawberry", "bush"]),
        enc_commit(10, 11, 0),
    ]
    rows = list(decode_to_change_messages(frames))
    assert [r["msg_type"] for r in rows] == ["BEGIN", "INSERT", "INSERT", "COMMIT"]
    assert all(r["xid"] == 42 for r in rows[:3])
    assert [r["seq"] for r in rows] == [1, 2, 3, 4]
    ins = rows[1]
    assert ins["tbl"] == "table_1"
    assert ins["key_before"] == ["apple"] and ins["key_after"] == ["apple"]
    assert json.loads(ins["new_values"]) == {
        "plant": {"v": "tree", "is_null": False, "is_unchanged": False}
    }
    assert rows[3]["lsn"] == 10


def test_decode_update_identity_and_toast():
    frames = [
        enc_begin(20, 0, 43),
        enc_relation(1000, "s", "t", [(1, "id"), (0, "payload")]),
        # identity change 'a'->'b', payload unchanged TOAST
        enc_update(1000, ["b", ...], old_cells=["a", None], old_kind=b"K"),
        enc_delete(1000, ["b", None]),
        enc_commit(20, 21, 0),
    ]
    rows = list(decode_to_change_messages(frames))
    upd, dele = rows[1], rows[2]
    assert upd["key_before"] == ["a"] and upd["key_after"] == ["b"]
    assert json.loads(upd["new_values"])["payload"]["is_unchanged"] is True
    assert dele["msg_type"] == "DELETE" and dele["key_before"] == ["b"]
    assert dele["new_values"] is None


def test_decode_truncate_surfaces_for_resync():
    frames = [
        enc_begin(30, 0, 44),
        enc_relation(1000, "s", "t", [(1, "id")]),
        enc_truncate([1000]),
        enc_commit(30, 31, 0),
    ]
    rows = list(decode_to_change_messages(frames))
    assert rows[1]["msg_type"] == "TRUNCATE" and rows[1]["tbl"] == "t"


def test_decoded_stream_assembles_end_to_end(spark, tmp_path):
    """Wire bytes -> decode -> stateful assembly: the full A4->A5 seam.
    The assembled transaction must carry the folded net change with the
    TOAST cell intact."""
    import os

    from mammoth_spark.streaming.accumulator import (
        CHANGE_MESSAGE_SCHEMA,
        assemble_changes_stateful,
    )

    frames = [
        enc_begin(10, 0, 42),
        enc_relation(1000, "s", "docs", [(1, "id"), (0, "a"), (0, "big")]),
        enc_insert(1000, ["7", "x", "blob0"]),
        enc_update(1000, ["7", "y", ...]),  # big is TOAST-unchanged
        enc_commit(10, 11, 0),
    ]
    rows = list(decode_to_change_messages(frames))
    src = tmp_path / "wire"
    src.mkdir()
    with open(src / "b.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(CHANGE_MESSAGE_SCHEMA).json(str(src))
    q = (
        assemble_changes_stateful(stream)
        .writeStream.format("memory")
        .queryName("wire_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("wire_e2e").collect()
    assert len(out) == 1
    row = out[0]
    # (I,U) folds to INSERT with merged values; 'big' inherits the
    # insert's materialized value (multi_row_action.go:121-127)
    assert row["kind"] == "INSERT" and row["key_after"] == ["7"]
    vals = json.loads(row["new_values"])
    assert vals["a"]["v"] == "y"
    assert vals["big"]["v"] == "blob0" and not vals["big"]["is_unchanged"]


# ------------------- copy-data framing (stream.go:87-201) -------------------

from mammoth_spark.sources.pgoutput import (  # noqa: E402
    PG_EPOCH_OFFSET_US,
    PrimaryKeepalive,
    XLogData,
    encode_primary_keepalive,
    encode_standby_status_update,
    encode_xlog_data,
    frame_stream,
    parse_copy_data,
    pg_time_to_unix_us,
    unix_us_to_pg_time,
)


def test_parse_xlog_data_golden_bytes():
    # 'w' wal_start=10 server_wal_end=11 server_time=0 + pinned Begin payload
    frame = bytes.fromhex(
        "77"
        "000000000000000a"
        "000000000000000b"
        "0000000000000000"
        "42000000000000000a000000000000000000000b85"
    )
    msg = parse_copy_data(frame)
    assert msg == XLogData(
        wal_start=10,
        server_wal_end=11,
        server_time_us=0,
        payload=bytes.fromhex("42000000000000000a000000000000000000000b85"),
    )
    assert parse_message(msg.payload) == Begin(final_lsn=10, commit_ts=0, xid=2949)
    assert encode_xlog_data(msg) == frame


def test_parse_keepalive_golden_bytes():
    # 'k' server_wal_end=16 server_time=1 reply_requested=1
    frame = bytes.fromhex("6b" "0000000000000010" "0000000000000001" "01")
    msg = parse_copy_data(frame)
    assert msg == PrimaryKeepalive(server_wal_end=16, server_time_us=1, reply_requested=True)
    assert encode_primary_keepalive(msg) == frame
    quiet = parse_copy_data(bytes.fromhex("6b" "0000000000000010" "0000000000000001" "00"))
    assert quiet.reply_requested is False


def test_standby_status_update_golden_bytes():
    # 'r' write=11 flush=11 apply=11 client_time=5 reply=0 — flush/apply
    # default to the write position, like pglogrepl.SendStandbyStatusUpdate
    # called with only WALWritePosition (stream.go:112-129)
    assert encode_standby_status_update(11, client_time_us=5) == bytes.fromhex(
        "72"
        "000000000000000b"
        "000000000000000b"
        "000000000000000b"
        "0000000000000005"
        "00"
    )
    explicit = encode_standby_status_update(
        11, wal_flush=9, wal_apply=8, client_time_us=5, reply_requested=True
    )
    assert explicit == bytes.fromhex(
        "72"
        "000000000000000b"
        "0000000000000009"
        "0000000000000008"
        "0000000000000005"
        "01"
    )


def test_pg_epoch_conversion():
    assert pg_time_to_unix_us(0) == PG_EPOCH_OFFSET_US  # 2000-01-01T00:00:00Z
    assert unix_us_to_pg_time(pg_time_to_unix_us(123456)) == 123456


def test_parse_copy_data_errors():
    with pytest.raises(PgOutputError):
        parse_copy_data(b"")
    with pytest.raises(PgOutputError):
        parse_copy_data(b"q" + b"\x00" * 17)  # unknown tag
    with pytest.raises(PgOutputError):  # keepalive with trailing junk
        parse_copy_data(b"k" + b"\x00" * 17 + b"\x00")
    with pytest.raises(PgOutputError):  # XLogData with no payload
        parse_copy_data(b"w" + b"\x00" * 24)


def test_frame_stream_keepalive_semantics():
    """Keepalives yield an empty transaction at ServerWALEnd (the cursor
    must advance past unpublished-table churn, stream.go:189-201) and an
    immediate ack at the committed LSN when a reply is requested."""
    committed = {"lsn": 42}
    frames = [
        encode_xlog_data(XLogData(10, 11, 0, enc_begin(10, 0, 1))),
        encode_primary_keepalive(PrimaryKeepalive(99, 0, reply_requested=False)),
        encode_primary_keepalive(PrimaryKeepalive(120, 0, reply_requested=True)),
    ]
    events = list(frame_stream(frames, lambda: committed["lsn"]))
    kinds = [k for k, _ in events]
    assert kinds == ["payload", "empty_tx", "empty_tx", "ack"]
    assert events[0][1] == enc_begin(10, 0, 1)
    assert events[1][1] == 99 and events[2][1] == 120
    # the ack carries the committed register, not the keepalive's WAL end
    assert events[3][1] == encode_standby_status_update(42)


def test_frame_stream_periodic_ack():
    frames = [
        encode_xlog_data(XLogData(i, i + 1, 0, enc_begin(i, 0, 1))) for i in range(4)
    ]
    events = list(frame_stream(frames, lambda: 7, ack_every=2))
    kinds = [k for k, _ in events]
    assert kinds == ["payload", "payload", "ack", "payload", "payload", "ack"]
    assert all(v == encode_standby_status_update(7) for k, v in events if k == "ack")


def test_copy_data_frames_assemble_end_to_end(spark, tmp_path):
    """COPY bytes -> framing -> pgoutput decode -> stateful assembly: the
    complete wire path the reference runs (stream.go:174-248), including a
    reply-requested keepalive mid-stream that must ack without disturbing
    transaction assembly."""
    from mammoth_spark.streaming.accumulator import (
        CHANGE_MESSAGE_SCHEMA,
        assemble_changes_stateful,
    )

    payloads = [
        enc_begin(10, 0, 42),
        enc_relation(1000, "s", "docs", [(1, "id"), (0, "a")]),
        enc_insert(1000, ["7", "x"]),
    ]
    tail = [enc_update(1000, ["7", "y"]), enc_commit(10, 11, 0)]
    frames = [encode_xlog_data(XLogData(10, 11, 0, p)) for p in payloads]
    frames.append(encode_primary_keepalive(PrimaryKeepalive(11, 0, reply_requested=True)))
    frames += [encode_xlog_data(XLogData(10, 11, 0, p)) for p in tail]

    acks, wal_payloads, empty_lsns = [], [], []
    for kind, value in frame_stream(frames, lambda: 10):
        if kind == "payload":
            wal_payloads.append(value)
        elif kind == "ack":
            acks.append(value)
        else:
            empty_lsns.append(value)
    assert acks == [encode_standby_status_update(10)]
    assert empty_lsns == [11]

    rows = list(decode_to_change_messages(wal_payloads))
    src = tmp_path / "wire"
    src.mkdir()
    with open(src / "b.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(CHANGE_MESSAGE_SCHEMA).json(str(src))
    q = (
        assemble_changes_stateful(stream)
        .writeStream.format("memory")
        .queryName("frame_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("frame_e2e").collect()
    assert len(out) == 1
    row = out[0]
    assert row["kind"] == "INSERT" and row["key_after"] == ["7"]
    assert json.loads(row["new_values"])["a"]["v"] == "y"


# ------------- property: framing codec round-trips exactly -------------

from hypothesis import given, settings
from hypothesis import strategies as st

_i64 = st.integers(min_value=0, max_value=(1 << 63) - 1)


@settings(max_examples=200, deadline=None)
@given(wal_start=_i64, wal_end=_i64, t=_i64, payload=st.binary(min_size=1, max_size=256))
def test_xlog_data_roundtrip_property(wal_start, wal_end, t, payload):
    from mammoth_spark.sources.pgoutput import (
        XLogData,
        encode_xlog_data,
        parse_copy_data,
    )

    msg = XLogData(wal_start, wal_end, t, payload)
    back = parse_copy_data(encode_xlog_data(msg))
    assert back == msg


@settings(max_examples=200, deadline=None)
@given(wal_end=_i64, t=_i64, reply=st.booleans())
def test_keepalive_roundtrip_property(wal_end, t, reply):
    from mammoth_spark.sources.pgoutput import (
        PrimaryKeepalive,
        encode_primary_keepalive,
        parse_copy_data,
    )

    msg = PrimaryKeepalive(wal_end, t, reply)
    assert parse_copy_data(encode_primary_keepalive(msg)) == msg


@settings(max_examples=200, deadline=None)
@given(write=st.integers(min_value=1, max_value=(1 << 63) - 1), t=_i64, reply=st.booleans())
def test_standby_status_field_layout_property(write, t, reply):
    # the 'r' frame is encode-only here (the server parses it); pin the
    # byte layout: tag + 4 big-endian i64s + reply flag, with flush/apply
    # defaulting to the write position like pglogrepl's zero-handling
    import struct

    from mammoth_spark.sources.pgoutput import encode_standby_status_update

    raw = encode_standby_status_update(write, client_time_us=t, reply_requested=reply)
    assert raw[:1] == b"r" and len(raw) == 1 + 4 * 8 + 1
    w, f, a, ct, r = struct.unpack(">qqqqb", raw[1:])
    assert (w, f, a, ct, r) == (write, write, write, t, 1 if reply else 0)


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=0, max_size=64))
def test_parse_copy_data_never_crashes_unstructured(data):
    # arbitrary bytes either decode to a frame or raise the protocol
    # error — never IndexError/struct.error leaking out of the codec
    from mammoth_spark.sources.pgoutput import PgOutputError, parse_copy_data

    try:
        parse_copy_data(data)
    except PgOutputError:
        pass
