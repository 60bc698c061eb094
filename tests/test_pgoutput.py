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
