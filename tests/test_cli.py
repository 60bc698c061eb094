"""End-to-end CLI checks: the reference's three entry points
(cmd/mammoth/main.go:24-49) driven through python -m mammoth_spark."""

import json
import os

import yaml

from mammoth_spark.__main__ import main
from mammoth_spark.config import load_config


def _write_changelog(tmp_path, rows):
    src = tmp_path / "changelog"
    src.mkdir(exist_ok=True)
    with open(src / "batch0.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return str(src)


def _cfg(tmp_path, src):
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(
            {
                "sync": {"tables": ["public.users"]},
                "source": {"change_log_dir": src},
                "target": {"root_dir": str(tmp_path / "target")},
            },
            fh,
        )
    return str(cfg_path)


def test_initconfig_roundtrip(tmp_path):
    path = str(tmp_path / "example.yml")
    assert main(["initconfig", "--config", path]) == 0
    cfg = load_config(path)
    cfg.validate()  # the generated example must validate
    assert cfg.sync.batch_max_items == 25_000


def test_run_applies_changelog(tmp_path, spark):
    rows = [
        {"lsn": 1, "seq": 1, "schema": "public", "tbl": "users", "kind": "INSERT",
         "key": "1", "rel_cols": ["v"], "v": "a"},
        {"lsn": 1, "seq": 2, "schema": "public", "tbl": "users", "kind": "INSERT",
         "key": "2", "rel_cols": ["v"], "v": "b"},
        {"lsn": 2, "seq": 3, "schema": "public", "tbl": "users", "kind": "UPDATE",
         "key": "1", "rel_cols": ["v"], "v": "a2"},
        {"lsn": 2, "seq": 4, "schema": "public", "tbl": "users", "kind": "DELETE",
         "key": "2", "rel_cols": ["v"], "v": None},
    ]
    src = _write_changelog(tmp_path, rows)
    cfg = _cfg(tmp_path, src)
    assert main(["run", "--config", cfg, "--key-col", "key", "--value-cols", "v"]) == 0
    out = spark.read.parquet(
        os.path.join(str(tmp_path / "target"), "users",
                     f"v_{_current(tmp_path)}")
    )
    state = {r["key"]: r["v"] for r in out.collect()}
    assert state == {"1": "a2"}


def _current(tmp_path):
    with open(os.path.join(str(tmp_path / "target"), "users", "_CURRENT")) as fh:
        return int(fh.read().strip())


def test_streamtofile_capture(tmp_path):
    rows = [
        {"lsn": 1, "seq": 1, "schema": "public", "tbl": "users", "kind": "INSERT",
         "key": "1", "rel_cols": ["v"], "v": "a"},
    ]
    src = _write_changelog(tmp_path, rows)
    cfg = _cfg(tmp_path, src)
    out = str(tmp_path / "capture")
    assert main(["streamtofile", "--config", cfg, "--out", out, "--value-cols", "v"]) == 0
    captured = [
        json.loads(line)
        for name in os.listdir(out)
        if name.endswith(".json")
        for line in open(os.path.join(out, name))
        if line.strip()
    ]
    assert len(captured) == 1 and captured[0]["key"] == "1"


def _cfg_tables(tmp_path, src, tables):
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(
            {
                "sync": {"tables": tables},
                "source": {"change_log_dir": src},
                "target": {"root_dir": str(tmp_path / "target")},
            },
            fh,
        )
    return str(cfg_path)


def test_rerun_with_new_table_preserves_applied_state(tmp_path, spark):
    # Regression (ADVICE r1): startup backfill used to re-initialize EVERY
    # target whenever ANY was uninitialized; with the stream checkpoint
    # still present the already-processed changelog never replayed, so the
    # initialized table silently reset to empty. Startup must initialize
    # only uninitialized targets.
    rows = [
        {"lsn": 1, "seq": 1, "schema": "public", "tbl": "users", "kind": "INSERT",
         "key": "1", "rel_cols": ["v"], "v": "a"},
        {"lsn": 2, "seq": 2, "schema": "public", "tbl": "users", "kind": "UPDATE",
         "key": "1", "rel_cols": ["v"], "v": "a2"},
    ]
    src = _write_changelog(tmp_path, rows)
    cfg = _cfg_tables(tmp_path, src, ["public.users"])
    assert main(["run", "--config", cfg, "--key-col", "key", "--value-cols", "v"]) == 0

    # add a second (uninitialized) table and run again: no new changelog
    cfg = _cfg_tables(tmp_path, src, ["public.users", "public.orders"])
    assert main(["run", "--config", cfg, "--key-col", "key", "--value-cols", "v"]) == 0

    out = spark.read.parquet(
        os.path.join(str(tmp_path / "target"), "users", f"v_{_current(tmp_path)}")
    )
    state = {r["key"]: r["v"] for r in out.collect()}
    assert state == {"1": "a2"}, "initialized table lost state on rerun"


def test_full_backfill_clears_checkpoint_and_replays(tmp_path, spark):
    # The drift-restart backfill resets targets AND removes the stream
    # checkpoint, so the change log replays from scratch against the fresh
    # snapshot (the reference's drop-slot + full-resync semantics).
    from mammoth_spark.__main__ import main as cli_main

    rows = [
        {"lsn": 1, "seq": 1, "schema": "public", "tbl": "users", "kind": "INSERT",
         "key": "1", "rel_cols": ["v"], "v": "a"},
    ]
    src = _write_changelog(tmp_path, rows)
    cfg = _cfg_tables(tmp_path, src, ["public.users"])
    assert cli_main(["run", "--config", cfg, "--key-col", "key", "--value-cols", "v"]) == 0
    ckpt = os.path.join(str(tmp_path / "target"), "_checkpoint")
    assert os.path.exists(ckpt)

    # simulate the supervisor's full resync: backfill() then rerun
    import shutil

    shutil.rmtree(ckpt)
    assert cli_main(["run", "--config", cfg, "--key-col", "key", "--value-cols", "v"]) == 0
    out = spark.read.parquet(
        os.path.join(str(tmp_path / "target"), "users", f"v_{_current(tmp_path)}")
    )
    state = {r["key"]: r["v"] for r in out.collect()}
    assert state == {"1": "a"}, "replayed changelog must rebuild the same state"


def test_query_subcommand_list_run_and_parquet_out(tmp_path, capsys):
    from mammoth_spark.__main__ import main

    assert main(["query", "--list"]) == 0
    listing = capsys.readouterr().out
    assert "pricing_summary" in listing and "chunk_dedup" in listing

    assert main(["query", "nope_not_registered"]) == 2
    assert main(["query"]) == 2

    out = str(tmp_path / "q_out")
    assert main(["query", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out]) == 0
    from mammoth_spark.plans import get_spark

    assert get_spark("cli_test").read.parquet(out).count() > 0


def test_cli_pullwire_stages_batches(tmp_path):
    """pullwire: socket replication stream -> decoded, exact-batched,
    atomically staged change-log files (no Spark session involved)."""
    import json

    from mammoth_spark.__main__ import main
    from mammoth_spark.sources.pgoutput import XLogData, encode_xlog_data
    from mammoth_spark.sources.wire import ReplayServer

    from test_pgoutput import enc_begin, enc_commit, enc_insert, enc_relation

    payloads = [enc_relation(1000, "public", "users", [(1, "id"), (0, "name")])]
    for x in range(3):
        payloads += [
            enc_begin(10 * (x + 1), 0, x + 1),
            enc_insert(1000, [str(x), f"n{x}"]),
            enc_insert(1000, [str(100 + x), f"m{x}"]),
            enc_commit(10 * (x + 1), 10 * (x + 1) + 1, 0),
        ]
    frames = [encode_xlog_data(XLogData(5, 31, 0, p)) for p in payloads]
    server = ReplayServer(frames, keepalive_every=5)
    out = str(tmp_path / "staged")

    rc = main([
        "pullwire", "--port", str(server.port), "--slot", "s1",
        "--out", out, "--value-cols", "name", "--batch-max-items", "4",
    ])
    server.close()
    assert rc == 0
    import glob

    files = sorted(glob.glob(out + "/batch_*.json"))
    # 2 actions/txn, bound 4: txns (1,2) close, txn 3 flushes
    assert len(files) == 2
    rows = [json.loads(l) for f in files for l in open(f)]
    assert len(rows) == 6
    assert rows[0]["tbl"] == "users" and rows[0]["kind"] == "INSERT"
    assert {r["name"] for r in rows} == {"n0", "n1", "n2", "m0", "m1", "m2"}
    # acks reached the server and are monotone
    assert server.acks and all(a <= b for a, b in zip(server.acks, server.acks[1:]))


def test_cli_pullwire_libpq_rejects_explicit_start_lsn(tmp_path, capsys):
    """--start-lsn with --libpq used to be silently discarded (the slot
    owns the position); it must now fail fast with a clear message,
    before any connection attempt."""
    from mammoth_spark.__main__ import main

    rc = main([
        "pullwire", "--libpq", "--port", "1", "--start-lsn", "5",
        "--out", str(tmp_path / "x"),
    ])
    assert rc == 2
    assert "--start-lsn conflicts with --libpq" in capsys.readouterr().err


def test_cli_pullwire_libpq_create_then_resume(tmp_path, capsys):
    """pullwire --libpq: the full session front door from the CLI —
    first invocation performs the startup handshake, creates the slot
    (reporting the backfill snapshot), streams, and acks; the second
    invocation RESUMES from the slot's restart_lsn and stages nothing
    new (every transaction already confirmed)."""
    import glob

    from mammoth_spark.__main__ import main
    from mammoth_spark.sources.libpq import WalsenderReplayServer
    from mammoth_spark.sources.pgoutput import XLogData, encode_xlog_data

    from test_pgoutput import enc_begin, enc_commit, enc_insert, enc_relation

    payloads = [enc_relation(1000, "public", "users", [(1, "id"), (0, "name")])]
    for x in range(2):
        payloads += [
            enc_begin(10 * (x + 1), 0, x + 1),
            enc_insert(1000, [str(x), f"n{x}"]),
            enc_commit(10 * (x + 1), 10 * (x + 1) + 1, 0),
        ]
    frames = [encode_xlog_data(XLogData(5, 21, 0, p)) for p in payloads]
    server = WalsenderReplayServer()
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")

    # ensure the slot exists BEFORE the WAL does (the timeline model):
    # negotiate_start inside the CLI creates it at lsn 1, then frames land
    from mammoth_spark.sources.libpq import ReplicationSession, negotiate_start

    s0 = ReplicationSession("127.0.0.1", server.port)
    start, snapshot = negotiate_start(s0, "cli_slot")
    s0.close()
    assert snapshot is not None and start == 1
    server.add_frames(frames)

    rc = main([
        "pullwire", "--libpq", "--port", str(server.port),
        "--slot", "cli_slot", "--out", out1, "--value-cols", "name",
    ])
    assert rc == 0
    assert "resuming slot cli_slot from lsn 1" in capsys.readouterr().out
    rows1 = sorted(glob.glob(out1 + "/batch_*.json"))
    assert rows1  # staged the two transactions
    assert server.slots["cli_slot"].restart_lsn == 22

    rc = main([
        "pullwire", "--libpq", "--port", str(server.port),
        "--slot", "cli_slot", "--out", out2, "--value-cols", "name",
    ])
    server.close()
    assert rc == 0
    assert "resuming slot cli_slot from lsn 22" in capsys.readouterr().out
    assert glob.glob(out2 + "/batch_*.json") == []  # nothing re-served


def test_cli_pullwire_libpq_rejects_explicit_zero_start_lsn(tmp_path, capsys):
    """`--start-lsn 0` is still an explicit position: the truthiness
    guard used to let it slip through and be silently discarded."""
    from mammoth_spark.__main__ import main

    rc = main([
        "pullwire", "--libpq", "--port", "1", "--start-lsn", "0",
        "--out", str(tmp_path / "x"),
    ])
    assert rc == 2
    assert "--start-lsn conflicts with --libpq" in capsys.readouterr().err

def test_cli_pullwire_libpq_sslmode_require_over_tls(tmp_path, capsys):
    """pullwire --libpq --sslmode require: the CLI front door negotiates
    TLS (SSLRequest probe) and runs SCRAM-SHA-256-PLUS inside the tunnel
    — the session layer the reference inherits from pgx conninfo
    (config/config.go:31-40)."""
    import glob

    from mammoth_spark.__main__ import main
    from mammoth_spark.sources.libpq import (
        SCRAM_PLUS_MECHANISM,
        ReplicationSession,
        WalsenderReplayServer,
        negotiate_start,
    )
    from mammoth_spark.sources.pgoutput import XLogData, encode_xlog_data

    from test_libpq_tls import mint_tls_pair
    from test_pgoutput import enc_begin, enc_commit, enc_insert, enc_relation

    cert, key = mint_tls_pair(tmp_path)
    payloads = [
        enc_relation(1000, "public", "users", [(1, "id"), (0, "name")]),
        enc_begin(10, 0, 1),
        enc_insert(1000, ["1", "a"]),
        enc_commit(10, 11, 0),
    ]
    frames = [encode_xlog_data(XLogData(5, 11, 0, p)) for p in payloads]
    server = WalsenderReplayServer(
        password="pw", tls_certfile=cert, tls_keyfile=key
    )
    s0 = ReplicationSession(
        "127.0.0.1", server.port, password="pw", sslmode="require"
    )
    negotiate_start(s0, "tls_slot")
    s0.close()
    server.add_frames(frames)

    out = str(tmp_path / "staged")
    rc = main([
        "pullwire", "--libpq", "--port", str(server.port),
        "--slot", "tls_slot", "--out", out, "--value-cols", "name",
        "--password", "pw", "--sslmode", "require",
    ])
    server.close()
    assert rc == 0
    assert glob.glob(out + "/batch_*.json")
    assert all(m == SCRAM_PLUS_MECHANISM for m, _ in server.auth_log)


def test_cli_pullwire_explicit_empty_password_not_replaced_by_env(
    tmp_path, monkeypatch, capsys
):
    """ADVICE r08: `--password ""` must be used verbatim — the old
    truthiness check silently substituted $PGPASSWORD. With the env var
    holding the WRONG password, the empty-password account must still
    authenticate."""
    import glob

    from mammoth_spark.__main__ import main
    from mammoth_spark.sources.libpq import (
        ReplicationSession,
        WalsenderReplayServer,
        negotiate_start,
    )
    from mammoth_spark.sources.pgoutput import XLogData, encode_xlog_data

    from test_pgoutput import enc_begin, enc_commit, enc_insert, enc_relation

    payloads = [
        enc_relation(1000, "public", "users", [(1, "id"), (0, "name")]),
        enc_begin(10, 0, 1),
        enc_insert(1000, ["1", "a"]),
        enc_commit(10, 11, 0),
    ]
    frames = [encode_xlog_data(XLogData(5, 11, 0, p)) for p in payloads]
    server = WalsenderReplayServer(password="")  # empty-password account
    s0 = ReplicationSession("127.0.0.1", server.port, password="")
    negotiate_start(s0, "pw_slot")
    s0.close()
    server.add_frames(frames)

    monkeypatch.setenv("PGPASSWORD", "definitely-wrong")
    out = str(tmp_path / "staged")
    rc = main([
        "pullwire", "--libpq", "--port", str(server.port),
        "--slot", "pw_slot", "--out", out, "--value-cols", "name",
        "--password", "",
    ])
    server.close()
    assert rc == 0
    assert glob.glob(out + "/batch_*.json")
