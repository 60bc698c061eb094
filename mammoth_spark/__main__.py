"""CLI — the reference's three entry points on Spark
(reference cmd/mammoth/main.go:24-49):

    python -m mammoth_spark run          --config cfg.yml
    python -m mammoth_spark initconfig   [--config cfg.yml]
    python -m mammoth_spark streamtofile --config cfg.yml --out dir

``run`` is the sync pipeline (supervisor loop: backfill if the target is
uninitialized, then the micro-batched change-log stream with
drift-restart, reference supervisor/supervisor.go:31-83). ``streamtofile``
is the debug capture: change log straight to JSON lines, no batching, no
compaction, no checkpoint acks (reference supervisor.go:85-106).
``initconfig`` writes the commented default YAML (config.go:109-119).
"""

from __future__ import annotations

import argparse
import os
import sys


def _spark():
    from .plans import get_spark

    return get_spark("mammoth_spark_cli")


def cmd_initconfig(args: argparse.Namespace) -> int:
    from .config import write_example_config

    write_example_config(args.config)
    print(f"wrote example config to {args.config}")
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    from pyspark.sql import types as T

    from .config import load_config
    from .sources.target import ParquetMergeTarget
    from .streaming.pipeline import ChangeLogPipeline, run_with_restart

    cfg = load_config(args.config)
    cfg.validate()
    spark = _spark()

    value_cols = [c for c in (args.value_cols.split(",") if args.value_cols else []) if c]
    key_col = args.key_col

    def make_target(tbl: str) -> ParquetMergeTarget:
        return ParquetMergeTarget(
            spark, os.path.join(cfg.target.root_dir, tbl), [key_col], value_cols
        )

    targets = {t.split(".")[-1]: make_target(t.split(".")[-1]) for t in cfg.sync.tables}
    checkpoint_dir = os.path.join(cfg.target.root_dir, "_checkpoint")

    def _snapshot_df(tbl: str):
        if cfg.source.snapshot_dir:
            return spark.read.parquet(os.path.join(cfg.source.snapshot_dir, tbl))
        return spark.createDataFrame(
            [],
            T.StructType(
                [T.StructField(key_col, T.StringType())]
                + [T.StructField(c, T.StringType()) for c in value_cols]
            ),
        )

    def backfill(only_uninitialized: bool = False) -> None:
        # A full resync (drift restart, supervisor.go:31-83 drop-slot
        # semantics) must ALSO clear the stream checkpoint: resetting a
        # target while the checkpoint survives would mean already-processed
        # change-log files are never replayed and their data is silently
        # lost. Startup instead initializes ONLY uninitialized targets and
        # keeps both the checkpoint and the already-applied state.
        if not only_uninitialized:
            import shutil

            shutil.rmtree(checkpoint_dir, ignore_errors=True)
        for tbl, target in targets.items():
            if only_uninitialized and target.current_version() is not None:
                continue
            target.initialize(_snapshot_df(tbl))

    def make_pipeline() -> ChangeLogPipeline:
        return ChangeLogPipeline(
            spark,
            cfg.source.change_log_dir,
            checkpoint_dir,
            targets,
            value_cols,
            max_files_per_trigger=max(1, cfg.sync.batch_max_items // 1000),
        )

    if any(t.current_version() is None for t in targets.values()):
        backfill(only_uninitialized=True)
    restarts = run_with_restart(make_pipeline, backfill)
    print(f"pipeline drained (restarts={restarts})")
    return 0


def cmd_streamtofile(args: argparse.Namespace) -> int:
    from .scratch import scratch_dir

    from .config import load_config
    from .streaming.pipeline import plain_change_log_schema
    from .streaming.sinks import stream_to_jsonlines

    cfg = load_config(args.config)
    spark = _spark()
    value_cols = [c for c in (args.value_cols.split(",") if args.value_cols else []) if c]
    stream = spark.readStream.schema(plain_change_log_schema(value_cols)).json(
        cfg.source.change_log_dir
    )
    q = stream_to_jsonlines(stream, args.out, scratch_dir(prefix="stf_ckpt_"))
    q.awaitTermination()
    print(f"captured change log to {args.out}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run any registered analytics/pipeline query from the CLI.

    Goes beyond the reference's surface (its CLI is sync-only): the full
    operator registry — dedup, curation, cleaning, ANN, IVM, sketches —
    is runnable against any fixture directory without writing a driver
    script. Output goes to parquet (``--out``) for pipeline use, or a
    bounded textual preview otherwise; ``--list`` enumerates the
    registry with one-line summaries.
    """
    from .registry import QUERIES
    from . import queries  # noqa: F401  (populates the registry)

    if args.list:
        for name in sorted(QUERIES):
            doc = (QUERIES[name].__doc__ or "").strip().splitlines()
            print(f"{name:32s} {doc[0] if doc else ''}")
        return 0
    if not args.name:
        print("query name required (or --list)", file=sys.stderr)
        return 2
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see --list", file=sys.stderr)
        return 2
    spark = _spark()
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


def cmd_pullwire(args: argparse.Namespace) -> int:
    """Socket ingestion front end: attach to a replication stream over
    TCP, pump XLogData frames (acking per committed epoch + answering
    keepalives — sources/wire.py), decode pgoutput, close EXACT
    count-bounded transaction-aligned batches (the reference's 25k rule,
    stream.go:275-315), and stage each batch as one atomically-appearing
    change-log file for ``run`` to consume. No Spark session: this is
    the per-connection sequential stage; the distributed work starts at
    the staged files."""
    from .sources.pgoutput import decode_to_change_messages
    from .sources.wire import SocketReplicationClient
    from .streaming.accumulator import batches_from_plain_rows, stage_batches
    from .streaming.pipeline import plain_rows_from_change_messages

    value_cols = [c for c in (args.value_cols.split(",") if args.value_cols else []) if c]
    session = None
    if args.libpq:
        # full session front door (sources/libpq.py): startup handshake,
        # slot negotiation per the reference's restart decision
        # (sync_service.go:76-91 — resume from the slot's restart_lsn,
        # or create it and report the snapshot that brackets the
        # backfill), then START_REPLICATION into the shared pump
        if args.start_lsn is not None:
            # slot-owned positioning: negotiate_start always resumes from
            # the slot's restart_lsn (or the new consistent point), so an
            # explicit position would be silently discarded — refuse
            # instead of surprising the operator (including an explicit
            # `--start-lsn 0`, which is why the default is None)
            print(
                "error: --start-lsn conflicts with --libpq (the slot owns "
                "the start position; drop --start-lsn or use the plain "
                "wire mode)",
                file=sys.stderr,
            )
            return 2
        from .sources.libpq import ReplicationSession, negotiate_start

        session = ReplicationSession(
            args.host,
            args.port,
            user=args.user,
            # `is None`, not truthiness: an explicit `--password ""` must
            # be used verbatim, not silently replaced by $PGPASSWORD
            password=(
                args.password
                if args.password is not None
                else os.environ.get("PGPASSWORD")
            ),
            sslmode=args.sslmode,
            sslrootcert=args.sslrootcert,
        )
        start_lsn, snapshot = negotiate_start(session, args.slot)
        if snapshot is not None:
            print(
                f"created slot {args.slot}: backfill from snapshot "
                f"{snapshot}, streaming from lsn {start_lsn}"
            )
        else:
            print(f"resuming slot {args.slot} from lsn {start_lsn}")
        client = session.start_replication(args.slot, start_lsn)
    else:
        client = SocketReplicationClient(
            args.host, args.port, args.slot, args.start_lsn or 0
        )
    payloads = (v for k, v in client.stream() if k == "payload")
    msgs = decode_to_change_messages(payloads)
    plain = plain_rows_from_change_messages(msgs, value_cols)
    n = stage_batches(batches_from_plain_rows(plain, args.batch_max_items), args.out)
    if session is not None:
        session.finish_copy()
        session.close()
    else:
        client.close()
    print(f"staged {n} change-log batches to {args.out} (committed lsn {client.committed})")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mammoth_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_init = sub.add_parser("initconfig", help="write an example YAML config")
    p_init.add_argument("--config", default="mammoth-spark.yml")
    p_init.set_defaults(fn=cmd_initconfig)

    p_run = sub.add_parser("run", help="backfill + micro-batched CDC apply loop")
    p_run.add_argument("--config", default="mammoth-spark.yml")
    p_run.add_argument("--key-col", default="key")
    p_run.add_argument("--value-cols", default="")
    p_run.set_defaults(fn=cmd_run)

    p_stf = sub.add_parser("streamtofile", help="debug: change log -> JSON lines")
    p_stf.add_argument("--config", default="mammoth-spark.yml")
    p_stf.add_argument("--out", required=True)
    p_stf.add_argument("--value-cols", default="")
    p_stf.set_defaults(fn=cmd_streamtofile)

    p_w = sub.add_parser("pullwire", help="socket replication stream -> staged change-log batches")
    p_w.add_argument("--host", default="127.0.0.1")
    p_w.add_argument("--port", type=int, required=True)
    p_w.add_argument("--slot", default="mammoth_slot")
    p_w.add_argument(
        "--start-lsn",
        type=int,
        default=None,
        help="explicit start position (plain wire mode only, default 0; "
        "with --libpq the slot owns the position and this flag is an "
        "error — even an explicit 0)",
    )
    p_w.add_argument("--out", required=True)
    p_w.add_argument("--value-cols", default="")
    p_w.add_argument("--batch-max-items", type=int, default=25_000)
    p_w.add_argument(
        "--libpq",
        action="store_true",
        help="full session front door: startup handshake + slot "
        "negotiation (create-or-resume) instead of the bare text start",
    )
    p_w.add_argument("--user", default="sync", help="startup user (libpq mode)")
    p_w.add_argument(
        "--password",
        default=None,
        help="password for SCRAM-SHA-256 (libpq mode; falls back to "
        "$PGPASSWORD, like a real client)",
    )
    p_w.add_argument(
        "--sslmode",
        choices=("disable", "allow", "prefer", "require", "verify-ca", "verify-full"),
        default="disable",
        help="TLS negotiation tier (libpq mode): disable = never probe, "
        "allow = plaintext first, encrypt only if the server refuses it, "
        "prefer = encrypt when the server supports it, require = refuse "
        "a plaintext-only server (no cert verification, like libpq), "
        "verify-ca / verify-full = verify the chain against --sslrootcert "
        "(verify-full also matches the host)",
    )
    p_w.add_argument(
        "--sslrootcert",
        default=None,
        help="trust anchor PEM for sslmode=verify-ca/verify-full",
    )
    p_w.set_defaults(fn=cmd_pullwire)

    p_q = sub.add_parser("query", help="run a registered query against an sf dir")
    p_q.add_argument("name", nargs="?", help="query id (see --list)")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_q.add_argument("--out", help="write result parquet here instead of printing")
    p_q.add_argument("--limit", type=int, default=20)
    p_q.add_argument("--list", action="store_true", help="list registered queries")
    p_q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
