"""Streaming pipeline tests: backfill -> incremental apply -> convergence,
checkpoint resume, drift restart — the Spark equivalent of the reference's
e2e test (/root/reference/supervisor/e2e_test.go:45-188)."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mammoth_spark.sources import ParquetMergeTarget
from mammoth_spark.streaming import ChangeLogPipeline, run_with_restart
from mammoth_spark.types import RelationChangedError


def write_changes(src_dir, name, rows):
    os.makedirs(src_dir, exist_ok=True)
    path = os.path.join(src_dir, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(path + ".tmp", path)  # files must appear atomically


def change(lsn, seq, kind, key, name=None, rel_cols=("name",)):
    return {
        "lsn": lsn,
        "seq": seq,
        "schema": "public",
        "tbl": "users",
        "kind": kind,
        "key": str(key),
        "name": name,
        "rel_cols": list(rel_cols),
    }


@pytest.fixture
def pipeline_env(spark, tmp_path):
    src = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    tgt_root = str(tmp_path / "target")
    os.makedirs(src, exist_ok=True)
    target = ParquetMergeTarget(spark, tgt_root, ["key"], ["name"])
    # backfill: seed rows (e2e_test.go:100-105 seeds 3 artists)
    seed = spark.createDataFrame(
        [("1", "Taylor Swift"), ("2", "Van Morrison"), ("3", "Woody Guthrie")],
        T.StructType(
            [T.StructField("key", T.StringType()), T.StructField("name", T.StringType())]
        ),
    )
    target.initialize(seed)
    pipeline = ChangeLogPipeline(
        spark,
        source_dir=src,
        checkpoint_dir=ckpt,
        targets={"users": target},
        value_cols=["name"],
    )
    return src, target, pipeline


def state(target):
    return {r["key"]: r["name"] for r in target.read().collect()}


def test_backfill_then_incremental_convergence(pipeline_env):
    src, target, pipeline = pipeline_env
    assert state(target) == {"1": "Taylor Swift", "2": "Van Morrison", "3": "Woody Guthrie"}

    # insert + update + delete (e2e_test.go:153-159)
    write_changes(
        src,
        "batch1.json",
        [
            change(10, 1, "INSERT", 4, "Bob Dylan"),
            change(11, 2, "UPDATE", 2, "Van The Man"),
            change(12, 3, "DELETE", 3),
        ],
    )
    pipeline.run_available()
    assert state(target) == {"1": "Taylor Swift", "2": "Van The Man", "4": "Bob Dylan"}
    assert pipeline.last_committed_lsn == 13  # max lsn + 1 (lsn.go:32-45)


def test_checkpoint_makes_reprocessing_idempotent(pipeline_env):
    src, target, pipeline = pipeline_env
    write_changes(src, "b1.json", [change(1, 1, "INSERT", 9, "Nina Simone")])
    pipeline.run_available()
    v_after_first = target.current_version()
    # second cycle with no new files: offsets already committed -> no-op
    pipeline.run_available()
    assert state(target)["9"] == "Nina Simone"
    assert target.current_version() == v_after_first  # no spurious rewrite

    # compaction inside one batch: I then U then D nets to nothing
    write_changes(
        src,
        "b2.json",
        [
            change(2, 10, "INSERT", 7, "temp"),
            change(2, 11, "UPDATE", 7, "temp2"),
            change(2, 12, "DELETE", 7),
        ],
    )
    pipeline.run_available()
    assert "7" not in state(target)


def test_drift_triggers_restart_with_fresh_backfill(spark, tmp_path):
    """The upstream relation grew a column (rel_cols advertises it); the
    first pipeline (declared for the old schema) must abort with drift,
    the supervisor re-backfills and rebuilds with the new schema —
    reference supervisor.go:55-82 + sync_service.go:111-125."""
    src = str(tmp_path / "changes")
    tgt_root = str(tmp_path / "target")
    os.makedirs(src, exist_ok=True)
    attempts = {"n": 0}

    def backfill():
        # re-introspection discovers the evolved schema on the second pass
        cols = ["name"] if attempts["n"] == 0 else ["name", "extra_col"]
        seed = spark.createDataFrame(
            [tuple(["1"] + ["a"] * len(cols))],
            T.StructType(
                [T.StructField("key", T.StringType())]
                + [T.StructField(c, T.StringType()) for c in cols]
            ),
        )
        ParquetMergeTarget(spark, tgt_root + str(attempts["n"]), ["key"], cols).initialize(seed)

    def make_pipeline():
        attempts["n"] += 1
        # attempt 1 declares the OLD schema; attempt 2 the evolved one
        cols = ["name"] if attempts["n"] == 1 else ["name", "extra_col"]
        target = ParquetMergeTarget(spark, tgt_root + str(attempts["n"] - 1), ["key"], cols)
        return ChangeLogPipeline(
            spark,
            source_dir=src,
            checkpoint_dir=str(tmp_path / f"ckpt{attempts['n']}"),
            targets={"users": target},
            value_cols=cols,
        )

    backfill()
    # the stream already advertises the evolved relation
    write_changes(
        src, "b1.json", [change(1, 1, "INSERT", 5, "x", rel_cols=("name", "extra_col"))]
    )
    restarts = run_with_restart(make_pipeline, backfill)
    assert restarts == 1  # drift on attempt 1, clean on attempt 2
    target = ParquetMergeTarget(spark, tgt_root + "1", ["key"], ["name", "extra_col"])
    assert {r["key"] for r in target.read().collect()} == {"1", "5"}


def test_stateful_tx_assembly_across_batches(spark, tmp_path):
    """BEGIN in batch 1, COMMIT in batch 2: the transaction must only be
    emitted once complete (message_accumulator semantics)."""
    from mammoth_spark.streaming.accumulator import (
        MESSAGE_SCHEMA,
        assemble_transactions_stateful,
    )

    src = str(tmp_path / "msgs")
    out_dir = str(tmp_path / "txout")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def msg(xid, seq, mt, lsn=None):
        return {"xid": xid, "seq": seq, "msg_type": mt, "lsn": lsn, "tbl": "users"}

    def run_cycle():
        stream = spark.readStream.schema(MESSAGE_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
        txs = assemble_transactions_stateful(stream)
        q = (
            txs.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if q.exception():
            raise q.exception()

    # batch 1: tx 100 begins + 2 DML, no commit; tx 200 complete
    write_changes(
        src,
        "m1.json",
        [
            msg(100, 1, "BEGIN"),
            msg(100, 2, "INSERT"),
            msg(100, 3, "UPDATE"),
            msg(200, 4, "BEGIN"),
            msg(200, 5, "INSERT"),
            msg(200, 6, "COMMIT", lsn=60),
        ],
    )
    run_cycle()

    def read_done():
        # re-create per read: the file-sink metadata log is snapshotted at
        # DataFrame definition, so a pre-existing handle goes stale
        return spark.read.schema(
            "xid long, lsn long, n_actions long, first_seq long, last_seq long"
        ).parquet(out_dir)

    assert {r["xid"] for r in read_done().collect()} == {200}

    # batch 2: tx 100 commits -> emitted with actions from BOTH batches
    write_changes(src, "m2.json", [msg(100, 7, "DELETE"), msg(100, 8, "COMMIT", lsn=80)])
    run_cycle()
    rows = {r["xid"]: r for r in read_done().collect()}
    assert set(rows) == {100, 200}
    assert rows[100]["n_actions"] == 3  # 2 from batch 1 + 1 from batch 2
    assert rows[100]["lsn"] == 80


def test_validate_action_sequences(spark):
    from mammoth_spark.streaming import validate_action_sequences

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )
    ok = spark.createDataFrame(
        [("a", 1, "INSERT"), ("a", 2, "UPDATE"), ("a", 3, "DELETE"), ("a", 4, "INSERT")],
        schema,
    )
    assert validate_action_sequences(ok, ["key"]).count() == 0
    bad = spark.createDataFrame([("a", 1, "INSERT"), ("a", 2, "INSERT")], schema)
    assert validate_action_sequences(bad, ["key"]).count() == 1


def test_truncate_message_rejected(spark, tmp_path):
    # TRUNCATE cannot be expressed as keyed row changes; the accumulator
    # hard-errors like the reference's truncate branch
    import json

    from pyspark.sql.streaming import StreamingQueryException

    from mammoth_spark.streaming.accumulator import (
        MESSAGE_SCHEMA,
        assemble_transactions_stateful,
    )

    src = tmp_path / "msgs"
    src.mkdir()
    rows = [
        {"xid": 1, "seq": 1, "msg_type": "BEGIN", "lsn": None, "tbl": "users"},
        {"xid": 1, "seq": 2, "msg_type": "TRUNCATE", "lsn": None, "tbl": "users"},
        {"xid": 1, "seq": 3, "msg_type": "COMMIT", "lsn": 10, "tbl": "users"},
    ]
    with open(src / "b.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(MESSAGE_SCHEMA).json(str(src))
    q = (
        assemble_transactions_stateful(stream)
        .writeStream.format("memory")
        .queryName("trunc_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    import pytest

    with pytest.raises(StreamingQueryException, match="TRUNCATE"):
        q.awaitTermination()
        if q.exception() is not None:
            raise q.exception()


def test_same_epoch_redelivery_is_idempotent(pipeline_env, spark, tmp_path):
    """A15 compensation: the parquet target commits per table (no
    cross-table transaction), so a crash between tables re-delivers the
    same micro-batch on restart. Re-applying an epoch must leave the
    target state unchanged — the idempotent-merge property the docstring
    promises (reference commits all tables atomically,
    snowflake_target.go:295-297; we compensate with idempotent MERGE)."""
    src, target, pipeline = pipeline_env
    write_changes(
        src,
        "b1.json",
        [
            change(1, 1, "INSERT", 5, "New Artist"),
            change(1, 2, "UPDATE", 1, "Taylor A. Swift"),
            change(1, 3, "DELETE", 2),
        ],
    )
    pipeline.run_available()
    applied_once = state(target)
    assert applied_once == {"1": "Taylor A. Swift", "3": "Woody Guthrie", "5": "New Artist"}

    # re-deliver the SAME batch through the sink body directly (the
    # checkpoint would normally skip it; a mid-epoch crash replays it)
    from mammoth_spark.streaming.pipeline import plain_change_log_schema

    batch = spark.read.schema(plain_change_log_schema(["name"])).json(
        os.path.join(src, "b1.json")
    )
    pipeline._apply_batch(batch, epoch_id=0)
    assert state(target) == applied_once, "same-epoch re-delivery changed target state"


def test_toast_unchanged_inherits_across_micro_batches(spark, tmp_path):
    """TOAST tri-state through the STATEFUL accumulator: a column
    materialized by an UPDATE in micro-batch 1 must survive an
    `is_unchanged` cell in micro-batch 2 of the same transaction, and a
    column unchanged in EVERY action must come out still-unchanged (the
    sink then inherits the target's value)."""
    from mammoth_spark.streaming.accumulator import (
        CHANGE_MESSAGE_SCHEMA,
        assemble_changes_stateful,
    )

    src = str(tmp_path / "msgs")
    out_dir = str(tmp_path / "txout")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def cell(v=None, unchanged=False):
        return {"v": v, "is_null": v is None and not unchanged, "is_unchanged": unchanged}

    def msg(xid, seq, mt, lsn=None, key=None, vals=None):
        return {
            "xid": xid, "seq": seq, "msg_type": mt, "lsn": lsn, "tbl": "docs",
            "key_before": [str(key)] if key is not None else None,
            "key_after": [str(key)] if key is not None else None,
            "new_values": json.dumps(vals) if vals is not None else None,
        }

    def run_cycle():
        stream = (
            spark.readStream.schema(CHANGE_MESSAGE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = (
            assemble_changes_stateful(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if q.exception():
            raise q.exception()

    # batch 1: BEGIN + UPDATE materializing col a, col b TOAST-unchanged
    write_changes(
        src,
        "m1.json",
        [
            msg(9, 1, "BEGIN"),
            msg(9, 2, "UPDATE", key=1,
                vals={"a": cell("from-batch-1"), "b": cell(unchanged=True)}),
        ],
    )
    run_cycle()

    def read_done():
        return spark.read.schema(
            "xid long, lsn long, tbl string, kind string, "
            "key_before array<string>, key_after array<string>, new_values string"
        ).parquet(out_dir)

    assert read_done().count() == 0  # no COMMIT yet

    # batch 2 (same tx): UPDATE with a TOAST-unchanged, b materialized; COMMIT
    write_changes(
        src,
        "m2.json",
        [
            msg(9, 3, "UPDATE", key=1,
                vals={"a": cell(unchanged=True), "b": cell("from-batch-2")}),
            msg(9, 4, "COMMIT", lsn=40),
        ],
    )
    run_cycle()
    rows = read_done().collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["kind"] == "UPDATE" and row["lsn"] == 40
    vals = json.loads(row["new_values"])
    # col a: batch-2's unchanged cell inherited batch-1's materialized value
    assert vals["a"]["v"] == "from-batch-1" and not vals["a"]["is_unchanged"]
    # col b: materialized by batch 2
    assert vals["b"]["v"] == "from-batch-2"


def test_toast_never_materialized_stays_unchanged(spark, tmp_path):
    """A column TOAST-unchanged in every action of the transaction comes
    out with is_unchanged=true — the merge inherits the target's value."""
    from mammoth_spark.streaming.accumulator import (
        CHANGE_MESSAGE_SCHEMA,
        assemble_changes_stateful,
    )

    src = str(tmp_path / "msgs")
    os.makedirs(src, exist_ok=True)
    rows = [
        {"xid": 3, "seq": 1, "msg_type": "BEGIN", "lsn": None, "tbl": "docs",
         "key_before": None, "key_after": None, "new_values": None},
        {"xid": 3, "seq": 2, "msg_type": "UPDATE", "lsn": None, "tbl": "docs",
         "key_before": ["7"], "key_after": ["7"],
         "new_values": json.dumps({"a": {"v": "x", "is_null": False, "is_unchanged": False},
                                    "big": {"v": None, "is_null": False, "is_unchanged": True}})},
        {"xid": 3, "seq": 3, "msg_type": "COMMIT", "lsn": 10, "tbl": "docs",
         "key_before": None, "key_after": None, "new_values": None},
    ]
    write_changes(src, "b.json", rows)
    stream = spark.readStream.schema(CHANGE_MESSAGE_SCHEMA).json(src)
    q = (
        assemble_changes_stateful(stream)
        .writeStream.format("memory")
        .queryName("toast_stay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("toast_stay").collect()
    assert len(out) == 1
    vals = json.loads(out[0]["new_values"])
    assert vals["big"]["is_unchanged"] is True


def test_watermark_drops_beyond_late_rows(spark, tmp_path):
    """Late-data discipline for windowed streaming aggregation: a row
    arriving LATER than the watermark delay is dropped from state; a
    moderately late row (inside the delay) is still admitted. Two
    availableNow passes over a file source share one checkpoint, so the
    watermark persists across the restart exactly as it would across
    micro-batches of a long-running job."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def event(minute, k="a"):
        from datetime import datetime, timedelta

        ts = datetime(2024, 1, 1) + timedelta(minutes=minute)
        return {"ts": ts.strftime("%Y-%m-%dT%H:%M:%S.000Z"), "k": k}

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.StringType())]
    )

    def run_pass():
        stream = spark.readStream.schema(schema).json(src)
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "10 minutes"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.unix_timestamp("window.start").alias("wstart"), "k", "n"
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # pass 1: rows in window 00:00-00:10, plus a row at 02:00 that drives
    # the watermark to 01:30 and finalizes every window ending before it
    write_changes(src, "b1.json", [event(0), event(5), event(120)])
    run_pass()

    # pass 2: one row at 00:05 — its window closed at 00:10, far beyond
    # the 01:30 watermark -> MUST be dropped; one row at 01:45 — its
    # window (01:40-01:50) ends after the watermark -> admitted; one row
    # at 03:00 advances the watermark to 02:30 and finalizes 01:40-01:50
    write_changes(src, "b2.json", [event(5), event(105), event(180)])
    run_pass()

    got = {
        (r["wstart"], r["k"]): r["n"] for r in spark.read.parquet(out).collect()
    }
    base = 1704067200  # 2024-01-01T00:00:00Z
    # window 00:00-00:10 finalized with the TWO pass-1 rows only — the
    # pass-2 straggler was beyond the watermark and left no trace
    assert got[(base, "a")] == 2
    # the moderately-late row was admitted and finalized by pass 2
    assert got[(base + 105 * 60 // 600 * 600, "a")] == 1


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps one row
    per key while the key's first sighting is inside the watermark delay,
    and evicts the dedup state once the watermark passes it — so the same
    key reappearing much later is (correctly) emitted again. This is the
    streaming face of dedup_exact: bounded state at any corpus rate."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def event(minute, k):
        from datetime import datetime, timedelta

        ts = datetime(2024, 1, 1) + timedelta(minutes=minute)
        return {"ts": ts.strftime("%Y-%m-%dT%H:%M:%S.000Z"), "k": k}

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.StringType())]
    )

    def run_pass():
        stream = spark.readStream.schema(schema).json(src)
        deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(["k"])
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # pass 1: A at 00:00, duplicate A at 00:05 (dropped), watermark driver
    # at 02:00 -> watermark 01:30, A's dedup state (expires 00:30) evicted
    write_changes(src, "b1.json", [event(0, "a"), event(5, "a"), event(120, "wm")])
    run_pass()
    # pass 2: A again at 02:10 — state was evicted, so it's a fresh row;
    # duplicate A at 02:15 inside the delay is dropped
    write_changes(src, "b2.json", [event(130, "a"), event(135, "a")])
    run_pass()

    rows = sorted(
        (r["k"], r["ts"].minute + r["ts"].hour * 60)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [("a", 0), ("a", 130), ("wm", 120)]


def test_target_time_travel_compact_vacuum(spark, tmp_path):
    """Versioned-target maintenance: immutable version dirs give time
    travel; compact_files rewrites layout (not data) as a new version;
    vacuum drops history but never the current version."""
    from mammoth_spark.model import local_df

    root = str(tmp_path / "tt_target")
    target = ParquetMergeTarget(spark, root, ["key"], ["name"])
    target.initialize(
        local_df(spark, [("1", "a"), ("2", "b")], ["key", "name"])
    )
    v1_rows = sorted(tuple(r) for r in target.read().collect())

    upd = local_df(
        spark, [("2", "B", "UPDATE"), ("3", "c", "INSERT")], ["key", "name", "kind"]
    )
    target.write(upd)
    assert target.versions() == [1, 2]
    # time travel: v1 still shows the pre-merge state
    assert sorted(tuple(r) for r in target.read_version(1).collect()) == v1_rows
    cur = sorted(tuple(r) for r in target.read().collect())
    assert cur == [("1", "a"), ("2", "B"), ("3", "c")]

    # compaction: same data, fewer files, new version
    import glob

    before = len(glob.glob(root + "/v_2/*.parquet"))
    v3 = target.compact_files(target_files=1)
    assert v3 == 3 and target.current_version() == 3
    after = len(glob.glob(root + "/v_3/*.parquet"))
    assert after == 1 and after <= before
    assert sorted(tuple(r) for r in target.read().collect()) == cur

    # vacuum: keep last 2 -> v1 gone, current intact and readable
    assert target.vacuum(keep_last=2) == [1]
    assert target.versions() == [2, 3]
    with pytest.raises(FileNotFoundError):
        target.read_version(1)
    assert sorted(tuple(r) for r in target.read().collect()) == cur


def test_transform_with_state_running_totals(spark, sf_dir, tmp_path):
    """Spark 4's transformWithStateInPandas (streaming/tws.py): per-user
    ValueState running totals must survive micro-batch boundaries
    (maxFilesPerTrigger=1 over a 3-file source) and the final per-key
    emission must equal the batch totals. Gated: the TWS state protocol
    needs google.protobuf, which this container may not ship."""
    import uuid

    import pytest

    from mammoth_spark.model import read_table
    from mammoth_spark.streaming.tws import (
        TOTALS_OUTPUT_SCHEMA,
        RunningTotalsProcessor,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState runtime unavailable")

    # TWS keeps each named state variable in its own column family, which
    # the default HDFS-backed provider rejects — RocksDB is the
    # production provider for transformWithState
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.col("value") * 1000).cast("bigint").alias("vm")
    )
    src = str(tmp_path / "tws_src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("user_id bigint, vm bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    sink = f"tws_totals_{uuid.uuid4().hex[:8]}"
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    final = {
        r["user_id"]: (r["n_events"], r["value_milli"])
        for r in spark.table(sink)
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "value_milli"), F.col("n_events")).alias("f"))
        .select("user_id", "f.n_events", "f.value_milli")
        .collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["vm"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vm").alias("vm"))
        .collect()
    }
    assert final == expected


def test_mor_target_pipeline_matches_cow_end_state(spark, tmp_path):
    """Storage-strategy dispatch (round 9): the SAME foreachBatch loop
    applied to a merge-on-read target (O(batch) delta appends) and a
    copy-on-write target (whole-table MERGE) must converge to identical
    table state — including a net-nothing chain inside one batch, which
    the MOR form must tombstone (compact_for_mor) so the base's older
    row cannot resurrect at read time."""
    from mammoth_spark.sources.target import ParquetMorTarget

    seed = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", "c")],
        T.StructType(
            [T.StructField("key", T.StringType()), T.StructField("name", T.StringType())]
        ),
    )
    batches = [
        ("b1.json", [
            change(10, 1, "INSERT", 4, "d"),
            change(11, 2, "UPDATE", 2, "b2"),
            change(12, 3, "DELETE", 3),
        ]),
        # net-nothing chain (I,U,D on a fresh key) + delete of a BASE row:
        # both need tombstones on the MOR side
        ("b2.json", [
            change(20, 4, "INSERT", 7, "tmp"),
            change(20, 5, "UPDATE", 7, "tmp2"),
            change(20, 6, "DELETE", 7),
            change(21, 7, "DELETE", 1),
            change(22, 8, "UPDATE", 4, "d2"),
        ]),
    ]

    ends = {}
    n_versions = {}
    for flavor in ("cow", "mor"):
        src = str(tmp_path / flavor / "changes")
        os.makedirs(src, exist_ok=True)
        cls = ParquetMergeTarget if flavor == "cow" else ParquetMorTarget
        target = cls(spark, str(tmp_path / flavor / "tgt"), ["key"], ["name"])
        target.initialize(seed)
        pipeline = ChangeLogPipeline(
            spark,
            source_dir=src,
            checkpoint_dir=str(tmp_path / flavor / "ckpt"),
            targets={"users": target},
            value_cols=["name"],
        )
        for name, rows in batches:
            write_changes(src, name, rows)
            pipeline.run_available()
        ends[flavor] = {r["key"]: r["name"] for r in target.read().collect()}
        if flavor == "mor":
            m = target._manifest()
            n_versions["mor_deltas"] = m["deltas"]
            n_versions["mor_base"] = m["base"]

    assert ends["cow"] == ends["mor"] == {"2": "b2", "4": "d2"}
    # the MOR base was written ONCE (initialize); every epoch appended a
    # delta instead of rewriting the table — the O(batch) write shape
    assert n_versions["mor_base"] == 0
    assert n_versions["mor_deltas"] == 2


def test_mor_target_redelivery_is_effect_idempotent(spark, tmp_path):
    """Crash between write_delta and checkpoint commit: the replayed
    epoch appends a DUPLICATE delta. Rows duplicate with identical
    (key, last_seq, values), so the reconciling max_by read resolves to
    the same state — redelivery changes the file count, never the
    table."""
    from mammoth_spark.sources.target import ParquetMorTarget

    seed = spark.createDataFrame(
        [("1", "a")],
        T.StructType(
            [T.StructField("key", T.StringType()), T.StructField("name", T.StringType())]
        ),
    )
    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    target = ParquetMorTarget(spark, str(tmp_path / "tgt"), ["key"], ["name"])
    target.initialize(seed)
    write_changes(src, "b1.json", [
        change(10, 1, "INSERT", 2, "b"),
        change(11, 2, "DELETE", 1),
    ])

    def run(ckpt):
        ChangeLogPipeline(
            spark,
            source_dir=src,
            checkpoint_dir=str(tmp_path / ckpt),
            targets={"users": target},
            value_cols=["name"],
        ).run_available()

    run("ckpt1")
    state1 = {r["key"]: r["name"] for r in target.read().collect()}
    # simulate the lost checkpoint: a fresh checkpoint replays the epoch
    run("ckpt2")
    state2 = {r["key"]: r["name"] for r in target.read().collect()}
    assert state1 == state2 == {"2": "b"}
    assert target._manifest()["deltas"] == 2  # duplicate delta, same effect


def test_mor_auto_compact_bounds_read_amplification(spark, tmp_path):
    """compact_every=2: the second delta triggers the automatic OPTIMIZE
    fold — base advances, deltas reset — so read amplification never
    exceeds the bound while epoch writes stay O(batch). State is correct
    across the fold boundary."""
    from mammoth_spark.sources.target import ParquetMorTarget

    seed = spark.createDataFrame(
        [("1", "a")],
        T.StructType(
            [T.StructField("key", T.StringType()), T.StructField("name", T.StringType())]
        ),
    )
    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    target = ParquetMorTarget(
        spark, str(tmp_path / "tgt"), ["key"], ["name"], compact_every=2
    )
    target.initialize(seed)
    pipeline = ChangeLogPipeline(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        targets={"users": target},
        value_cols=["name"],
    )

    write_changes(src, "b1.json", [change(10, 1, "INSERT", 2, "b")])
    pipeline.run_available()
    assert target._manifest() == {"base": 0, "deltas": 1}

    write_changes(src, "b2.json", [change(11, 2, "DELETE", 1)])
    pipeline.run_available()
    # second delta hit the bound: folded into base v1, deltas reset
    assert target._manifest() == {"base": 1, "deltas": 0}
    assert {r["key"]: r["name"] for r in target.read().collect()} == {"2": "b"}

    write_changes(src, "b3.json", [change(12, 3, "UPDATE", 2, "b2")])
    pipeline.run_available()
    assert target._manifest() == {"base": 1, "deltas": 1}
    assert {r["key"]: r["name"] for r in target.read().collect()} == {"2": "b2"}


def test_flagged_pipeline_toast_cow_equals_mor(spark, tmp_path):
    """TOAST tri-state END TO END through the streaming loop (VERDICT
    r09 #1): a flagged change stream (cells carrying unchanged / explicit
    NULL) applied through the SAME ChangeLogPipeline to a copy-on-write
    target (per-column MERGE CASE) and a flagged merge-on-read target
    (per-column read-time resolution) must converge to the identical
    state — including a column whose value was set in epoch 1 and
    carried `unchanged` through every later epoch (inheritance across
    the delta chain), and parity must survive a mid-stream compact()."""
    from mammoth_spark.sources.target import ParquetMorTarget

    def cell(v=None, is_null=False, is_unchanged=False):
        return {"v": v, "is_null": is_null, "is_unchanged": is_unchanged}

    def chg(lsn, seq, kind, key, a=None, b=None):
        return {
            "lsn": lsn, "seq": seq, "schema": "public", "tbl": "users",
            "kind": kind, "key": str(key), "rel_cols": ["a", "b"],
            "a": a, "b": b,
        }

    seed = spark.createDataFrame(
        [("1", "a-base", "b-base"), ("2", "a2", "b2")],
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("a", T.StringType()),
                T.StructField("b", T.StringType()),
            ]
        ),
    )
    batches = [
        ("b1.json", [
            # key 1: set a, leave b unchanged (b must stay b-base)
            chg(10, 1, "UPDATE", 1, cell("a-new"), cell(is_unchanged=True)),
            # key 3: fresh insert, fully valued
            chg(10, 2, "INSERT", 3, cell("a3"), cell("b3")),
        ]),
        ("b2.json", [
            # key 1: explicit NULL on b, a unchanged (a stays a-new)
            chg(20, 3, "UPDATE", 1, cell(is_unchanged=True), cell(is_null=True)),
            # key 2: delete a base row
            chg(20, 4, "DELETE", 2),
            # key 3: both unchanged -> whole row inherited
            chg(20, 5, "UPDATE", 3, cell(is_unchanged=True), cell(is_unchanged=True)),
        ]),
        ("b3.json", [
            # key 1: a still unchanged THREE epochs after it was set
            chg(30, 6, "UPDATE", 1, cell(is_unchanged=True), cell("b-final")),
        ]),
    ]
    expected = {"1": ("a-new", "b-final"), "3": ("a3", "b3")}

    ends = {}
    for flavor in ("cow", "mor"):
        src = str(tmp_path / flavor / "changes")
        os.makedirs(src, exist_ok=True)
        if flavor == "cow":
            target = ParquetMergeTarget(spark, str(tmp_path / flavor / "tgt"), ["key"], ["a", "b"])
        else:
            target = ParquetMorTarget(
                spark, str(tmp_path / flavor / "tgt"), ["key"], ["a", "b"], flagged=True
            )
        target.initialize(seed)
        pipeline = ChangeLogPipeline(
            spark,
            source_dir=src,
            checkpoint_dir=str(tmp_path / flavor / "ckpt"),
            targets={"users": target},
            value_cols=["a", "b"],
            flagged=True,
        )
        for i, (name, rows) in enumerate(batches):
            write_changes(src, name, rows)
            pipeline.run_available()
            if flavor == "mor" and i == 1:
                # OPTIMIZE mid-stream: materializes the resolution; the
                # next epoch's unchanged cells must inherit across it
                target.compact()
        ends[flavor] = {r["key"]: (r["a"], r["b"]) for r in target.read().collect()}

    assert ends["cow"] == ends["mor"] == expected


def test_additive_drift_evolves_without_resync(spark, tmp_path):
    """Round 12: an upstream ADD COLUMN mid-stream is ABSORBED — the
    supervisor evolves the catalog schema and resumes from the SAME
    checkpoint (no backfill, no re-sync); the redelivered batch applies
    under the wide schema, and pre-ALTER rows (advertising a PREFIX of
    the declared columns) pass the drift check and read NULL for the
    new column. Destructive drift still re-syncs (next test)."""
    from mammoth_spark.sources.target import TxnCatalog

    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    cols = ["name"]  # mutable: the supervisor's view of the schema
    target = ParquetMergeTarget(spark, str(tmp_path / "t"), ["key"], list(cols))
    cat = TxnCatalog(spark, str(tmp_path / "cat"), {"users": target})
    cat.initialize(
        {
            "users": spark.createDataFrame(
                [("1", "seed")],
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                ),
            )
        }
    )
    backfills = {"n": 0}

    def backfill():
        backfills["n"] += 1

    def evolve(advertised):
        cat.evolve_schema("users", [c for c in advertised if c not in cols])
        cols[:] = advertised

    def make_pipeline():
        return ChangeLogPipeline(
            spark,
            source_dir=src,
            checkpoint_dir=str(tmp_path / "ckpt"),  # SAME checkpoint throughout
            targets={"users": target},
            value_cols=list(cols),
            txn_catalog=cat,
        )

    # one batch mixing pre-ALTER rows (narrow) and post-ALTER rows (wide)
    rows = [
        change(1, 1, "INSERT", 5, "pre-alter"),  # advertises ("name",)
        dict(
            change(1, 2, "INSERT", 6, "post-alter", rel_cols=("name", "nick")),
            nick="Nick",
        ),
        dict(
            change(1, 3, "UPDATE", 5, "pre2"),  # pre-ALTER image, later seq? no: seq 3 > 2
        ),
    ]
    write_changes(src, "b1.json", rows)
    restarts = run_with_restart(make_pipeline, backfill, evolve=evolve)
    assert restarts == 1  # one evolve-restart, zero backfills
    assert backfills["n"] == 0
    assert cols == ["name", "nick"]
    got = {r["key"]: (r["name"], r["nick"]) for r in cat.read("users").collect()}
    assert got == {
        "1": ("seed", None),       # untouched: typed NULL backfill
        "5": ("pre2", None),       # pre-ALTER rows: no nick, reads NULL
        "6": ("post-alter", "Nick"),
    }
    # the stream continues on the same checkpoint without further restarts
    write_changes(
        src,
        "b2.json",
        [dict(change(2, 9, "UPDATE", 5, "pre3", rel_cols=("name", "nick")), nick="N5")],
    )
    assert run_with_restart(make_pipeline, backfill, evolve=evolve) == 0
    got = {r["key"]: (r["name"], r["nick"]) for r in cat.read("users").collect()}
    assert got["5"] == ("pre3", "N5")


def test_drop_drift_retires_and_resumes_without_resync(spark, tmp_path):
    """Round 13 (VERDICT r12 #3): an upstream DROP COLUMN mid-stream is
    ABSORBED — the supervisor retires the column (projection-level
    manifest record, zero data movement) and resumes from the SAME
    checkpoint; the redelivered batch applies under the narrow schema,
    and PRE-DROP rows (advertising the old wide relation) pass the
    retired-tolerant drift check. The reference re-copies the whole
    table here (supervisor.go:73-76). Time travel keeps the pre-drop
    epochs wide."""
    from mammoth_spark.sources.target import TxnCatalog

    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    cols = ["name", "nick"]  # mutable: the supervisor's view
    target = ParquetMergeTarget(spark, str(tmp_path / "t"), ["key"], list(cols))
    cat = TxnCatalog(spark, str(tmp_path / "cat"), {"users": target})
    cat.initialize(
        {
            "users": spark.createDataFrame(
                [("1", "seed", "S")],
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("nick", T.StringType()),
                    ]
                ),
            )
        }
    )
    backfills = {"n": 0}

    def backfill():
        backfills["n"] += 1

    def retire(dropped):
        cat.retire_column("users", dropped)
        cols[:] = [c for c in cols if c not in dropped]

    def make_pipeline():
        return ChangeLogPipeline(
            spark,
            source_dir=src,
            checkpoint_dir=str(tmp_path / "ckpt"),  # SAME checkpoint
            targets={"users": target},
            value_cols=list(cols),
            txn_catalog=cat,
        )

    # one batch mixing PRE-DROP rows (old wide relation) and POST-DROP
    # rows (narrow relation missing nick)
    rows = [
        dict(
            change(1, 1, "INSERT", 5, "pre-drop", rel_cols=("name", "nick")),
            nick="old",
        ),
        change(1, 2, "INSERT", 6, "post-drop", rel_cols=("name",)),
    ]
    write_changes(src, "b1.json", rows)
    restarts = run_with_restart(make_pipeline, backfill, retire=retire)
    assert restarts == 1  # one retire-restart, ZERO backfills
    assert backfills["n"] == 0
    assert cols == ["name"]
    assert cat.read("users").columns == ["key", "name"]
    got = {r["key"]: r["name"] for r in cat.read("users").collect()}
    assert got == {"1": "seed", "5": "pre-drop", "6": "post-drop"}
    # time travel: the pre-drop epoch still shows the column
    assert cat.read_at("users", -1).columns == ["key", "name", "nick"]
    assert {r["nick"] for r in cat.read_at("users", -1).collect()} == {"S"}
    # the stream continues on the same checkpoint: narrow rows AND
    # redelivery-shaped old wide rows both pass without restarts
    write_changes(
        src,
        "b2.json",
        [
            change(2, 9, "UPDATE", 5, "after"),
            dict(
                change(2, 10, "UPDATE", 6, "late-wide", rel_cols=("name", "nick")),
                nick="ghost",
            ),
        ],
    )
    assert run_with_restart(make_pipeline, backfill, retire=retire) == 0
    assert backfills["n"] == 0
    got = {r["key"]: r["name"] for r in cat.read("users").collect()}
    assert got["5"] == "after" and got["6"] == "late-wide"
    # without a retire callback, drop drift still re-syncs (reference
    # parity): fresh checkpoint + fresh catalog, same narrow batch
    src2 = str(tmp_path / "changes2")
    os.makedirs(src2, exist_ok=True)
    t2 = ParquetMergeTarget(spark, str(tmp_path / "t2"), ["key"], ["name", "nick"])
    cat2 = TxnCatalog(spark, str(tmp_path / "cat2"), {"users": t2})
    cat2.initialize(
        {
            "users": spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("nick", T.StringType()),
                    ]
                ),
            )
        }
    )
    write_changes(src2, "b1.json", [change(1, 1, "INSERT", 7, "x", rel_cols=("name",))])

    def make2():
        return ChangeLogPipeline(
            spark,
            source_dir=src2,
            checkpoint_dir=str(tmp_path / "ckpt2"),
            targets={"users": t2},
            value_cols=["name", "nick"],
            txn_catalog=cat2,
        )

    with pytest.raises(Exception, match="schema drift"):
        run_with_restart(make2, backfill, max_restarts=0)


def test_row_without_rel_cols_is_tolerated(spark, pipeline_env):
    """Regression (r13 review): a change row missing the nullable
    rel_cols field must stay tolerated by the drift check — the struct
    rewrite of the stats agg would otherwise keep a (tbl, NULL) element
    and crash json.loads with TypeError (not a drift error, so the
    supervisor can't recover it)."""
    src, target, pipeline = pipeline_env
    row = change(1, 1, "UPDATE", 1, "NoRel")
    del row["rel_cols"]
    write_changes(src, "b1.json", [row])
    pipeline.run_available()
    got = {r["key"]: r["name"] for r in target.read().collect()}
    assert got["1"] == "NoRel"


def test_retire_then_evolve_absorbs_historical_wide_rows(spark, tmp_path):
    """Regression (r13 review): the retired-extras and evolved-prefix
    absorptions must COMPOSE — a historical row that predates BOTH a
    later retire (advertises the dropped column) and a later evolve
    (misses the added column) is genuinely old data, not drift."""
    from mammoth_spark.sources.target import TxnCatalog

    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    target = ParquetMergeTarget(
        spark, str(tmp_path / "t"), ["key"], ["name", "nick"]
    )
    cat = TxnCatalog(spark, str(tmp_path / "cat"), {"users": target})
    cat.initialize(
        {
            "users": spark.createDataFrame(
                [("1", "seed", "S")],
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("nick", T.StringType()),
                    ]
                ),
            )
        }
    )
    cat.retire_column("users", "nick")
    cat.evolve_schema("users", {"alias": "string"})
    # declared is now [name, alias]; a historical row advertises the
    # ORIGINAL relation [name, nick] — pre-drop AND pre-evolve
    pipeline = ChangeLogPipeline(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        targets={"users": target},
        value_cols=["name", "alias"],
        txn_catalog=cat,
    )
    write_changes(
        src,
        "b1.json",
        [
            dict(
                change(1, 1, "UPDATE", 1, "old-row", rel_cols=("name", "nick")),
                nick="ghost",
            )
        ],
    )
    pipeline.run_available()  # absorbed — no RelationChangedError
    got = {r["key"]: (r["name"], r["alias"]) for r in cat.read("users").collect()}
    assert got["1"] == ("old-row", None)


def test_destructive_drift_still_resyncs_with_evolve_present(spark, tmp_path):
    """A renamed column is NOT additive: even with an evolve callback
    supplied, the supervisor answers with backfill (the reference's
    drop-and-resync), never a silent schema mutation."""
    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    calls = {"backfill": 0, "evolve": 0, "attempt": 0}

    def backfill():
        calls["backfill"] += 1

    def evolve(advertised):
        calls["evolve"] += 1

    def make_pipeline():
        calls["attempt"] += 1
        cols = ["name"] if calls["attempt"] == 1 else ["renamed"]
        target = ParquetMergeTarget(
            spark, str(tmp_path / f"t{calls['attempt']}"), ["key"], cols
        )
        target.initialize(
            spark.createDataFrame(
                [("1", "seed")],
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField(cols[0], T.StringType()),
                    ]
                ),
            )
        )
        return ChangeLogPipeline(
            spark,
            source_dir=src,
            checkpoint_dir=str(tmp_path / f"ckpt{calls['attempt']}"),
            targets={"users": target},
            value_cols=cols,
        )

    write_changes(
        src, "b1.json", [change(1, 1, "INSERT", 5, "x", rel_cols=("renamed",))]
    )
    restarts = run_with_restart(make_pipeline, backfill, evolve=evolve)
    assert restarts == 1
    assert calls["backfill"] == 1 and calls["evolve"] == 0


def test_trailing_drop_column_is_destructive_drift(spark, tmp_path):
    """Regression (round-12 review): rows advertising a PREFIX of the
    declared columns are only legitimate when the missing suffix was
    ADDED BY EVOLUTION (pre-ALTER rows); a prefix missing a column the
    catalog never evolved is an upstream DROP COLUMN — destructive
    drift, full re-sync, never silent absorption."""
    from mammoth_spark.sources.target import TxnCatalog

    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    target = ParquetMergeTarget(spark, str(tmp_path / "t"), ["key"], ["name", "nick"])
    cat = TxnCatalog(spark, str(tmp_path / "cat"), {"users": target})
    cat.initialize(
        {
            "users": spark.createDataFrame(
                [("1", "Taylor", "T")],
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("nick", T.StringType()),
                    ]
                ),
            )
        }
    )
    pipeline = ChangeLogPipeline(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        targets={"users": target},
        value_cols=["name", "nick"],
        txn_catalog=cat,
    )
    # nick was NEVER evolution-added (no schemas record): a row
    # advertising only ("name",) means upstream DROPPED nick
    write_changes(
        src, "b1.json", [change(1, 1, "UPDATE", 1, "Taylor2", rel_cols=("name",))]
    )
    with pytest.raises(Exception, match="RelationChangedError|schema drift"):
        pipeline.run_available()
    # and an EMPTY advertised list is never a valid prefix
    assert pipeline.evolved_value_cols == {}


def test_drop_of_column_evolved_on_other_table_is_destructive(spark, tmp_path):
    """Regression (ADVICE r12): evolved columns are tracked PER TABLE.
    ``nick`` evolution-added on ``orders`` must not excuse ``users``'s
    upstream dropping its own trailing ``nick`` — the old union-of-all-
    tables set silently absorbed that as pre-ALTER rows."""
    from mammoth_spark.sources.target import TxnCatalog

    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    two_col = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("nick", T.StringType()),
        ]
    )
    one_col = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )
    users = ParquetMergeTarget(spark, str(tmp_path / "u"), ["key"], ["name", "nick"])
    orders = ParquetMergeTarget(spark, str(tmp_path / "o"), ["key"], ["name"])
    cat = TxnCatalog(spark, str(tmp_path / "cat"), {"users": users, "orders": orders})
    cat.initialize(
        {
            "users": spark.createDataFrame([("1", "Taylor", "T")], two_col),
            "orders": spark.createDataFrame([("9", "o-one")], one_col),
        }
    )
    cat.evolve_schema("orders", {"nick": "string"})  # orders, NOT users
    pipeline = ChangeLogPipeline(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        targets={"users": users, "orders": orders},
        value_cols=["name", "nick"],
        txn_catalog=cat,
    )
    assert pipeline.evolved_value_cols.get("orders") == {"nick"}
    assert "nick" not in pipeline.evolved_value_cols.get("users", set())
    # a USERS row advertising only ("name",) is an upstream DROP: the
    # orders evolution record must not excuse it
    write_changes(
        src, "b1.json", [change(1, 1, "UPDATE", 1, "Taylor2", rel_cols=("name",))]
    )
    with pytest.raises(Exception, match="RelationChangedError|schema drift"):
        pipeline.run_available()


def test_rejection_rehydration_is_branch_scoped(spark, tmp_path):
    """Regression (ADVICE r12): a pipeline sharing a catalog with
    another pipeline (different wap_branch) must not rehydrate the
    other's rejection history as its own after restart."""
    from mammoth_spark.sources.target import TxnCatalog

    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    target = ParquetMergeTarget(spark, str(tmp_path / "t"), ["key"], ["name"])
    cat = TxnCatalog(spark, str(tmp_path / "cat"), {"users": target})
    cat.initialize(
        {
            "users": spark.createDataFrame(
                [("1", "Taylor")],
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                ),
            )
        }
    )
    cat.record_wap_rejection(7, "other-pipeline", reason="poison batch")
    cat.record_wap_rejection(3, "mine", reason="my own history")
    pipeline = ChangeLogPipeline(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        targets={"users": target},
        value_cols=["name"],
        txn_catalog=cat,
        audit=lambda _cat, _branch, _epoch: True,
        wap_branch="mine",
    )
    assert pipeline.rejected_epochs == [3]
