"""transformWithStateInPandas operators (Spark 4's arbitrary-state API).

The stateful accumulator (streaming/accumulator.py) uses
``applyInPandasWithState`` — the 3.x-era API where each group owns ONE
opaque state tuple. ``transformWithStateInPandas`` is its successor:
named typed state variables (value/list/map), timers, and TTL, managed
by the state store per key. RunningTotalsProcessor is the minimal
production shape — a per-key running aggregate that survives micro-batch
boundaries — kept deliberately small so the API mechanics (init handle,
state round-trip, per-batch emission) are the thing under test.

Scale: state lives in the executor-local state store keyed by the
grouping column, exactly like the accumulator; the stream shuffles once
on the key and each micro-batch touches only the keys it contains.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

TOTALS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("vm", T.LongType()),
    ]
)

TOTALS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_milli", T.LongType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, milli-value sum) across micro-batches.

    Emits the UPDATED running totals for every key seen in the current
    micro-batch; the final emission per key (max n_events — n is
    monotone) is the whole-stream total, which is what the oracle pins.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", TOTALS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, vm = 0, 0
        if self._totals.exists():
            n, vm = self._totals.get()
        for pdf in rows:
            n += len(pdf)
            vm += int(pdf["vm"].sum())
        self._totals.update((n, vm))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_milli": [vm]}
        )

    def close(self) -> None:
        pass


DISTINCT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
    ]
)

_KEY_SCHEMA = T.StructType([T.StructField("k", T.StringType())])
_SEEN_SCHEMA = T.StructType([T.StructField("one", T.IntegerType())])


class DistinctCountProcessor(StatefulProcessor):
    """Per-key exact distinct count via MapState: the state is the SET of
    seen values (map key = value, map value = presence marker), held in
    its own RocksDB column family and mutated incrementally — only NEW
    values write state, so a micro-batch's state traffic is proportional
    to its novelty, not its size. Emits the updated distinct count per
    key per batch; the final (max) emission is the whole-stream count.

    The production shape for "distinct per key" when the key set is
    bounded per entity (user's event types, session's pages); for
    unbounded value domains swap the MapState for an HLL register in a
    ValueState — same processor skeleton.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getMapState("seen", _KEY_SCHEMA, _SEEN_SCHEMA)
        # the count rides in a ValueState so emission never iterates the
        # map (keys() is a state-server round trip per element)
        self._n = handle.getValueState("n", _SEEN_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            # dedupe pandas-side first: state probes per batch = distinct
            # values, not rows (a batch is mostly repeats of few values)
            for v in pdf["v"].astype(str).unique():
                if not self._seen.containsKey((v,)):
                    self._seen.updateValue((v,), (1,))
                    n += 1
        self._n.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_distinct": [n]})

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf on the PYTHONPATH
    (the state-server protocol is protobuf-framed). The build container
    does not ship the PyPI package, so this first tries the shim that
    materializes the gcloud-vendored pure-Python runtime
    (mammoth_spark/protobuf_shim.py) — including exporting PYTHONPATH so
    Spark's Python workers can import it too."""
    from ..protobuf_shim import ensure_protobuf

    if not ensure_protobuf():
        return False
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False


SESSION_GAP_MS = 4 * 3600 * 1000  # 4 h inactivity closes a session

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("timer_ms", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


class SessionTimeoutProcessor(StatefulProcessor):
    """Gap-based sessionization with EVENT-TIME TIMERS — the third TWS
    primitive after ValueState (RunningTotalsProcessor) and MapState
    (DistinctCountProcessor). A session closes two ways:

    - in-batch: a later event arrives more than SESSION_GAP_MS after the
      open session's last event — the closed session is emitted directly;
    - by timer: no further event ever arrives — the registered
      event-time timer (last event + gap) fires once the WATERMARK passes
      it, and handleExpiredTimer emits the session and clears state.

    The timer path is what makes the operator correct on an unbounded
    stream: without it, each key's final session is stuck in state
    forever (exactly the session-window flush that
    session_window_native's built-in operator performs internally).

    Assumes chronologically non-decreasing arrival ACROSS micro-batches
    (the query stages time-range chunk files; within a batch events are
    sorted here) — the same in-order contract Spark's own session windows
    place on the watermark. The stale-timer guard (state records its own
    timer) makes a missed deleteTimer harmless."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", SESSION_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        last_ms, n, timer_ms = None, 0, None
        if self._sess.exists():
            last_ms, n, timer_ms = self._sess.get()
        closed: list[int] = []
        for pdf in rows:
            for t in sorted(int(v) for v in pdf["ms"]):
                if last_ms is None:
                    last_ms, n = t, 1
                elif t - last_ms <= SESSION_GAP_MS:
                    last_ms, n = t, n + 1
                else:
                    closed.append(n)
                    last_ms, n = t, 1
        if timer_ms is not None:
            self._handle.deleteTimer(timer_ms)
        new_timer = last_ms + SESSION_GAP_MS
        self._handle.registerTimer(new_timer)
        self._sess.update((last_ms, n, new_timer))
        if closed:
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(closed), "n_events": closed}
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._sess.exists():
            last_ms, n, timer_ms = self._sess.get()
            # stale-timer guard: only the timer the CURRENT session armed
            # may flush it (a superseded timer that escaped deleteTimer
            # must be a no-op)
            if timer_ms == expiredTimerInfo.getExpiryTimeInMs():
                self._sess.clear()
                yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    def close(self) -> None:
        pass
