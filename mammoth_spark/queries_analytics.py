"""Event-time analytics operators: windowed rollups, sessionization,
as-of joins, hierarchical aggregation, top-k per group.

The reference has none of these (SURVEY §2 Table B: no windows, no joins,
no grouping sets — commit times are carried but unused, reference
sync/db/db.go:118-120). They are first-class for a training-data /
analytics engine, and each is expressed in the shape that scales:
single-shuffle window plans, ROLLUP in one pass instead of unioned
re-scans, rank-filter top-k instead of global sorts.

``events.ts`` is normalized engine-side to epoch-nanos longs (``ts_ns``,
see ``model.ts_ns_expr`` — robust to the fixture surfacing ts as long,
TIMESTAMP_NTZ, or TIMESTAMP); DuckDB reads the same column via
``epoch_ns``. Every query compares only quantities invariant under
sub-microsecond truncation (hour buckets, per-user ordering — (user_id,
ts) is unique at micro precision — and integer-floored values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .model import events_as_change_log, read_table, ts_ns_col, ts_us_expr
from .registry import register

_HOUR_NS = 3_600_000_000_000
_SESSION_GAP_NS = 1_800_000_000_000  # 30 min


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ts_ns_col(ev).alias("ts_ns"),
    )


@register(
    "event_hourly_rollup",
    driver=False,  # r3 rotation: hourly windows evidenced by incremental_agg/grouping_sets
    oracle=f"""
SELECT CAST(floor(epoch_ns(ts) / {_HOUR_NS}.0) AS BIGINT) AS hour_idx,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events
GROUP BY 1, 2
""",
)
def event_hourly_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type. Batch analog of
    ``groupBy(F.window(ts, '1 hour'), type)`` — a single hash aggregation
    with map-side partial combine; in streaming the same plan runs under a
    watermark. Values are per-row floored to milli-units so the aggregate
    is an exact integer on both engines."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        # integer DIV, not floor(double /): epoch-ns exceeds 2^53, so the
        # double quotient can round across an exact hour boundary
        F.expr(f"ts_ns DIV {_HOUR_NS}").alias("hour_idx"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
    )


@register(
    "event_sessionization",
    driver=False,  # r3 rotation: sessionization evidenced by session_window_native
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events
),
d AS (
  SELECT user_id, event_id, tns,
         CASE WHEN lag(tns) OVER (PARTITION BY user_id ORDER BY tns) IS NULL
                OR tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns) > {_SESSION_GAP_NS}
              THEN 1 ELSE 0 END AS is_new
  FROM e
),
s AS (
  SELECT user_id, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY tns
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM d
),
sess AS (
  SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
       max(n) AS max_session_events
FROM sess GROUP BY user_id
""",
)
def event_sessionization_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session): the
    lag -> new-session flag -> running-sum pattern. ONE shuffle on user_id
    serves both window passes and the session aggregation (same partition
    key); Spark's session_window() is the streaming twin. Sub-microsecond
    truncation can't split or merge sessions because per-user timestamps
    are unique at micro precision and gaps sit far from the threshold."""
    ev = _events(spark, sf_dir)
    by_ts = Window.partitionBy("user_id").orderBy("ts_ns")
    run = by_ts.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lagged = ev.select(
        "user_id",
        "event_id",
        "ts_ns",
        F.lag("ts_ns").over(by_ts).alias("prev_ts"),
    )
    flagged = lagged.withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | ((F.col("ts_ns") - F.col("prev_ts")) > _SESSION_GAP_NS),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(run))
    per_session = sessions.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


@register(
    "asof_attribution",
    # r3 rotation: the as-of operator is driver-evidenced by
    # pit_feature_join (same union+window asof_join underneath, plus the
    # DELETE-validity subtlety); the attribution view stays parity- and
    # plan-checked locally (test_asof_join_single_shuffle)
    driver=False,
    oracle="""
SELECT p.event_id, p.user_id, c.event_id AS click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the latest click of the
    same user at-or-before purchase time (operators/asof.py — union +
    single window shuffle, no inequality join). DuckDB's native ASOF LEFT
    JOIN is the independent oracle for the same inclusive contract."""
    from .operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ns"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_ns")
    joined = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts_ns",
        right_on="ts_ns",
        payload_cols=["event_id"],
        prefix="click_",
    )
    return joined.select("event_id", "user_id", F.col("click_event_id"))


@register(
    "orders_rollup",
    # local-only: grouping_sets_agg is the stronger driver entry for the
    # one-pass hierarchy family
    driver=False,
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def orders_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation via ROLLUP (status -> priority -> grand
    total) in ONE pass — Spark expands grouping sets inside a single
    hash aggregate instead of unioning three re-scans of the table."""
    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum(cents).alias("total_cents")
    )


@register(
    "topk_orders_per_status",
    # local-only: generic window-rank pattern, no SURVEY §2 op maps to it;
    # the rank/window machinery stays driver-checked via session queries
    driver=False,
    oracle="""
SELECT o_orderkey, o_orderstatus, rnk FROM (
  SELECT o_orderkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 5
""",
)
def topk_orders_per_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group as rank-filter: one shuffle on the group key, no
    global sort; AQE handles group skew. Deterministic tie-break on the
    key column."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select("o_orderkey", "o_orderstatus", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 5)
    )


@register(
    "streaming_hourly_rollup",
    driver=False,  # r3 rotation: streaming evidenced by 4 other stream entries
    oracle=f"""
SELECT CAST(floor(epoch_ns(ts) / {_HOUR_NS}.0) AS BIGINT) AS hour_idx,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events
GROUP BY 1, 2
""",
)
def streaming_hourly_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows as a REAL Structured Streaming query:
    file-source readStream over the events parquet, a 1-hour watermark,
    ``groupBy(window(ts, '1 hour'), type)``, completed into a memory sink
    with availableNow — then compared against the batch oracle. This is
    the operator a production stream would run continuously (the watermark
    bounds window state; late rows beyond 1 hour are dropped); batch/
    stream result equality is Spark's unified-semantics guarantee, checked
    here rather than assumed. countDistinct is excluded: streaming
    aggregation forbids exact distincts (approx_count_distinct is the
    scale path)."""
    import uuid

    ev_schema = read_table(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.select(
            F.timestamp_micros(ts_us_expr(F.col("ts"), ev_schema["ts"].dataType)).alias("ts_m"),
            "event_type",
            "value",
        )
        .withWatermark("ts_m", "1 hour")
        .groupBy(F.window("ts_m", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
        )
    )
    sink = f"hourly_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        F.floor(F.unix_timestamp(F.col("window.start")) / 3600).cast("bigint").alias("hour_idx"),
        "event_type",
        "n_events",
        "value_milli",
    )


@register(
    "value_percentiles",
    driver=False,  # driver contract at its 50-entry cap; pytest-oracle-checked
    oracle="""
SELECT event_type,
       floor(quantile_cont(value, 0.5) * 1000000) / 1000000 AS p50,
       floor(quantile_cont(value, 0.9) * 1000000) / 1000000 AS p90,
       floor(quantile_cont(value, 0.99) * 1000000) / 1000000 AS p99,
       count(*) AS n
FROM events
GROUP BY event_type
""",
)
def value_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (type-7 quantile —
    the same definition DuckDB's quantile_cont uses, so the oracle is
    exact). Spark's exact `percentile` buffers each group's values on one
    reducer; that is the CORRECTNESS baseline. At 100 TB the same query
    swaps in `percentile_approx` (t-digest sketch: mergeable, bounded
    memory, map-side combinable) and trades a bounded rank error for a
    single streaming pass — sketch accuracy is asserted against this
    exact baseline in tests/test_functions.py."""
    from .functions.numeric import round6

    ev = _events(spark, sf_dir)
    pct = lambda p: round6(F.percentile(F.col("value"), F.lit(p)))  # noqa: E731
    return ev.groupBy("event_type").agg(
        pct(0.5).alias("p50"),
        pct(0.9).alias("p90"),
        pct(0.99).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "event_type_pivot",
    driver=False,  # driver contract at its 50-entry cap; pytest-oracle-checked
    oracle=f"""
SELECT CAST(floor(epoch_ns(ts) / {24 * _HOUR_NS}.0) AS BIGINT) AS day_idx,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY 1
""",
)
def event_type_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot events into one column per type, one row per day. The pivot
    VALUES are passed explicitly — without them Spark runs an extra
    distinct-collect pass over the whole corpus just to learn the column
    list, which at 100 TB is a full scan spent on metadata. With the list
    pinned it is a single hash aggregation, one shuffle on day_idx."""
    ev = _events(spark, sf_dir)
    day = F.expr(f"ts_ns DIV {24 * _HOUR_NS}").alias("day_idx")  # exact: ns > 2^53
    out = ev.groupBy(day).pivot("event_type", list(_EVENT_TYPES)).agg(F.count(F.lit(1)))
    renamed = out.select(
        "day_idx", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES]
    )
    return renamed


@register(
    "sliding_revenue_7d",
    driver=False,
    oracle="""
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM orders GROUP BY 1
)
SELECT day_idx, day_cents,
       CAST(sum(day_cents) OVER (ORDER BY day_idx ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rev_7d_cents
FROM daily
""",
)
def sliding_revenue_7d_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue: pre-aggregate to one row per day (the
    shuffle operates on ~days rows, never the raw fact volume), then a
    single ordered window pass. The unpartitioned window runs on one
    reducer — correct here because the DAILY series is tiny no matter how
    large the fact table; the heavy lifting happened in the map-side
    combinable day aggregation."""
    orders = read_table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ; date arithmetic keeps day_idx free of
    # any session-timezone dependency on both engines
    day = (
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx")
    )
    daily = orders.groupBy(day).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("day_cents")
    )
    from pyspark.sql import Window

    w = Window.orderBy("day_idx").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day_idx",
        F.col("day_cents").cast("bigint").alias("day_cents"),
        F.sum("day_cents").over(w).cast("bigint").alias("rev_7d_cents"),
    )


@register(
    "cdc_apply_multikey",
    driver=False,  # r3 rotation: A9 evidenced by cdc_last_per_key/cdc_compact_exact
    oracle="""
SELECT l_orderkey, l_linenumber, qty FROM (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_linenumber = 2 THEN sum(l_quantity) + 100 ELSE sum(l_quantity) END AS qty
  FROM lineitem WHERE l_linenumber IN (1, 2, 4) GROUP BY 1, 2
  UNION ALL
  SELECT l_orderkey, l_linenumber, sum(l_quantity) AS qty
  FROM lineitem WHERE l_linenumber >= 5 GROUP BY 1, 2
)
""",
)
def cdc_apply_multikey_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 with a COMPOSITE primary key: merge on (l_orderkey,
    l_linenumber) — the reference integration-tests multi-column-PK
    deletes (snowflake_target_integration_test.go, multi-column PK
    scenario); here the change batch mixes UPDATE (linenumber 2),
    DELETE (linenumber 3) and INSERT (linenumber >= 5) against a base of
    linenumbers 1-4, exercising every MERGE branch keyed on both columns.
    The change side broadcasts; the target side never shuffles. The
    synthetic lineitem repeats (orderkey, linenumber) pairs, so both sides
    first aggregate to the unique composite key — the same compaction-
    before-merge precondition the reference enforces."""
    from .operators.merge import merge_upsert

    li = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    base = li.filter(F.col("l_linenumber") <= 4)
    changes = (
        li.filter(F.col("l_linenumber") == 2)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.lit("UPDATE").alias("kind"),
            (F.col("qty") + 100).alias("qty"),
        )
        .unionByName(
            li.filter(F.col("l_linenumber") == 3).select(
                "l_orderkey",
                "l_linenumber",
                F.lit("DELETE").alias("kind"),
                F.lit(None).cast("double").alias("qty"),
            )
        )
        .unionByName(
            li.filter(F.col("l_linenumber") >= 5).select(
                "l_orderkey", "l_linenumber", F.lit("INSERT").alias("kind"), "qty"
            )
        )
    )
    return merge_upsert(base, changes, ["l_orderkey", "l_linenumber"], ["qty"])


@register(
    "streaming_tx_assemble",
    oracle="""
WITH change_log AS (
  SELECT CAST(floor(event_id / 50) AS BIGINT) AS lsn, event_id AS seq FROM events
  WHERE CAST(floor(event_id / 50) AS BIGINT) < 400
)
SELECT lsn AS xid, lsn, count(*) AS n_actions,
       min(seq) AS first_seq, max(seq) AS last_seq
FROM change_log GROUP BY lsn
""",
)
def streaming_tx_assemble_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 as STATEFUL streaming: transactions deliberately split across two
    micro-batches (BEGIN + first-half DML in batch 1, rest + COMMIT in
    batch 2, maxFilesPerTrigger=1) and assembled with
    applyInPandasWithState — buffered state survives the batch boundary and
    each transaction is emitted exactly once on COMMIT, the reference's
    Accumulator contract (message_accumulator.go:42-202). The oracle
    aggregates the same transactions directly. Bounded to one
    reference-sized micro-batch of transactions (~20k actions,
    config.go:49) — the property under test is cross-batch state, not
    volume."""
    import glob
    import os
    import shutil
    from .scratch import scratch_dir
    import uuid

    from pyspark.sql import Window

    from .streaming.accumulator import MESSAGE_SCHEMA, assemble_transactions_stateful

    log = (
        events_as_change_log(read_table(spark, sf_dir, "events"))
        .filter(F.col("lsn") < 400)
        .select("lsn", "seq")
    )
    per_tx = Window.partitionBy("lsn")
    bounds = log.select(
        "lsn", "seq", F.min("seq").over(per_tx).alias("min_seq"), F.max("seq").over(per_tx).alias("max_seq")
    )
    dml = bounds.select(
        F.col("lsn").alias("xid"),
        F.col("seq"),
        F.lit("INSERT").alias("msg_type"),
        F.lit(None).cast("bigint").alias("lsn"),
        F.lit("users").alias("tbl"),
        (F.col("seq") < (F.col("min_seq") + 25)).alias("_first_half"),
    )
    begins = bounds.groupBy(F.col("lsn").alias("xid")).agg(F.min("seq").alias("min_seq")).select(
        "xid",
        (F.col("min_seq") - 1).alias("seq"),
        F.lit("BEGIN").alias("msg_type"),
        F.lit(None).cast("bigint").alias("lsn"),
        F.lit("users").alias("tbl"),
        F.lit(True).alias("_first_half"),
    )
    commits = bounds.groupBy(F.col("lsn").alias("xid")).agg(F.max("seq").alias("max_seq")).select(
        "xid",
        (F.col("max_seq") + 1).alias("seq"),
        F.lit("COMMIT").alias("msg_type"),
        F.col("xid").alias("lsn"),
        F.lit("users").alias("tbl"),
        F.lit(False).alias("_first_half"),
    )
    messages = dml.unionByName(begins).unionByName(commits)

    # two causal groups -> two micro-batches: BEGIN + first-half DML, then
    # second-half DML + COMMIT. coalesce(1) pins each group to exactly ONE
    # part file (single partition), so within-group file splits — which
    # could reorder a DML before its BEGIN — cannot occur; order across the
    # two files is fixed by mtime.
    src = scratch_dir(prefix="tx_msgs_")
    messages.persist()  # both half-writes consume the same window chain
    try:
        for i, first in enumerate([True, False]):
            part_dir = scratch_dir(prefix=f"tx_half{i}_")
            messages.filter(F.col("_first_half") == first).drop("_first_half").coalesce(
                1
            ).write.mode("overwrite").json(part_dir)
            (part,) = glob.glob(os.path.join(part_dir, "part-*.json"))
            dst = os.path.join(src, f"batch_{i:03d}.json")
            shutil.move(part, dst)
            os.utime(dst, (1_000_000 + i, 1_000_000 + i))  # deterministic batch order
    finally:
        messages.unpersist()

    stream = (
        spark.readStream.schema(MESSAGE_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    assembled = assemble_transactions_stateful(stream)
    sink = f"tx_assemble_{uuid.uuid4().hex[:8]}"
    # state-store partition count is pinned by the conf at query start; a
    # few hundred tx keys need nowhere near the batch default of 32
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            assembled.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", scratch_dir(prefix="tx_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(sink)


@register(
    "session_window_native",
    # r3 rotation: session semantics evidenced by event_sessionization parity
    # + 5 streaming driver entries; slot freed for event_pattern_detect
    driver=False,
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS tns FROM events
),
d AS (
  SELECT user_id, tns,
         CASE WHEN lag(tns) OVER (PARTITION BY user_id ORDER BY tns) IS NULL
                OR tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns) > {_SESSION_GAP_NS}
              THEN 1 ELSE 0 END AS is_new
  FROM e
),
s AS (
  SELECT user_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tns
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM d
)
SELECT user_id, session_id, count(*) AS n_events
FROM s GROUP BY user_id, session_id
""",
)
def session_window_native_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (30-min gap) cross-checked
    against the portable lag+running-sum sessionization SQL — two
    independent formulations of the same semantics. session_window is the
    streaming-capable form (state-store backed under a watermark); the
    oracle's window-function form is what any SQL engine can run. Session
    ids are ordinal-by-start on both sides."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.timestamp_micros(
            F.floor(F.col("ts_ns").cast("decimal(38,0)") / F.lit(1000)).cast("bigint")
        ).alias("ts_m"),
    )
    sessions = ev.groupBy(
        F.session_window("ts_m", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    by_start = Window.partitionBy("user_id").orderBy(F.col("w.start"))
    return sessions.select(
        "user_id", F.row_number().over(by_start).alias("session_id"), "n_events"
    )


@register(
    "incremental_agg_maintenance",
    oracle="""
WITH change_log AS (
  SELECT CAST(floor(event_id / 50) AS BIGINT) AS lsn,
         event_id AS seq,
         CASE WHEN event_type = 'signup' THEN 'INSERT'
              WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END AS kind,
         CAST(user_id AS BIGINT) AS key,
         value
  FROM events
),
norm AS (
  SELECT key, lsn, seq, value, kind AS orig_kind,
         row_number() OVER (PARTITION BY key ORDER BY seq) AS rn,
         count(*) OVER (PARTITION BY key) AS cnt
  FROM change_log
),
valid AS (
  SELECT key, lsn, seq, value,
         CASE WHEN rn = 1 THEN 'INSERT'
              WHEN rn = cnt AND orig_kind = 'DELETE' THEN 'DELETE'
              ELSE 'UPDATE' END AS kind
  FROM norm
),
agg AS (
  SELECT key,
         arg_max(kind, seq) AS last_kind,
         arg_max(value, CASE WHEN kind <> 'DELETE' THEN seq END) AS value
  FROM valid GROUP BY key
),
live AS (
  SELECT key, CAST(floor(value * 10) AS BIGINT) AS bucket
  FROM agg WHERE last_kind <> 'DELETE'
)
SELECT bucket, count(*) AS n_rows FROM live GROUP BY bucket
""",
)
def incremental_agg_maintenance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental VIEW MAINTENANCE from the change log: a materialized
    per-bucket row count is maintained across two micro-batches WITHOUT
    recomputation — each batch is compacted, joined (broadcast) against
    the maintained base to recover pre-image buckets, and the aggregate is
    updated by +/- deltas (insert +1 in new bucket, delete -1 in old,
    update moves -1/+1). The oracle recomputes the final aggregate from
    scratch over normalized-valid chains; equality proves the delta
    algebra. This is the CDC engine's payoff capability: downstream
    aggregates stay fresh at micro-batch latency with work proportional
    to the CHANGE volume, not the table size. localCheckpoint stands in
    for the per-batch target write a production run does anyway
    (ParquetMergeTarget); at cluster scale base and agg ARE tables."""
    from .operators.compact import compact_last_wins
    from .operators.merge import merge_upsert

    raw = events_as_change_log(read_table(spark, sf_dir, "events")).select(
        "lsn", "seq", "key", "kind", "value"
    )
    # normalize to valid chains over the WHOLE log (the invariant real WAL
    # provides; raw fixture kinds are event types, not true WAL ops)
    w = Window.partitionBy("key").orderBy("seq")
    wall = Window.partitionBy("key")
    log = raw.select(
        "lsn",
        "seq",
        "key",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("cnt"),
        "kind",
    ).select(
        "lsn",
        "seq",
        "key",
        "value",
        F.when(F.col("rn") == 1, F.lit("INSERT"))
        .when((F.col("rn") == F.col("cnt")) & (F.col("kind") == "DELETE"), F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
        .alias("kind"),
    )
    bucket_of = lambda c: F.floor(c * 10).cast("bigint")  # noqa: E731

    base = None  # maintained base table: key -> value
    agg = None  # maintained aggregate: bucket -> n_rows
    for lo, hi in [(0, 1000), (1000, 1 << 62)]:
        batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        # pinned once per epoch (r13): both maintained tables consume it
        # (pre-image join AND base merge), and each ran the compaction
        # window from scratch at its own checkpoint
        net = compact_last_wins(batch, ["key"], ["value"]).select(
            "key", "kind", "value"
        ).localCheckpoint()
        if base is None:
            # bootstrap: first batch IS the initial state; the aggregate
            # derives from the CHECKPOINTED base so its own
            # materialization re-reads pinned rows, not the window chain
            base = (
                net.filter(F.col("kind") != "DELETE")
                .select("key", "value")
                .localCheckpoint()
            )
            agg = base.groupBy(bucket_of(F.col("value")).alias("bucket")).agg(
                F.count(F.lit(1)).alias("n_rows")
            ).localCheckpoint()
            continue
        # pre-image lookup: broadcast the compacted change set at the base
        pre = net.alias("c").join(
            base.alias("b").withColumnRenamed("value", "old_value"), on="key", how="left"
        )
        # delta per bucket: -1 for vacated pre-image, +1 for occupied post-image
        minus = (
            pre.filter(F.col("old_value").isNotNull())
            .select(bucket_of(F.col("old_value")).alias("bucket"))
            .groupBy("bucket")
            .agg((-F.count(F.lit(1))).alias("d"))
        )
        plus = (
            pre.filter(F.col("kind") != "DELETE")
            .select(bucket_of(F.col("c.value")).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        deltas = minus.unionByName(plus).groupBy("bucket").agg(F.sum("d").alias("d"))
        # broadcast-decomposed additive merge (a broadcast hint on a
        # full-outer join is dropped — see merge_additive_delta); the
        # maintained aggregate is bucket-sized here, but the plan should
        # still show the shape that survives a key-cardinality aggregate
        agg = merge_additive_delta(agg, deltas, "bucket", "n_rows", "d").filter(
            F.col("n_rows") > 0
        )
        # maintain the base for the next batch's pre-image lookups
        base = merge_upsert(base, net, ["key"], ["value"]).localCheckpoint()
        agg = agg.localCheckpoint()
    return agg


@register(
    "incremental_join_maintenance",
    oracle="""
WITH change_log AS (
  -- signup maps to UPDATE here, not INSERT: the fixture's user keys
  -- collide with pre-existing customer keys, violating the CDC
  -- invariant the reference's (I,D)->nothing compaction rule relies on
  -- (INSERT only for novel keys, multi_row_action.go:103-180). Against
  -- an upsert target the two kinds apply identically, and upsert
  -- semantics keep whole-log compaction == any sequential batch split.
  SELECT CAST(floor(event_id / 50) AS BIGINT) AS lsn,
         event_id AS seq,
         CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END AS kind,
         CAST(user_id AS BIGINT) AS key,
         value
  FROM events
),
agg AS (
  SELECT key,
         arg_max(kind, seq) AS last_kind,
         arg_max(value, CASE WHEN kind <> 'DELETE' THEN seq END) AS value
  FROM change_log GROUP BY key
),
compacted AS (
  SELECT key,
         CASE WHEN last_kind = 'DELETE' THEN 'DELETE' ELSE 'UPDATE' END AS kind,
         value
  FROM agg
),
dim AS (
  SELECT coalesce(t.c_custkey, c.key) AS c_custkey,
         CASE WHEN c.kind IS NULL THEN t.c_acctbal ELSE c.value END AS bal
  FROM customer t FULL OUTER JOIN compacted c ON t.c_custkey = c.key
  WHERE coalesce(c.kind, '') <> 'DELETE'
)
SELECT o.o_orderkey, d.c_custkey,
       CAST(floor(d.bal * 1000) AS BIGINT) AS acctbal_milli
FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
""",
)
def incremental_join_maintenance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view — the delta
    rule of incremental view maintenance applied to enrichment joins:
    V = orders ⋈ customer is kept fresh under a customer change stream
    WITHOUT re-joining the fact table. Per batch, the compacted change
    set broadcasts; the view drops rows whose dimension key was touched
    (broadcast anti-join — the big view never shuffles) and re-derives
    ONLY those keys' rows by joining the fact against the broadcast
    change set. Work per batch ∝ change volume x fan-out of the touched
    keys, never ∝ |V| or |orders| — the join-view counterpart of
    incremental_agg_maintenance, and together they are the full IVM
    delta algebra (dL ⋈ R refresh + group-delta fold). The oracle
    recomputes orders ⋈ (customer after all changes) from scratch;
    equality across two sequential micro-batches proves the rule.

    The fact-side probe here scans orders per batch (fixture-sized); at
    100 TB the fact is bucketed/z-ordered by the join key so the probe
    prunes to the touched keys' files — same plan shape either way."""
    from .operators.compact import compact_last_wins

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.col("c_acctbal").alias("bal"),
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").cast("bigint").alias("o_custkey")
    )
    log = events_as_change_log(read_table(spark, sf_dir, "events")).select(
        "lsn",
        "seq",
        "key",
        # INSERT -> UPDATE: the synthetic log's keys collide with
        # pre-existing customer keys (violating the CDC invariant the
        # (I,D)->nothing rule assumes); against an upsert-applied view
        # the kinds are equivalent, and upsert semantics make the
        # maintenance result independent of how the log is batched —
        # sf0.1 exposed the divergence (an I...D pair split across the
        # two batches deletes sequentially but nets to nothing when
        # compacted whole)
        F.when(F.col("kind") == "INSERT", F.lit("UPDATE"))
        .otherwise(F.col("kind"))
        .alias("kind"),
        "value",
    )
    milli = lambda c: F.floor(c * 1000).cast("bigint")  # noqa: E731

    view = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "c_custkey", F.col("bal").alias("bal"))
    view = view.localCheckpoint()

    for lo, hi in [(0, 1000), (1000, 1 << 62)]:
        batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        net = compact_last_wins(batch, ["key"], ["value"]).select(
            "key", "kind", "value"
        )
        view = maintain_join_view(view, orders, net).localCheckpoint()
    return view.select("o_orderkey", "c_custkey", milli(F.col("bal")).alias("acctbal_milli"))


def maintain_join_view(view: DataFrame, orders: DataFrame, net: DataFrame) -> DataFrame:
    """One IVM batch for V = orders ⋈ customer: drop touched keys' rows
    (broadcast anti-join) + re-derive them from the fact against the
    broadcast change set. Exposed for the plan assertion in
    tests/test_plans.py — the checkpointed loop hides per-batch plans."""
    net = F.broadcast(net)
    kept = view.join(
        net.select("key"), view["c_custkey"] == F.col("key"), "left_anti"
    )
    refreshed = orders.join(
        net.filter(F.col("kind") != "DELETE"),
        orders["o_custkey"] == F.col("key"),
    ).select(
        "o_orderkey",
        F.col("key").alias("c_custkey"),
        F.col("value").alias("bal"),
    )
    return kept.unionByName(refreshed)


IVM_TOPK_K = 15


def merge_additive_delta(
    base: DataFrame, delta: DataFrame, key: str, val: str, d: str
) -> DataFrame:
    """Additive merge of a small per-batch delta into a large maintained
    aggregate WITHOUT shuffling the base. Spark has no broadcast
    full-outer hash join — ``base.join(broadcast(delta), how='full_outer')``
    silently plans a SortMergeJoin that shuffles BOTH sides (the same
    dropped-hint trap operators/merge.py documents for MERGE), so the
    decomposition here mirrors merge_upsert's:

      updated  = base LEFT JOIN broadcast(delta)      -- one narrow pass,
                 val + coalesce(d, 0)                 -- base never moves
      existing = base LEFT SEMI broadcast(delta)      -- <= |delta| rows
      inserts  = delta LEFT ANTI broadcast(existing)  -- tiny vs tiny

    Two narrow scans of the base, zero base-side exchanges; asserted on
    the executed plan in tests/test_round4_ops.py.

    PRECONDITION: ``key`` is unique in BOTH inputs (they are maintained
    aggregates). A duplicated key in ``delta`` would fan out base rows
    through the left join and the union would double-count; callers
    must pre-aggregate to one row per key (both current callers do)."""
    updated = base.join(F.broadcast(delta), on=key, how="left").select(
        key,
        (F.coalesce(F.col(val), F.lit(0)) + F.coalesce(F.col(d), F.lit(0))).alias(val),
    )
    existing = base.join(F.broadcast(delta), on=key, how="left_semi").select(key)
    inserts = delta.join(F.broadcast(existing), on=key, how="left_anti").select(
        key, F.col(d).cast("long").alias(val)
    )
    return updated.unionByName(inserts)


@register(
    "incremental_topk_maintenance",
    oracle=f"""
WITH counts AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
topk AS (
  SELECT user_id, n_events,
         CAST(row_number() OVER (ORDER BY n_events DESC, user_id) AS BIGINT) AS rank
  FROM counts ORDER BY n_events DESC, user_id LIMIT {IVM_TOPK_K}
)
SELECT rank, user_id, n_events, TRUE AS matches_recompute FROM topk
""",
)
def incremental_topk_maintenance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a TOP-K view (heaviest users by event
    count) — the ranking member of the IVM family
    (incremental_agg_maintenance: group-delta fold;
    incremental_join_maintenance: dL ⋈ R refresh; incremental_hll /
    topk_sketch_merge: mergeable sketches). Top-k is NOT directly
    delta-maintainable — an item outside the current top-k can rise into
    it, so the maintained state must be the full per-key count aggregate,
    with top-k as a cheap READ over it. That decomposition is the point:
    per batch the delta's per-key counts (work ∝ batch) merge into the
    maintained aggregate via merge_additive_delta — the broadcast-
    DECOMPOSED form (left join + semi/anti), because a broadcast hint on
    a full-outer join is silently dropped and would sort-merge-shuffle
    the whole aggregate every batch — and the top-k read is a
    TakeOrderedAndProject over the aggregate, never a re-shuffle of the
    fact history. The output carries a per-row ``matches_recompute``
    comparing the incremental path's top-k against a from-scratch
    recompute at the same rank; the oracle pins it TRUE. Ties break by
    user_id asc in both paths, so ranks are deterministic cross-engine."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").cast("bigint").alias("user_id")
    )
    agg = None  # maintained aggregate: user_id -> n_events
    for lo, hi in [(0, 600), (600, 1 << 62)]:
        batch = ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        delta = batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("d"))
        if agg is None:
            agg = delta.select("user_id", F.col("d").alias("n_events"))
        else:
            agg = merge_additive_delta(agg, delta, "user_id", "n_events", "d")
        agg = agg.localCheckpoint()
    w = Window.orderBy(F.desc("n_events"), "user_id")
    topk = (
        agg.orderBy(F.desc("n_events"), "user_id")
        .limit(IVM_TOPK_K)
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )
    recompute = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rc_n"))
        .orderBy(F.desc("rc_n"), "user_id")
        .limit(IVM_TOPK_K)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("rc_n"), "user_id"))
            .cast("bigint")
            .alias("rank"),
            F.col("user_id").alias("rc_user"),
            "rc_n",
        )
    )
    return topk.join(F.broadcast(recompute), on="rank").select(
        "rank",
        "user_id",
        "n_events",
        (
            (F.col("user_id") == F.col("rc_user"))
            & (F.col("n_events") == F.col("rc_n"))
        ).alias("matches_recompute"),
    )


@register(
    "stream_stream_attribution",
    driver=False,
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
)
SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
       v.ts_us AS view_ts_us, p.ts_us AS purchase_ts_us
FROM ev v JOIN ev p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts_us >= v.ts_us AND p.ts_us <= v.ts_us + 3600000000
""",
)
def stream_stream_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join — the Structured Streaming operator whose
    state discipline matters most at scale: views and purchases arrive as
    two unbounded streams; the time-range predicate (purchase within 1 h
    of the view) plus watermarks on BOTH sides is what lets Spark evict
    buffered rows instead of holding both streams forever. Timestamps
    ride as exact integer-division micros (`ts div 1000` — float division
    of epoch-nanos loses precision past 2^53). Result must equal the
    batch join, which is the oracle."""
    import uuid

    ev_schema = read_table(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_us = ts_us_expr(F.col("ts"), ev_schema["ts"].dataType)
    base = stream.select(
        "event_id",
        "user_id",
        "event_type",
        ts_us.alias("ts_us"),
        F.timestamp_micros(ts_us).alias("ts_m"),
    )
    views = (
        base.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts_us").alias("view_ts_us"),
            F.col("ts_m").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("ts_m").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("interval 1 hour")),
    ).select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        "view_ts_us",
        "purchase_ts_us",
    )
    sink = f"ss_attr_{uuid.uuid4().hex[:8]}"
    # stream-stream join state partitions = shuffle partitions at query
    # start; both state stores here hold a bounded hour of per-user rows,
    # so fewer partitions beat paying 32 state-store instantiations per
    # batch (r14 A/B: 4 parts min 2.34 s vs 8 parts 2.73 s vs 32 ~the
    # r13 floor; production sizes this by state volume, not a constant)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(sink)


@register(
    "user_rolling_features",
    driver=False,
    oracle=f"""
WITH daily AS (
  SELECT user_id,
         CAST(floor(epoch_ns(ts) / {24 * _HOUR_NS}.0) AS BIGINT) AS day_idx,
         count(*) AS n,
         CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v_milli
  FROM events GROUP BY 1, 2
)
SELECT user_id, day_idx,
       CAST(n AS BIGINT) AS n_events,
       v_milli,
       CAST(sum(n) OVER w AS BIGINT) AS n_7d,
       CAST(sum(v_milli) OVER w AS BIGINT) AS v_milli_7d,
       CAST(count(*) OVER w AS BIGINT) AS active_days_7d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day_idx
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def user_rolling_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-7-day behavior features (the feature-engineering
    workhorse): pre-aggregate to (user, day) FIRST — the rolling window
    then runs over the small daily series with a RANGE frame (value-based,
    so gaps in activity are handled without densifying), partitioned by
    user. The raw event volume is touched exactly once, in a map-side
    combinable aggregation; the window shuffle moves only user-day rows."""
    ev = _events(spark, sf_dir)
    day = F.expr(f"ts_ns DIV {24 * _HOUR_NS}").alias("day_idx")  # exact: ns > 2^53
    daily = ev.groupBy("user_id", day).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
        .cast("bigint")
        .alias("v_milli"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day_idx",
        "n_events",
        "v_milli",
        F.sum("n_events").over(w).cast("bigint").alias("n_7d"),
        F.sum("v_milli").over(w).cast("bigint").alias("v_milli_7d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("active_days_7d"),
    )


# ----------------------- multi-level aggregation -----------------------


@register(
    "grouping_sets_agg",
    # r3 rotation: grouping-set expansion is a Catalyst built-in whose
    # single-Expand plan is asserted via orders_rollup; slot freed for
    # incremental_hll_maintenance. Parity-checked locally.
    driver=False,
    oracle="""
SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN NULL ELSE l_returnflag END AS l_returnflag,
       CASE WHEN GROUPING(l_linestatus) = 1 THEN NULL ELSE l_linestatus END AS l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def grouping_sets_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS in ONE pass: detail, per-flag subtotal, and grand
    total come out of a single Expand + hash aggregate instead of three
    separate scans unioned together — at 100 TB that is one fact read
    instead of three. grouping_id disambiguates the NULLs that Expand
    introduces (a real NULL group vs a rolled-up level), exactly the
    hierarchy-report shape BI layers compile to. Spark's grouping()
    matches DuckDB's GROUPING() bit-for-bit, asserted by the oracle.
    """
    li = read_table(spark, sf_dir, "lineitem")
    gs = li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    )
    return gs.agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("bigint")
        .alias("gid"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
    )


# ----------------------- ordered conversion funnel -----------------------


@register(
    "conversion_funnel",
    driver=False,
    oracle="""
WITH e AS (
  SELECT user_id, event_type AS et, epoch_ns(ts) AS tns FROM events
),
s AS (
  SELECT user_id, min(CASE WHEN et = 'signup' THEN tns END) AS t_signup
  FROM e GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.tns) AS t_click
  FROM e JOIN s ON e.user_id = s.user_id
  WHERE e.et = 'click' AND e.tns > s.t_signup
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.tns) AS t_purchase
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.et = 'purchase' AND e.tns > c.t_click
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM s WHERE t_signup IS NOT NULL) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after
""",
)
def conversion_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED conversion funnel (signup -> first later click -> first
    later purchase): the product-analytics staple where stage N must
    happen strictly AFTER stage N-1, not merely co-occur. Three per-user
    conditional min-aggregations chained through joins. The stage-1 set
    (every user with a signup) is proportional to the user population,
    so its join strategy is left to the optimizer (AQE picks broadcast
    only when the measured size allows — an unconditional hint here
    could OOM the driver at 100 TB); the later stages only shrink, so
    the c-side join keeps an explicit broadcast. No window sort, no
    per-user event array materialization."""
    ev = _events(spark, sf_dir)
    s = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts_ns"))).alias(
                "t_signup"
            )
        )
        .filter(F.col("t_signup").isNotNull())
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts_ns") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts_ns") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_purchase"))
    )
    counts = [
        s.agg(F.count(F.lit(1)).cast("bigint").alias("n")).withColumn("_k", F.lit(1)),
        c.agg(F.count(F.lit(1)).cast("bigint").alias("n")).withColumn("_k", F.lit(1)),
        p.agg(F.count(F.lit(1)).cast("bigint").alias("n")).withColumn("_k", F.lit(1)),
    ]
    return (
        counts[0]
        .select(F.col("n").alias("n_signup"), "_k")
        .join(counts[1].select(F.col("n").alias("n_click_after"), "_k"), "_k")
        .join(counts[2].select(F.col("n").alias("n_purchase_after"), "_k"), "_k")
        .drop("_k")
    )


# ------------------- stream-static broadcast enrichment -------------------


@register(
    "streaming_enrich_static",
    driver=False,
    oracle="""
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events e
JOIN nation n ON (e.user_id % 25) = n.n_nationkey
GROUP BY n.n_name
""",
)
def streaming_enrich_static_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join — the CDC-downstream staple the
    other streaming queries don't cover (stream_stream_attribution is
    stream-stream; the pipelines join inside foreachBatch). The event
    stream joins a slowly-changing dimension snapshot; Spark broadcasts
    the static side into every micro-batch, so the stream NEVER shuffles
    for the join and no state store is involved (unlike stream-stream).
    The per-micro-batch re-resolve of the static relation is exactly how
    a dimension refresh propagates without restarting the query. Result
    must equal the batch join (the oracle) — unified-semantics checked,
    not assumed."""
    import uuid

    ev_schema = read_table(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = stream.select(
        (F.col("user_id") % 25).alias("nk"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
    ).join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
    agg = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("vm").cast("bigint").alias("value_milli"),
    )
    sink = f"enrich_static_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select("n_name", "n_events", "value_milli")


# ----------------- transformWithState running totals -----------------


@register(
    "streaming_tws_totals",
    # Exported in round 4 (registry.DRIVER_EXPORT): the TWS worker
    # protocol needs the protobuf shim on PYTHONPATH BEFORE the session
    # JVM launches; __spark_entry__ now calls ensure_protobuf() at
    # import time, so this records a driver row if the harness imports
    # the module pre-session — else the error is the documented
    # negative result (VERDICT r03 next-round #3).
    driver=True,
    oracle="""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events WHERE user_id < 2000 GROUP BY user_id
""",
)
def streaming_tws_totals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` (streaming/tws.py): per-key
    running totals held in a named ValueState column family across
    micro-batches (maxFilesPerTrigger=1 over a 3-file source), final
    per-key emission equal to the batch aggregate (the oracle). This is
    the arbitrary-stateful-processor successor to
    applyInPandasWithState — named typed state, timers, TTL — and the
    registered proof that the engine's custom stateful operators run on
    the modern API, not only the 3.x one.

    Scale shape: the stream shuffles ONCE on the key; each micro-batch
    touches only the keys it contains, and state lives in the
    executor-local RocksDB store (TWS keeps each state variable in its
    own column family, which the default HDFS provider rejects)."""
    from .scratch import scratch_dir
    import uuid

    import pytest

    from .streaming.tws import (
        TOTALS_OUTPUT_SCHEMA,
        RunningTotalsProcessor,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState unavailable")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # state-partition count follows KEY volume, not CPU count: every
    # (partition x micro-batch) pays a RocksDB open/commit, so 32 CPUs
    # x 3 batches = 96 store lifecycles dominate a small-key stream;
    # 8 partitions cuts that 4x with zero effect on results
    prev_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # fixture knob: bound the keyed-state population so the micro-
        # bench exercises cross-batch state, not 19k key round trips
        ev = (
            read_table(spark, sf_dir, "events")
            .filter(F.col("user_id") < 2000)
            .select(
                "user_id", F.floor(F.col("value") * 1000).cast("bigint").alias("vm")
            )
        )
        src = scratch_dir(prefix="tws_src_")
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
        sink = f"tws_totals_q_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception as exc:
            # Self-documenting negative result for the driver contract
            # (VERDICT r03 next-round #3): the TWS state-server workers
            # resolve mammoth_spark + google.protobuf from the
            # PYTHONPATH the JVM was LAUNCHED with. __spark_entry__
            # exports both at import time; if this still failed, the
            # harness created its SparkSession before importing the
            # module, which no session-level mechanism can repair.
            raise RuntimeError(
                "transformWithState workers could not run. This query "
                "requires __spark_entry__ to be imported BEFORE the "
                "SparkSession exists (its import-time ensure_protobuf() "
                "exports the worker PYTHONPATH); a pre-existing JVM is "
                "the documented negative result — see registry.py. "
                f"Underlying: {type(exc).__name__}: {str(exc)[:400]}"
            ) from exc
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuf)
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    # append mode emits the running totals per key per batch; the final
    # state is the largest n_events emission for each key
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "value_milli"), F.col("n_events")
            ).alias("f")
        )
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("f.n_events").alias("n_events"),
            F.col("f.value_milli").alias("value_milli"),
        )
    )


@register(
    "streaming_tws_distinct",
    driver=False,  # same pre-JVM protobuf-shim constraint as streaming_tws_totals
    oracle="""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct
FROM events WHERE user_id < 500 GROUP BY user_id
""",
)
def streaming_tws_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithState MapState: per-user exact distinct event types
    across micro-batches — the state is the seen-value SET in a RocksDB
    column family, so each batch writes only its NOVEL values (state
    traffic ∝ novelty, not batch size). Complements
    streaming_tws_totals' ValueState with the second state primitive;
    final per-key emission equals the batch count(DISTINCT) oracle."""
    from .scratch import scratch_dir
    import uuid

    import pytest

    from .streaming.tws import (
        DISTINCT_OUTPUT_SCHEMA,
        DistinctCountProcessor,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState unavailable")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # state-partition count follows KEY volume, not CPU count: every
    # (partition x micro-batch) pays a RocksDB open/commit, so 32 CPUs
    # x 3 batches = 96 store lifecycles dominate a small-key stream;
    # 8 partitions cuts that 4x with zero effect on results
    prev_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # tighter cap than the totals twin: MapState costs ~8 state
        # round trips per key-batch (containsKey per novel value + the
        # counter) vs ValueState's 2 — same cross-batch evidence
        ev = (
            read_table(spark, sf_dir, "events")
            .filter(F.col("user_id") < 500)
            .select("user_id", F.col("event_type").alias("v"))
        )
        src = scratch_dir(prefix="tws_dsrc_")
        ev.repartition(3).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("user_id bigint, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=DistinctCountProcessor(),
            outputStructType=DISTINCT_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
        sink = f"tws_distinct_q_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuf)
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.max("n_distinct").alias("n_distinct"))
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
        )
    )


# ----------------- streaming dedup within watermark -----------------


@register(
    "streaming_dedup_watermark",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       event_type
FROM events
""",
)
def streaming_dedup_watermark_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT dedup via dropDuplicatesWithinWatermark: the
    at-least-once-ingest companion (Kafka redelivery, retried file
    lands twice) — the source dir holds TWO copies of the event file
    and the operator must emit each event_id once. Unlike plain
    dropDuplicates, the watermark BOUNDS the key state: ids older than
    the delay are evicted, so state is O(events-per-window), not
    O(stream-lifetime) — the only formulation that survives an unbounded
    100 TB stream. The cross-batch + late-arrival behavior is pinned
    separately in tests/test_streaming.py; result equals SELECT DISTINCT
    (the oracle) because duplicates are exact copies."""
    import shutil
    from .scratch import scratch_dir
    import uuid

    ev_schema = read_table(spark, sf_dir, "events").schema
    src = scratch_dir(prefix="dupsrc_")
    for i in range(2):
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/copy_{i}.parquet")

    stream = spark.readStream.schema(ev_schema).parquet(src)
    # watermarks need TIMESTAMP (NTZ is rejected); epoch-based conversion
    with_ts = stream.select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros(ts_us_expr(F.col("ts"), ev_schema["ts"].dataType)).alias(
            "ts_m"
        ),
    )
    deduped = (
        with_ts.withWatermark("ts_m", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    sink = f"dedup_wm_{uuid.uuid4().hex[:8]}"
    # state partitions = shuffle partitions at query start (the repo's
    # streaming convention, r13 here): the watermark bounds state to one
    # window of ids, so 8 partitions beats paying 32 state-store
    # instantiations per micro-batch
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(sink).select(
        F.col("event_id").cast("bigint"),
        F.col("user_id").cast("bigint"),
        "event_type",
    )


# ------------------- time-series gap-fill + LOCF -------------------


@register(
    "gapfill_interpolate",
    oracle="""
WITH e AS (
  SELECT user_id,
         CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS h,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
hourly AS (
  SELECT user_id, h, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM e GROUP BY user_id, h
),
span AS (
  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM span
),
filled AS (
  SELECT g.user_id, g.h, hr.n, hr.s,
         last_value(hr.s IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
  FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_hours,
       CAST(sum(coalesce(s, carried, 0)) AS BIGINT) AS filled_sum_cents
FROM filled GROUP BY user_id
""",
)
def gapfill_interpolate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill with last-observation-carried-forward (LOCF):
    the regularization step every metrics/feature pipeline needs before
    windowed models — missing hours must EXIST (as rows) and carry the
    last seen value.

    Spark shape, sized for 100 TB of events:

    - bucket to hours and pre-aggregate FIRST (one keyed shuffle; the raw
      event volume collapses to |user|x|active hours| before anything
      widens);
    - per-user spans come from that aggregate, and the dense grid is
      ``explode(sequence(h0, h1))`` — a narrow per-row generator, never a
      driver-side range or a cross join against a global calendar;
    - LOCF is ``last(value, ignorenulls=True)`` over a per-user window —
      partitioned by the grid's own key, so no global sort exists
      anywhere in the plan. The result re-aggregates to one row per user
      so the checked surface stays compact while the full grid is still
      materialized and folded distributedly.

    The reference has no time-series surface (SURVEY §2 Table B); this is
    the Spark-native capability its change streams feed."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    hourly = (
        ev.select(
            "user_id",
            F.expr("ts_ns DIV 3600000000000").alias("h"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id", "h")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    span = hourly.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = span.select(
        "user_id", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    filled = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    locf = filled.withColumn("carried", F.last("s", ignorenulls=True).over(w))
    return locf.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum(F.when(F.col("n").isNull(), 1).otherwise(0)).cast("bigint").alias(
            "n_gap_hours"
        ),
        F.sum(F.coalesce(F.col("s"), F.col("carried"), F.lit(0)))
        .cast("bigint")
        .alias("filled_sum_cents"),
    )


# ------------------- ordered event-pattern detection -------------------


@register(
    "event_pattern_detect",
    oracle="""
WITH sub AS (
  SELECT user_id, event_id, event_type AS et, epoch_ns(ts) AS tns
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
seq AS (
  SELECT user_id, event_id, et, tns,
         lead(et, 1) OVER w AS et1, lead(tns, 1) OVER w AS t1,
         lead(et, 2) OVER w AS et2, lead(tns, 2) OVER w AS t2
  FROM sub
  WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(event_id) AS BIGINT) AS first_match_event
FROM seq
WHERE et = 'view' AND et1 = 'click' AND et2 = 'purchase'
  AND t1 - tns <= 1800000000000 AND t2 - t1 <= 1800000000000
GROUP BY user_id
""",
)
def event_pattern_detect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-shaped sequential pattern detection: occurrences of
    view -> click -> purchase where each step follows the previous within
    30 minutes, with no other pattern-relevant event in between (strict
    adjacency on the filtered subsequence — the CEP semantic).

    Spark shape: filter to the three relevant types FIRST (pushed to the
    scan), then two ``lead()``s over a per-user event-time window. The
    only exchange is the hash partition by user; the sort is per-user
    within partitions. No self-joins — the naive 3-way time-range
    self-join is quadratic per user, while the window formulation is
    O(n log n_user) and shuffles once. Tie-break (ts, event_id) makes the
    window total order deterministic cross-engine."""
    from pyspark.sql import Window

    half_hour_ns = 1_800_000_000_000
    sub = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = sub.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("et"),
        "ts_ns",
        F.lead("event_type", 1).over(w).alias("et1"),
        F.lead("ts_ns", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("et2"),
        F.lead("ts_ns", 2).over(w).alias("t2"),
    )
    matches = seq.filter(
        (F.col("et") == "view")
        & (F.col("et1") == "click")
        & (F.col("et2") == "purchase")
        & (F.col("t1") - F.col("ts_ns") <= half_hour_ns)
        & (F.col("t2") - F.col("t1") <= half_hour_ns)
    )
    return matches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("event_id").cast("bigint").alias("first_match_event"),
    )


# --------------- TWS event-time timers: session timeout ---------------

_TWS_SESSION_GAP_NS = 4 * 3600 * 1_000_000_000


@register(
    "streaming_tws_timers",
    driver=False,  # same pre-JVM protobuf-shim constraint as the TWS twins
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS tns FROM events WHERE user_id < 150
),
d AS (
  SELECT user_id, tns,
         CASE WHEN lag(tns) OVER w IS NULL
                   OR tns - lag(tns) OVER w > {_TWS_SESSION_GAP_NS}
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns)
),
s AS (
  SELECT user_id, tns,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tns
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
),
sess AS (
  SELECT user_id, sid, count(*) AS n FROM s GROUP BY user_id, sid
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n) AS BIGINT) AS max_session_events
FROM sess GROUP BY user_id
""",
)
def streaming_tws_timers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithState with EVENT-TIME TIMERS: gap sessionization where
    a key's final session is flushed by a registered timer when the
    watermark passes last-event + gap — the state primitive that closes
    the TWS API surface (ValueState -> MapState -> timers) and the only
    way a custom stateful operator ever RELEASES per-key state on an
    unbounded stream.

    Determinism engineering: the source is staged as chronological
    time-range chunk files (maxFilesPerTrigger=1 => in-order batches),
    and two far-future sentinel rows for an out-of-band user advance the
    watermark past every real timer — the first sentinel batch fires all
    trailing-session timers, the second proves the emission happened
    under a still-advancing watermark. Sentinel sessions are filtered
    out; every REAL session is therefore closed and emitted exactly
    once, so the result equals the batch gap-sessionization oracle
    (the same equivalence session_window_native pins for the built-in
    operator)."""
    import glob
    import os
    import shutil
    import time
    import uuid

    import pytest

    from .scratch import scratch_dir
    from .streaming.tws import (
        SESSION_OUTPUT_SCHEMA,
        SessionTimeoutProcessor,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState unavailable")

    sentinel_user = 99_999_999
    ev = read_table(spark, sf_dir, "events")
    # key-population cap sizes the state-server RPC volume (register/
    # delete timer + value state per key-batch), not the semantics — the
    # remaining ~150 keys still cross every micro-batch boundary.
    # Integer DIV for the ns->ms bucketing: epoch-ns exceeds 2^53, so a
    # double division would round the quotient.
    ev = (
        ev.filter(F.col("user_id") < 150)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            ts_ns_col(ev).alias("tns"),
        )
        .select("user_id", F.expr("tns DIV 1000000").alias("ms"))
    )
    lo, hi = ev.agg(F.min("ms"), F.max("ms")).first()
    cut1 = lo + (hi - lo) // 2
    gap_ms = _TWS_SESSION_GAP_NS // 1_000_000

    src = scratch_dir(prefix="tws_timer_src_")

    _t0 = time.time()

    def _stage(df, i: int) -> None:
        tmp = scratch_dir(prefix="tws_timer_chunk_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{src}/batch_{i:03d}.parquet"
        shutil.copy(part, dst)
        # FileStreamSource orders files by MODIFICATION TIME, not name:
        # copies landing within one mtime granule could replay out of
        # staging order and violate SessionTimeoutProcessor's
        # non-decreasing cross-batch arrival assumption. Pin strictly
        # increasing mtimes so replay order is the staging order.
        os.utime(dst, (_t0 + i, _t0 + i))

    # 2 chronological chunks (one real cross-batch boundary) + 2 sentinel
    # batches: micro-batch COUNT is the cost driver (each batch spawns the
    # TWS state-server workers), so the staging uses the fewest batches
    # that still prove cross-batch state carry AND the two-step
    # watermark advance the timer flush needs
    _stage(ev.filter(F.col("ms") < cut1), 0)
    _stage(ev.filter(F.col("ms") >= cut1), 1)
    from .model import local_df

    sentinel = local_df(
        spark, [(sentinel_user, hi + 2 * gap_ms)], "user_id bigint, ms bigint"
    )
    _stage(sentinel, 2)
    _stage(sentinel.select("user_id", (F.col("ms") + 2 * gap_ms).alias("ms")), 3)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    prev_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    # 4 state partitions: every (partition x micro-batch) pays a RocksDB
    # open/commit AND an event-time timer range scan; 5 batches x 4
    # partitions = 20 store lifecycles for a 150-key stream
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        stream = (
            spark.readStream.schema("user_id bigint, ms bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        with_ts = stream.withColumn("ts_m", F.timestamp_millis(F.col("ms")))
        out = (
            with_ts.withWatermark("ts_m", "1 second")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=SessionTimeoutProcessor(),
                outputStructType=SESSION_OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="eventTime",
            )
        )
        sink = f"tws_timers_q_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuf)
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return (
        spark.table(sink)
        .filter(F.col("user_id") != sentinel_user)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.max("n_events").cast("bigint").alias("max_session_events"),
        )
    )


# ------------- incremental maintenance of sketch aggregates -------------


@register(
    "incremental_hll_maintenance",
    oracle="""
SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS h,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS inc_equals_batch,
       TRUE AS hll_within_5pct
FROM events GROUP BY h
""",
)
def incremental_hll_maintenance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a SKETCH-valued aggregate: the
    maintained view is per-hour distinct users held as HLL sketches.
    COUNT DISTINCT is not self-maintainable from counts alone (adding a
    batch needs the full history of seen keys) — but the sketch IS
    mergeable, so each ingest epoch only builds sketches over ITS OWN
    rows and max-merges them into the stored registers: per-epoch work
    is proportional to the epoch, never to history. This is why
    100 TB-scale metrics stores (Druid/Pinot-style rollups) keep
    sketches, not counts, as their aggregation state.

    HLL merge is register-wise max — associative and commutative — so
    the incrementally-folded sketch is BIT-IDENTICAL to the one-shot
    batch sketch: pinned as inc_equals_batch, alongside the 5% error
    contract against the exact count (both literals in the oracle, the
    hll_shard_merge pattern). Epochs split by event_id exactly like
    incremental_agg_maintenance's delta batches."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.expr("ts_ns DIV 3600000000000").alias("h"),
    )
    n_epochs = 3
    hi = ev.agg(F.max("event_id")).first()[0] or 0
    step = (hi + n_epochs) // n_epochs
    store = None
    for e in range(n_epochs):
        epoch = ev.filter(
            (F.col("event_id") >= e * step) & (F.col("event_id") < (e + 1) * step)
        )
        delta = epoch.groupBy("h").agg(F.hll_sketch_agg("user_id").alias("sk"))
        store = (
            delta
            if store is None
            else store.unionByName(delta).groupBy("h").agg(F.hll_union_agg("sk").alias("sk"))
        )
    inc = store.select("h", F.hll_sketch_estimate("sk").alias("inc_est"))
    batch = ev.groupBy("h").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("batch_est"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    return inc.join(batch, "h").select(
        "h",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (F.col("inc_est") == F.col("batch_est")).alias("inc_equals_batch"),
        (
            F.abs(F.col("inc_est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")
        ).alias("hll_within_5pct"),
    )


# ----------------------- unpivot (melt) roundtrip -----------------------


@register(
    "unpivot_roundtrip",
    driver=False,  # API breadth: the pivot half holds the driver slot
    oracle=f"""
WITH e AS (
  SELECT CAST(epoch_ns(ts) // {24 * _HOUR_NS} AS BIGINT) AS day_idx, event_type
  FROM events
)
SELECT day_idx, event_type, CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY day_idx, event_type
""",
)
def unpivot_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of event_type_pivot, closing the
    reshape pair: the wide per-day matrix unpivots back to long
    (day, type, count) rows and must equal the long-form aggregate
    computed directly (the oracle). Spark's native ``unpivot`` is a pure
    projection+Expand — per input row it emits one row per value column
    with ZERO exchanges of its own, so the roundtrip costs exactly the
    pivot's single shuffle. Zero-count cells (a type absent on a day)
    are dropped to match the long form, which never had them."""
    wide = event_type_pivot_q(spark, sf_dir)
    long = wide.unpivot(
        ids=["day_idx"],
        values=[f"n_{t}" for t in _EVENT_TYPES],
        variableColumnName="event_type",
        valueColumnName="n_events",
    )
    return long.filter(F.col("n_events") > 0).select(
        "day_idx",
        F.expr("substring(event_type, 3)").alias("event_type"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


# ------------------- ranking-function breadth -------------------


@register(
    "rank_functions_report",
    driver=False,  # window breadth; topk_orders_per_status holds the slot
    oracle="""
WITH r AS (
  SELECT o_orderstatus, o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
         ntile(4) OVER w AS quartile,
         CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_micro,
         CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_micro
  FROM orders
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
)
SELECT o_orderstatus, CAST(quartile AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(price_cents) AS BIGINT) AS sum_cents,
       CAST(max(pct_rank_micro) AS BIGINT) AS max_pct_rank_micro,
       CAST(max(cume_micro) AS BIGINT) AS max_cume_micro
FROM r GROUP BY o_orderstatus, quartile
""",
)
def rank_functions_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ranking-function breadth in one pass: ntile quartiles,
    percent_rank and cume_dist over the same (status, price) window —
    the analyst staples beyond row_number/rank. One keyed exchange feeds
    all three functions (same window spec => one sort); the per-row
    float outputs floor to micro-units so both engines publish identical
    integers, and the (price, orderkey) tie-break makes the window a
    total order — without it ntile boundaries at equal prices are
    engine-arbitrary."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    r = orders.select(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.floor(F.percent_rank().over(w) * 1_000_000).cast("bigint").alias(
            "pct_rank_micro"
        ),
        F.floor(F.cume_dist().over(w) * 1_000_000).cast("bigint").alias("cume_micro"),
    )
    return r.groupBy("o_orderstatus", "quartile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("price_cents").cast("bigint").alias("sum_cents"),
        F.max("pct_rank_micro").alias("max_pct_rank_micro"),
        F.max("cume_micro").alias("max_cume_micro"),
    )


# ------------------- calendar scalar-function breadth -------------------


@register(
    "calendar_rollup",
    driver=False,  # scalar breadth; the CDC/date paths hold driver slots
    oracle="""
SELECT date_trunc('month', o_orderdate) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_orderdate) AS first_day,
       max(o_orderdate) AS last_seen,
       CAST(sum(CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_weekend,
       CAST(max(CAST(last_day(o_orderdate) AS DATE) - CAST(o_orderdate AS DATE))
            AS BIGINT) AS max_days_to_eom
FROM orders GROUP BY 1
""",
)
def calendar_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/date scalar-function breadth over the order dates:
    month truncation, ISO weekday classification, last-day-of-month
    arithmetic — the date algebra reporting layers lean on. All pure
    per-row expressions folded by one hash aggregation. Cross-engine
    traps pinned here: Spark's dayofweek() is Sunday=1 while DuckDB's
    isodow() is Monday=1 (weekday()+1 matches isodow); date_trunc
    returns TIMESTAMP in Spark but DATE in DuckDB (cast to date);
    date subtraction must be day-integers on both sides."""
    orders = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.select(
            F.trunc(d, "month").alias("month"),
            d.alias("o_orderdate"),
            (F.weekday(d) + 1).alias("isodow"),
            F.datediff(F.last_day(d), d).alias("days_to_eom"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_orderdate").alias("first_day"),
            F.max("o_orderdate").alias("last_seen"),
            F.sum(F.when(F.col("isodow") >= 6, 1).otherwise(0))
            .cast("bigint")
            .alias("n_weekend"),
            F.max("days_to_eom").cast("bigint").alias("max_days_to_eom"),
        )
    )
