"""Event-time analytics operators: windowed rollups, sessionization,
as-of joins, hierarchical aggregation, top-k per group.

The reference has none of these (SURVEY §2 Table B: no windows, no joins,
no grouping sets — commit times are carried but unused, reference
sync/db/db.go:118-120). They are first-class for a training-data /
analytics engine, and each is expressed in the shape that scales:
single-shuffle window plans, ROLLUP in one pass instead of unioned
re-scans, rank-filter top-k instead of global sorts.

``events.ts`` arrives as parquet TIMESTAMP(NANOS), read engine-side as
epoch-nanos longs (``ts_ns``); DuckDB reads the same column at micro
precision. Every query therefore compares only quantities invariant under
sub-microsecond truncation (hour buckets, per-user ordering — (user_id,
ts) is unique at micro precision — and integer-floored values), never raw
nanosecond values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .model import events_as_change_log, read_table
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
        F.col("ts").cast("bigint").alias("ts_ns"),
    )


@register(
    "event_hourly_rollup",
    oracle=f"""
SELECT CAST(floor(epoch_ns(ts) / {_HOUR_NS}.0) AS BIGINT) AS hour_idx,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       sum(CAST(floor(value * 1000) AS BIGINT)) AS value_milli
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
        F.floor(F.col("ts_ns") / F.lit(_HOUR_NS)).cast("bigint").alias("hour_idx"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
    )


@register(
    "event_sessionization",
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
SELECT user_id, count(*) AS n_sessions, sum(n) AS n_events,
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
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
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
    oracle=f"""
SELECT CAST(floor(epoch_ns(ts) / {_HOUR_NS}.0) AS BIGINT) AS hour_idx,
       event_type,
       count(*) AS n_events,
       sum(CAST(floor(value * 1000) AS BIGINT)) AS value_milli
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

    ev_schema = read_table(spark, sf_dir, "events").schema  # also sets nanosAsLong
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.select(
            F.timestamp_micros((F.col("ts").cast("bigint") / 1000).cast("long")).alias("ts_m"),
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
