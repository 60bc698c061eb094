"""Join & scan-heavy analytics queries exercising the scale patterns the
engine relies on: broadcast dimension joins, skew-salted joins, bucketed
co-located joins, and wide-scan aggregation with pushdown.

The reference implements no joins (SURVEY §2 Table B) — these are the
Spark-native capabilities a user gets on top of the CDC core, expressed in
the physical shapes that survive 100 TB: dims broadcast, facts never
shuffle more than once, hot keys salt across reducers, and repeated
co-located joins amortize their shuffle through bucketing.

All money aggregates are per-row floored to integer cents BEFORE summing
(`floor(x * 100)` is deterministic on identical doubles; summing floats
is not order-stable), so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from .scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import read_table, ts_ns_col
from .registry import register

_CENTS = "CAST(floor({expr} * 100) AS BIGINT)"


@register(
    "pricing_summary",
    # local-only: scan+agg pushdown evidenced by snapshot_scan (plan test)
    # and revenue_by_nation; slot freed for media_binary_ingest
    driver=False,
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum({_CENTS.format(expr="l_extendedprice")}) AS BIGINT) AS sum_base_cents,
       CAST(sum({_CENTS.format(expr="l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS sum_disc_cents,
       CAST(sum({_CENTS.format(expr="l_extendedprice * (1 - l_discount) * (1 + l_tax)")}) AS BIGINT) AS sum_charge_cents
FROM lineitem
WHERE l_quantity < 45
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: one wide scan with the predicate
    pushed to parquet, one hash aggregation with map-side combine. The
    canonical 'is the scan path right' probe: at 100 TB this query is
    IO-bound and everything else must disappear into the scan."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 45)
    cents = lambda c: F.floor(c * 100).cast("bigint")  # noqa: E731
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
        F.sum(cents(disc)).alias("sum_disc_cents"),
        F.sum(cents(disc * (1 + F.col("l_tax")))).alias("sum_charge_cents"),
    )


@register(
    "revenue_by_nation",
    # r3 rotation: star-join shape evidenced by runtime_filtered_join and the
    # pagerank_topk edge derivation; slot freed for k_anonymize
    driver=False,
    oracle=f"""
SELECT n_name,
       count(*) AS n_items,
       CAST(sum({_CENTS.format(expr="l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name
""",
)
def revenue_by_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: the lineitem fact joins three
    progressively smaller dimensions. Catalyst broadcasts every dim under
    the 64 MB threshold, so the fact table streams through broadcast hash
    joins without a single fact-side shuffle — the only exchange is the
    final small aggregation. Exactly the plan you want when lineitem is
    the 100 TB side."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
    )
    revenue = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_items"), F.sum(revenue).alias("revenue_cents")
    )


@register(
    "salted_join_agg",
    # local-only: skew-salting stays plan-asserted in tests/test_plans.py;
    # slot freed for topk_sketch_merge
    driver=False,
    oracle=f"""
SELECT o.o_orderstatus,
       count(*) AS n_items,
       CAST(sum({_CENTS.format(expr="l.l_extendedprice")}) AS BIGINT) AS price_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
""",
)
def salted_join_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact-dim join (plans/layout.salted_join): the fact side
    spreads each key over 8 salt buckets, the dim side replicates once per
    salt — a hot key becomes 8 parallel reducer streams instead of one
    straggler. Result must be IDENTICAL to the plain join (the oracle):
    salting is a physical rewrite, not a semantic one."""
    from .plans.layout import salted_join

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    joined = salted_join(li, orders, key="k", salt_buckets=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint")).alias("price_cents"),
    )


@register(
    "bucketed_colocated_join",
    driver=False,  # r3 rotation: co-location evidenced by runtime_filtered_join
    oracle=f"""
SELECT o.o_orderstatus,
       count(*) AS n_items,
       CAST(sum({_CENTS.format(expr="l.l_extendedprice")}) AS BIGINT) AS price_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
""",
)
def bucketed_colocated_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join through bucketing: both tables are written
    bucketed+sorted by the join key (8 buckets), so the sort-merge join
    reads matching buckets directly — NO exchange and NO sort on either
    side (asserted in tests/test_plans.py). This is the 'repeated joins on
    the same key' amortization: pay the layout cost once at write time,
    join shuffle-free forever after."""
    for name, tbl, key, cols in [
        ("bkt_lineitem", "lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice"]),
        ("bkt_orders", "orders", "o_orderkey", ["o_orderkey", "o_orderstatus"]),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            read_table(spark, sf_dir, tbl)
            .select(*cols)
            .write.format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", scratch_dir(prefix=f"{name}_"))
            .mode("overwrite")
            .saveAsTable(name)
        )
    li = spark.table("bkt_lineitem")
    orders = spark.table("bkt_orders")
    joined = li.hint("merge").join(orders, li["l_orderkey"] == orders["o_orderkey"])
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint")).alias("price_cents"),
    )


@register(
    "partition_pruned_scan",
    driver=False,  # r3 rotation: pruning evidenced by ann_topk_bucketed DPP
    oracle="""
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events
WHERE event_type IN ('purchase', 'signup')
GROUP BY event_type
""",
)
def partition_pruned_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning: events re-laid-out hive-partitioned by
    event_type (the write-time clustering a 100 TB event store would use),
    then scanned with a partition-key predicate — the plan's
    PartitionFilters prune 3 of 5 directories before any IO (asserted in
    tests/test_plans.py). Layout cost is paid once; every later query with
    a type predicate reads only its slice."""
    from .scratch import scratch_dir

    out = scratch_dir(prefix="events_by_type_")
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type").isin("purchase", "signup"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
    )


_DAY_NS = 86_400 * 10**9
_JAN1_2024_NS = 1_704_067_200 * 10**9  # 2024-01-01T00:00:00Z


@register(
    "range_join_campaigns",
    driver=False,  # driver contract is at its 50-entry cap; pytest-oracle-checked
    oracle=f"""
WITH camps AS (
  SELECT n_nationkey AS campaign_id,
         {_JAN1_2024_NS} + n_nationkey * {_DAY_NS} AS start_ns,
         {_JAN1_2024_NS} + n_nationkey * {_DAY_NS} + 2 * {_DAY_NS} AS end_ns
  FROM nation
)
SELECT c.campaign_id,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       CAST(sum(CAST(floor(e.value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events e
JOIN camps c
  ON epoch_ns(e.ts) >= c.start_ns AND epoch_ns(e.ts) < c.end_ns
GROUP BY 1
""",
)
def range_join_campaigns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Campaign attribution through the binned range join
    (operators/rangejoin.py): 25 two-day campaign windows (derived
    deterministically from nation so the oracle can mirror them), each
    event attributed to EVERY campaign whose [start, end) contains its
    timestamp — overlapping windows, so most events match twice.

    The rewrite turns the interval predicate into an equi-join on 1-day
    time bins (dims explode to ~3 bins each) — hash-joinable, AQE-
    eligible, no BroadcastNestedLoopJoin (asserted in tests/test_plans.py).
    At 100 TB the facts shuffle (or broadcast-probe) on the fine-grained
    bin key instead of comparing every row against every interval."""
    from .operators.rangejoin import range_join_binned

    ev_raw = read_table(spark, sf_dir, "events")
    ev = ev_raw.select("user_id", "value", ts_ns_col(ev_raw).alias("ts_ns"))
    camps = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("campaign_id"),
        (F.lit(_JAN1_2024_NS) + F.col("n_nationkey") * F.lit(_DAY_NS)).alias("start_ns"),
        (
            F.lit(_JAN1_2024_NS)
            + F.col("n_nationkey") * F.lit(_DAY_NS)
            + F.lit(2 * _DAY_NS)
        ).alias("end_ns"),
    )
    joined = range_join_binned(
        ev, camps, ts_col="ts_ns", start_col="start_ns", end_col="end_ns", bin_width=_DAY_NS
    )
    return joined.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
    )


@register(
    "invalid_sequence_detect",
    driver=False,  # r3 rotation: A9 validation dupe
    oracle="""
WITH change_log AS (
  SELECT event_id AS seq, CAST(user_id AS BIGINT) AS key,
         CASE WHEN event_type = 'signup' THEN 'INSERT'
              WHEN event_type = 'error' THEN 'DELETE'
              ELSE 'UPDATE' END AS kind
  FROM events
),
with_prev AS (
  SELECT key, seq, kind,
         lag(kind) OVER (PARTITION BY key ORDER BY seq) AS prev_kind
  FROM change_log
)
SELECT key, seq, prev_kind, kind FROM with_prev
WHERE (prev_kind = 'INSERT' AND kind = 'INSERT')
   OR (prev_kind = 'UPDATE' AND kind = 'INSERT')
   OR (prev_kind = 'DELETE' AND kind = 'UPDATE')
   OR (prev_kind = 'DELETE' AND kind = 'DELETE')
""",
)
def invalid_sequence_detect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The invalid-pair detector (multi_row_action.go:176-179) run over the
    RAW events mapping — which, unlike normalized-valid chains, contains
    (I,I)/(U,I)/(D,U)/(D,D) adjacencies — returning every action pair the
    reference's Grouper would refuse. One window pass, one shuffle on the
    row identity; the compaction queries run the same detector implicitly
    by normalizing first."""
    from .model import events_as_change_log
    from .streaming.accumulator import validate_action_sequences

    log = events_as_change_log(read_table(spark, sf_dir, "events")).select(
        "key", "seq", "kind"
    )
    found = validate_action_sequences(log, ["key"])
    return found.select("key", "seq", "prev_kind", "kind")


@register(
    "shipping_priority_topk",
    driver=False,
    oracle=f"""
SELECT l.l_orderkey,
       CAST(sum({_CENTS.format(expr="l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents,
       CAST(o.o_orderdate AS DATE) AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
""",
)
def shipping_priority_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dimension filters
    push into both scans BEFORE the joins (segment filter prunes customer,
    date filters prune orders/lineitem at the parquet reader), filtered
    orders⨝customer broadcasts against the lineitem stream, and the final
    top-10 is TakeOrderedAndProject over the aggregated (not raw) rows."""
    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    cutoff = F.lit("1995-03-15").cast("date")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("o_orderdate"))
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.to_date("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    dim = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    return (
        li.join(F.broadcast(dim), li["l_orderkey"] == dim["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "o_orderdate")
        .orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(10)
    )


LARGE_ORDER_QTY = 150


@register(
    "large_order_customers",
    driver=False,
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > {LARGE_ORDER_QTY}
)
SELECT c.c_name, o.o_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def large_order_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the HAVING subquery is a
    semi-join — lineitem aggregates once to find qualifying orders, and
    that SMALL qualifying set broadcasts back against orders and lineitem,
    so the big fact table is never shuffled on the join key. The Spark
    plan re-uses the same one-pass aggregate for qualification and the
    final per-order totals."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty")
    )
    big = per_order.filter(F.col("total_qty") > LARGE_ORDER_QTY)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("totalprice_cents"),
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "totalprice_cents",
            "total_qty",
        )
    )


# --------------------------- data layout: Z-order ---------------------------

_Z_BITS = 10  # 10 bits per dimension -> 20-bit z-value, 2^4 coarse buckets


def _z_interleave_sql(xcol: str, ycol: str) -> str:
    """Bit-interleave SQL valid in BOTH Spark SQL and DuckDB (only &, <<,
    >> and + — no dialect-specific xor). x occupies even bits, y odd."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({xcol} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ycol} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


_Z_X = f"(user_id % {1 << _Z_BITS})"
_Z_Y_NS = 3_600_000_000_000  # hour buckets on the time axis


@register(
    "zorder_layout",
    driver=False,
    oracle=f"""
WITH zsrc AS (
  SELECT {_Z_X} AS zx,
         (CAST(floor(epoch_ns(ts) / {_Z_Y_NS}.0) AS BIGINT) % {1 << _Z_BITS}) AS zy
  FROM events
),
zval AS (
  SELECT zx, zy, {_z_interleave_sql("zx", "zy")} AS z FROM zsrc
)
SELECT CAST(z >> {2 * _Z_BITS - 4} AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(zx) AS BIGINT) AS x_min, CAST(max(zx) AS BIGINT) AS x_max,
       CAST(min(zy) AS BIGINT) AS y_min, CAST(max(zy) AS BIGINT) AS y_max
FROM zval GROUP BY 1
""",
)
def zorder_layout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout assignment over (user, hour): the
    multi-dimensional clustering step behind Delta/Iceberg OPTIMIZE
    ZORDER. Interleaving the two keys' bits makes file-level min/max
    stats selective on BOTH dimensions at once, so a 100 TB table can
    skip files for either predicate — range-partitioning by z-value is
    then an ordinary repartitionByRange before the write. The z-value is
    pure bit arithmetic riding the scan (no UDF, no shuffle); the query
    publishes per-coarse-bucket row counts and per-dimension bounds —
    the locality evidence a layout job would log. Verified byte-equal
    against DuckDB running the identical interleave formula.
    """
    ev = read_table(spark, sf_dir, "events")
    zsrc = ev.select(
        (F.col("user_id") % (1 << _Z_BITS)).alias("zx"),
        ts_ns_col(ev).alias("tns"),
    ).select(
        "zx",
        # integer DIV: epoch-ns exceeds 2^53, a double quotient can
        # round across a bucket boundary
        F.expr(f"(tns DIV {_Z_Y_NS}) % {1 << _Z_BITS}").alias("zy"),
    )
    zval = zsrc.select("zx", "zy", F.expr(_z_interleave_sql("zx", "zy")).alias("z"))
    return zval.groupBy(
        F.shiftright(F.col("z"), 2 * _Z_BITS - 4).cast("bigint").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("zx").cast("bigint").alias("x_min"),
        F.max("zx").cast("bigint").alias("x_max"),
        F.min("zy").cast("bigint").alias("y_min"),
        F.max("zy").cast("bigint").alias("y_max"),
    )


# ----------------- AQE runtime (bloom) filter join ------------------


@register(
    "runtime_filtered_join",
    oracle=f"""
SELECT s.s_nationkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({_CENTS.format(expr="l.l_extendedprice")}) AS BIGINT) AS price_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE s.s_acctbal > 9000
GROUP BY s.s_nationkey
""",
)
def runtime_filtered_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dimension fact join via shuffle join + AQE runtime
    bloom filter (spark.sql.optimizer.runtime.bloomFilter.enabled): the
    selective supplier filter builds a bloom filter that is pushed into
    the lineitem scan as might_contain(l_suppkey), so the fact side
    drops non-matching rows BEFORE the exchange — at 100 TB that is the
    difference between shuffling the whole fact table and shuffling the
    ~matching fraction. The shuffle-join HINT (not a session conf — a
    conf flip restored in a finally block is already gone when the lazy
    plan is optimized) models the case where the dim is too big to
    broadcast, which is exactly when the runtime filter pays; the
    injected filter is asserted in tests/test_plans.py."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select("s_suppkey", "s_nationkey")
    )
    joined = li.join(supp.hint("shuffle_hash"), li["l_suppkey"] == supp["s_suppkey"])
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("price_cents"),
    )


# ----------------------- iterative graph rank -----------------------

PR_SCALE = 1_000_000  # integer micro-rank unit (floats never cross engines)
PR_ITERS = 3


def _pagerank_oracle() -> str:
    teleport = 150_000  # floor(0.15 * PR_SCALE)
    it = """
it{k} AS (
  SELECT n.node,
         CAST({teleport} + coalesce(s.inflow, 0) AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum((85 * r.r * e.w) // (100 * o.out_w)) AS BIGINT) AS inflow
    FROM edges e
    JOIN it{prev} r ON r.node = e.src
    JOIN outw o ON o.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
    iters = ",".join(
        it.format(k=k, prev=k - 1, teleport=teleport) for k in range(1, PR_ITERS + 1)
    )
    return f"""
WITH edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY src, dst
),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
outw AS (
  SELECT src AS node, CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY src
),
it0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
{iters}
SELECT n_name, r AS rank_micro
FROM it{PR_ITERS} JOIN nation ON n_nationkey = node
ORDER BY r DESC, n_name LIMIT 10
"""


@register("pagerank_topk", oracle=_pagerank_oracle())
def pagerank_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the customer-nation -> supplier-nation
    trade graph, the canonical 'iterative algorithm on Spark' shape
    (PageRank is the motivating example of the RDD/Spark paper; here it
    stays in DataFrames).

    Two distinct scale regimes, handled differently:

    - Edge DERIVATION is the 100 TB part: one fact scan (lineitem joins
      orders on the orderkey shuffle, then broadcasts the two true
      dimensions) collapsing to a |V|^2-bounded edge list with map-side
      partial aggregation.
    - The ITERATION runs on the collapsed graph, which is BOUNDED BY
      CONSTRUCTION: |V| = nations = 25 at any TPC-H scale factor, so
      the edge list is ≤ 625 rows and the loop is plain Python integer
      arithmetic on the driver (r13 — the bounded-driver-control class
      of mmr_rerank/BPE argmax; the old unrolled join-per-iteration DAG
      paid ~20 fixed-cost jobs for zero distributed work). Rank mass is
      integer micro-units with per-edge floor((85*r*w)/(100*out_w)) so
      both engines agree bit-for-bit (float damping never does). On an
      UNBOUNDED graph this loop belongs in joins with periodic
      checkpoints, as dedup_clusters does (functions/dedup.py:336).

    Top-10 emission is orderBy+limit = TakeOrderedAndProject (per-
    partition top-k, driver merge of 10-row heaps), never a global sort."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    teleport = (15 * PR_SCALE) // 100

    # Bounded driver iteration (r13, same class as mmr_rerank): the
    # collapsed graph is |V|^2-bounded with |V| = nations — 25 AT ANY
    # SCALE FACTOR (TPC-H fixes the nation table), so the edge list is
    # ≤ 625 rows BY CONSTRUCTION and the PR loop is pure Python integer
    # arithmetic on it. The old unrolled-DAG loop paid ~20 AQE
    # join/broadcast jobs for zero distributed work per iteration; the
    # one distributed job left is the edge derivation itself (the
    # actual 100 TB part). Spark's bigint `DIV` and Python `//` agree
    # on the all-positive operands, so ranks are bit-identical.
    edge_rows = [
        (int(r["src"]), int(r["dst"]), int(r["w"])) for r in edges.collect()
    ]
    node_set = {s for s, _, _ in edge_rows} | {d for _, d, _ in edge_rows}
    out_w: dict[int, int] = {}
    for s, _, w in edge_rows:
        out_w[s] = out_w.get(s, 0) + w
    ranks = {n: PR_SCALE for n in node_set}
    for _ in range(PR_ITERS):
        inflow: dict[int, int] = {}
        for s, dst, w in edge_rows:
            contrib = (85 * ranks[s] * w) // (100 * out_w[s])
            inflow[dst] = inflow.get(dst, 0) + contrib
        ranks = {n: teleport + inflow.get(n, 0) for n in node_set}

    from .model import local_df

    ranks_df = local_df(
        spark, [(n, r) for n, r in ranks.items()], "node bigint, r bigint"
    )
    return (
        ranks_df.join(F.broadcast(nation), ranks_df["node"] == nation["n_nationkey"])
        .select("n_name", F.col("r").alias("rank_micro"))
        .orderBy(F.desc("rank_micro"), "n_name")
        .limit(10)
    )


# ----------------------- triangle counting -----------------------


_TRIANGLE_ORACLE = """
WITH tr AS (
  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS u,
         greatest(c.c_nationkey, s.s_nationkey) AS v
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
wedge AS (
  SELECT a.u AS u, a.v AS v, b.v AS w
  FROM tr a JOIN tr b ON a.v = b.u
),
tri AS (
  SELECT 1 FROM wedge JOIN tr ON tr.u = wedge.u AND tr.v = wedge.w
)
SELECT CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_edges,
       CAST((SELECT count(DISTINCT u) FROM (SELECT u FROM tr UNION ALL SELECT v FROM tr)) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM tri) AS BIGINT) AS n_triangles
"""


@register("triangle_count", oracle=_TRIANGLE_ORACLE)
def triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TRIANGLE COUNTING over the nation trade graph — the
    graph-analytics primitive behind clustering coefficients and
    community detection, and the third member of the graph family
    (connected components = reachability, PageRank = centrality,
    triangles = cohesion).

    The algorithm is the two-join MapReduce classic (Suri & Vassilvitskii
    2011's MR-NodeIterator shape): orient every edge low-id -> high-id,
    build wedges u->v->w by joining the oriented edge list with itself on
    the middle vertex, then close each wedge against the edge list —
    every triangle is counted exactly once because u < v < w holds on
    exactly one of its orientations. Two keyed shuffles of the EDGE list
    (already |V|^2-bounded after the heavy derivation, which reuses
    pagerank_topk's broadcast-dim fact collapse); the skew refinement —
    orienting by (degree, id) so wedge fan-out is bounded by the SMALLER
    endpoint's degree, O(sqrt m) after orientation — is the
    ``triangle_count_degree`` twin below."""
    edges = _trade_edges(spark, sf_dir)
    wedge = edges.alias("a").join(
        edges.alias("b"), F.col("a.v") == F.col("b.u")
    ).select(F.col("a.u").alias("wu"), F.col("a.v").alias("wv"), F.col("b.v").alias("ww"))
    tri = wedge.join(
        edges.alias("c"),
        (F.col("c.u") == F.col("wu")) & (F.col("c.v") == F.col("ww")),
    )
    return _triangle_report(edges, tri)


@register("triangle_count_degree", oracle=_TRIANGLE_ORACLE)
def triangle_count_degree_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """triangle_count with DEGREE-ORDERED orientation (VERDICT r03
    next-round #7) — the refinement that survives power-law graphs.

    Id-orientation breaks on a skewed star: a low-id hub with degree d
    keeps all d edges outgoing and fans out C(d,2) wedges (a 10^6-degree
    celebrity node = 5*10^11 wedges from ONE vertex). Orienting every
    edge from the (degree, id)-smaller endpoint instead caps every
    vertex's out-degree at O(sqrt m) (a classic arboricity bound: a
    vertex beats its neighbor in the order only while its own degree is
    no larger), so per-vertex wedge fan-out is O(m) total — the hub's
    spokes all point INTO it and the hub emits zero wedges
    (tests/test_round4_ops.py pins exactly this on a 1000-spoke star,
    plus count-equivalence with the id orientation).

    Same two keyed shuffles as the id variant plus one |V|-row degree
    aggregate joined back onto the |E|-row edge list; the total order
    (degree, id) is a struct comparison, so ties at equal degree stay
    deterministic."""
    tri, o = _degree_oriented_triangles(_trade_edges(spark, sf_dir))
    return _triangle_report(o, tri)


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v, distinct) nation trade edges, materialized once:
    the edge list is referenced four times (two wedge sides, closure
    probe, counts) and without a checkpoint the fact-scale derivation
    would re-execute per reference."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )


def _degree_oriented_triangles(edges: DataFrame):
    """(triangles, oriented-edges) under (degree, id) orientation.

    ``edges`` must be the canonical undirected list (u < v, distinct).
    Returns the closed-wedge DataFrame (one row per triangle) and the
    oriented edge list (one row per input edge, so edge/node counts read
    off it unchanged)."""
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    annotated = (
        edges.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
    )
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    o = annotated.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("dst"),
        # the dst endpoint's order key, kept so wedge pairs (v, w) can be
        # emitted once with v before w IN THE ORIENTATION ORDER — the
        # closing edge between them, if present, is then exactly src=v,
        # dst=w (orientation always points order-upward)
        F.when(ku < kv, kv).otherwise(ku).alias("dst_key"),
    ).localCheckpoint()
    wedge = (
        o.alias("a")
        .join(o.alias("b"), F.col("a.src") == F.col("b.src"))
        .filter(F.col("a.dst_key") < F.col("b.dst_key"))
        .select(F.col("a.dst").alias("wv"), F.col("b.dst").alias("ww"))
    )
    tri = wedge.join(
        o.alias("c"),
        (F.col("c.src") == F.col("wv")) & (F.col("c.dst") == F.col("ww")),
    )
    return tri, o.select(F.col("src").alias("u"), F.col("dst").alias("v"))


def _triangle_report(edges: DataFrame, tri: DataFrame) -> DataFrame:
    nodes = edges.select("u").unionAll(edges.select(F.col("v").alias("u")))
    n_e = edges.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    n_n = nodes.distinct().agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    n_t = tri.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    return (
        n_e.select(F.col("n").cast("bigint").alias("n_edges"), "_k")
        .join(n_n.select(F.col("n").cast("bigint").alias("n_nodes"), "_k"), "_k")
        .join(n_t.select(F.col("n").cast("bigint").alias("n_triangles"), "_k"), "_k")
        .drop("_k")
    )


# ==================== rounds 5-6 TPC-H-shaped wave =========================
# Eight classic decision-support shapes (Q4/Q6/Q7/Q10/Q13/Q14/Q15/Q17
# analogs, adapted to the fixture star schema which has no partsupp /
# commitdate): five landed in round 5, the Q7/Q15/Q17 analogs below in
# round 6. Each exists to pin one physical strategy the engine must
# get right at 100 TB: pure-pushdown scans, broadcast dims, semi/anti
# joins that never materialize the fact side, two-level aggregates, and
# argmax without a global sort. Money is floored integer cents,
# ratios are floored integer micros (see module docstring). Every one
# has a physical-plan assertion in tests/test_plans.py
# (test_tpch_wave_*) pinning the pushdown / broadcast / top-k shape it
# exists to demonstrate.


@register(
    "discounted_revenue",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def discounted_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the purest pushdown probe in the suite — a
    one-table scan whose THREE predicates (date range, discount band,
    quantity cap) must all reach the parquet reader as PushedFilters,
    with ReadSchema pruned to the four referenced columns. At 100 TB
    this query is min/max-stat skipping + IO and nothing else; a plan
    test asserts every predicate is pushed and no Exchange exists above
    the partial aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    hi = F.lit("1997-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
WITH j AS (
  SELECT CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS cents,
         CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
    AND l.l_shipdate <  TIMESTAMP '1997-09-01'
)
SELECT CAST(sum(is_promo * cents) AS BIGINT) AS promo_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(floor(1000000.0 * sum(is_promo * cents) / sum(cents)) AS BIGINT)
         AS promo_share_micro
""" + "FROM j",
)
def promo_revenue_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): fact scan with the date range
    pushed down, the part dimension joined UNHINTED — millions of rows
    at 100 TB is too big to force-broadcast, so the planner chooses from
    stats (broadcast at fixture scale, where the plan test pins
    BroadcastHashJoin and zero fact-side Exchange; shuffle join once the
    dim outgrows the threshold). The share is a floored
    integer micro-ratio of two exact cents sums — division happens once,
    on two scalars, after all distributed arithmetic is integer."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    lo = F.lit("1997-06-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    hi = F.lit("1997-09-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    j = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("cents"),
            F.when(F.col("p_type") == "PROMO", F.lit(1)).otherwise(F.lit(0)).alias("is_promo"),
        )
    )
    agg = j.agg(
        F.sum(F.col("is_promo") * F.col("cents")).cast("bigint").alias("promo_cents"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    return agg.select(
        "promo_cents",
        "total_cents",
        F.floor(F.lit(1000000.0) * F.col("promo_cents") / F.col("total_cents"))
        .cast("bigint")
        .alias("promo_share_micro"),
    )


@register(
    "returned_items_topk",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c.c_custkey
LIMIT 20
""",
)
def returned_items_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item complaints): the returnflag filter
    rides the lineitem scan, the orderdate window rides the orders scan
    (both pushed), the fact-fact join shuffles once on orderkey, and the
    two dims (customer, nation) join the aggregated — not raw — stream.
    nation is force-broadcast (bounded at 25 rows at every SF); customer
    is deliberately UNHINTED because it scales with SF (billions of rows
    at 100 TB would OOM a forced broadcast) — file-size stats / AQE pick
    broadcast at fixture scale and a shuffle join when the dim outgrows
    the threshold. Top-20 is orderBy+limit so Catalyst plans
    TakeOrderedAndProject: per-partition heaps, no global sort. Ties
    break on c_custkey so the top-20 SET is engine-independent."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders")
    lo = F.lit("1996-01-01 00:00:00").cast(orders.schema["o_orderdate"].dataType)
    hi = F.lit("1996-07-01 00:00:00").cast(orders.schema["o_orderdate"].dataType)
    orders = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents")
        )
    )
    return (
        per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "revenue_cents")
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


@register(
    "order_priority_report",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY 1
""",
)
def order_priority_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking; the fixture has no
    commitdate, so 'late' = any line shipped >90 days after the order
    date). The EXISTS is a LEFT SEMI join on orderkey with the lateness
    predicate evaluated inside the join — the lineitem side contributes
    at most one match per order and is never materialized into the
    output, and the orderdate window is pushed to the orders scan. One
    shuffle on orderkey, then a tiny 5-row aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    lo = F.lit("1996-01-01 00:00:00").cast(orders.schema["o_orderdate"].dataType)
    hi = F.lit("1997-01-01 00:00:00").cast(orders.schema["o_orderdate"].dataType)
    orders = orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_late_orders")
    )


@register(
    "customer_order_histogram",
    oracle="""
WITH per AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM per GROUP BY 1
""",
)
def customer_order_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): LEFT OUTER join so
    zero-order customers keep a row (the classic inner-join bug this
    query exists to catch), with the priority exclusion INSIDE the join
    condition — pushing it as a WHERE would silently turn the join inner.
    Two-level aggregate: per-customer counts shuffle on custkey (the
    orders scan pre-projects to 2 columns), then the tiny histogram
    re-aggregates on the count value."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@register(
    "volume_shipping",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
""",
)
def volume_shipping_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the
    two-year shipdate window is pushed to the lineitem scan, and both
    nation-restricted dims are PRE-FILTERED before touching the fact —
    supplier x nation and customer x nation each collapse to ~1/25 of
    the dim keyed by one of two nations, joined broadcast (nation itself
    is bounded at 25 rows at every SF; the restricted supplier slice
    stays broadcastable far longer than the full dim). The only
    fact-fact shuffle is lineitem-orders on orderkey; the OR-of-pairs
    predicate is evaluated after both nation names are attached, on the
    already-restricted stream. Year bucketing is integer year(), revenue
    is per-row floored cents (module docstring), so the (nation, nation,
    year) cells match DuckDB bit-for-bit."""
    li = read_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    hi = F.lit("1998-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    li = li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        read_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
    ).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("revenue_cents")
    )


@register(
    "top_supplier_revenue",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.revenue_cents
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.revenue_cents = (SELECT max(revenue_cents) FROM rev)
""",
)
def top_supplier_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): per-supplier
    revenue over a pushed-down 3-month window, then the argmax WITHOUT a
    global sort OR a single-partition window — the scalar max is
    aggregated separately and joined back as a broadcast equality (the
    classic `max(revenue) OVER ()` formulation would funnel all |S| rows
    through one partition; a broadcast-scalar join keeps the filter
    embarrassingly parallel, which matters when |S| is millions at
    100 TB). All revenue-tied suppliers are returned, as in the spec.
    The supplier dim joins the aggregated one-row-per-argmax stream.
    tests/test_plans.py pins: no Window, no global Sort, the scalar max
    arriving via BroadcastHashJoin."""
    li = read_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    hi = F.lit("1996-04-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    rev = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents")
        )
    )
    mx = rev.agg(F.max("revenue_cents").alias("_mx"))
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("revenue_cents") == F.col("_mx"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "revenue_cents")
    )


@register(
    "small_qty_revenue",
    oracle="""
WITH sel AS (
  SELECT l.l_partkey, l.l_quantity,
         CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#1' AND p.p_type = 'SMALL'
), cap AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cap
  FROM sel GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(s.cents), 0) AS BIGINT) AS sum_cents,
       CAST(coalesce(sum(s.cents), 0) // 7 AS BIGINT) AS avg_yearly_cents
FROM sel s JOIN cap c ON c.l_partkey = s.l_partkey
WHERE s.l_quantity < c.qty_cap
""",
)
def small_qty_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    scalar subquery `0.2 * avg(l_quantity) per part` is decorrelated into
    a per-key aggregate joined back on partkey — never re-evaluated per
    row. The brand/type predicate is pushed to the part scan, and the
    TINY selected-part slice (1/25 of brands x 1/6 of types) broadcasts
    into the fact scan FIRST, so both the average and the final sum only
    ever see lineitem rows of selected parts: two passes over that
    restricted slice beat one pass over the full fact by ~150x. The
    cap-vs-quantity comparison is cross-engine exact because fixture
    quantities are integral (integer sums are order-stable in doubles,
    so avg is bit-identical); revenue is floored cents and the yearly
    average is integer DIV 7 (never double division on big sums)."""
    part_sel = (
        read_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    sel = li.join(F.broadcast(part_sel), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey",
        "l_quantity",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    cap = sel.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap")
    )
    small = sel.join(
        cap.withColumnRenamed("l_partkey", "_ck"), F.col("l_partkey") == F.col("_ck")
    ).filter(F.col("l_quantity") < F.col("qty_cap"))
    return small.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("sum_cents"),
        F.expr("CAST(coalesce(sum(cents), 0) DIV 7 AS BIGINT)").alias("avg_yearly_cents"),
    )
