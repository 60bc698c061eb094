"""Decision-support completion wave: the TPC-H shapes not yet covered by
queries_joins.py (Q2, Q5, Q8, Q9, Q11, Q12, Q16, Q19, Q20, Q21, Q22
analogs), adapted to the fixture schema where TPC-H columns are absent:

- there is no ``partsupp`` table, so the supply relation is DERIVED from
  lineitem (``distinct (l_partkey, l_suppkey)``, with min unit price as
  the supply-cost stand-in) — the correlated-subquery shapes (Q2/Q11/
  Q16/Q20) are preserved, the base relation changes;
- lineitem has no ``l_shipmode``/``l_commitdate``/``l_receiptdate``, so
  Q12/Q21's lateness predicate is ``l_shipdate > o_orderdate + 90 days``
  and Q12 groups by ``l_returnflag`` instead of ship mode;
- customer has no ``c_phone``, so Q22 groups by market segment.

The reference implements none of these (SURVEY §2 Table B: joins/aggs
are stock-Spark by design); they complete the "every query a user runs
today" analytics surface, each in the physical shape that survives
100 TB: correlated subqueries decorrelated to keyed aggregates joined
back (never re-evaluated per row), scalar subqueries broadcast, EXISTS/
NOT-EXISTS folded into one per-group aggregate pass instead of N
self-joins, dims broadcast only when bounded (nation/region) or
pre-restricted (a brand/type slice), and facts shuffling at most once.

All money/balance aggregates are per-row floored to integer cents before
summing and ratios are integer DIV micro-rationals (see
queries_joins.py module docstring) so Spark and DuckDB agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import read_table
from .registry import register

_CENTS = "CAST(floor({expr} * 100) AS BIGINT)"


def _ts(df: DataFrame, col: str, lit: str):
    """Timestamp literal cast to the fixture column's exact type (the
    fixtures are TIMESTAMP_NTZ under Spark 4; a bare string literal
    would compare as TIMESTAMP_LTZ and break pushdown)."""
    return F.lit(f"{lit} 00:00:00").cast(df.schema[col].dataType)


# --------------------------------------------------------------------------
# Q2 analog: minimum-cost supplier per part (correlated MIN subquery)
# --------------------------------------------------------------------------


@register(
    "min_cost_supplier",
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(floor(l_extendedprice / l_quantity * 100) AS BIGINT)) AS unit_cost_cents
  FROM lineitem GROUP BY 1, 2
), esupp AS (
  SELECT s.s_suppkey, s.s_name, n.n_name,
         CAST(floor(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
), cand AS (
  SELECT sp.l_partkey, sp.l_suppkey, sp.unit_cost_cents,
         e.s_name, e.n_name, e.acctbal_cents
  FROM supply sp JOIN esupp e ON e.s_suppkey = sp.l_suppkey
), best AS (
  SELECT l_partkey, min(unit_cost_cents) AS best_cents FROM cand GROUP BY 1
)
SELECT c.l_partkey AS p_partkey, p.p_name, c.s_name, c.n_name,
       c.acctbal_cents, c.unit_cost_cents
FROM cand c
JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost_cents = b.best_cents
JOIN part p ON p.p_partkey = c.l_partkey
WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
""",
)
def min_cost_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated subquery
    `min(supplycost) per part over region suppliers` is decorrelated
    into a per-part aggregate joined back on partkey — evaluated once,
    not per candidate row. The supply relation derives from lineitem
    (min observed unit price per (part, supplier)) since the fixture
    has no partsupp; that derivation is one hash aggregate on the
    composite key, the only fact-sized shuffle in the query. The
    region-restricted supplier dim (1/5 of |S| after the region
    semi-join through nation, itself bounded at 25x5 rows broadcast)
    attaches BEFORE the per-part min, so the min ranges over exactly
    the candidate set, and the part brand/size slice prunes candidates
    at the end — filter order mirrors the spec's correlation. Unit
    cost is per-row floor(price/qty*100): IEEE division is
    deterministic on identical doubles, so MIN and the equality join
    back are cross-engine exact. All min-cost ties are returned, as in
    the spec."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100)
        .cast("bigint")
        .alias("_uc"),
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("_uc").alias("unit_cost_cents")
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    enation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    esupp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(enation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.floor(F.col("s_acctbal") * 100).cast("bigint").alias("acctbal_cents"),
        )
    )
    cand = supply.join(esupp, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_partkey", "unit_cost_cents", "s_name", "n_name", "acctbal_cents"
    )
    best = cand.groupBy(F.col("l_partkey").alias("_bk")).agg(
        F.min("unit_cost_cents").alias("best_cents")
    )
    part_sel = (
        read_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name")
    )
    return (
        cand.join(
            best,
            (F.col("l_partkey") == F.col("_bk"))
            & (F.col("unit_cost_cents") == F.col("best_cents")),
        )
        .join(F.broadcast(part_sel), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            "n_name",
            "acctbal_cents",
            "unit_cost_cents",
        )
    )


# --------------------------------------------------------------------------
# Q5 analog: local-supplier volume (join cycle with nation equality)
# --------------------------------------------------------------------------


@register(
    "local_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({_CENTS.format(expr="l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
""",
)
def local_supplier_volume_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the join graph is a
    CYCLE — supplier and customer must share a nation — which is what
    distinguishes this from the Q5-star already covered by
    revenue_by_nation. The cycle closes as an equality predicate
    (s_nationkey = c_nationkey) evaluated on the joined stream, never
    as a second join. Region restriction flows through nation (25x5
    rows, broadcast) into BOTH dims before they touch facts, the
    one-year window is pushed to the orders scan, and the only
    fact-fact shuffle is lineitem-orders on orderkey; the restricted
    supplier/customer slices join broadcast at fixture scale and
    AQE-chosen at SF scale (no forced hint on SF-scaled dims)."""
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    anation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(anation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(anation.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey")
    )
    orders = read_table(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= _ts(orders, "o_orderdate", "1997-01-01"))
        & (F.col("o_orderdate") < _ts(orders, "o_orderdate", "1998-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
    )
    rev = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(rev).cast("bigint").alias("revenue_cents"),
    )


# --------------------------------------------------------------------------
# Q8 analog: nation market share (conditional share inside a yearly agg)
# --------------------------------------------------------------------------


@register(
    "nation_market_share",
    oracle=f"""
WITH all_nations AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         {_CENTS.format(expr="l.l_extendedprice * (1 - l.l_discount)")} AS volume_cents,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume_cents ELSE 0 END) AS BIGINT) AS share_cents,
       CAST(sum(volume_cents) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume_cents ELSE 0 END) * 10000
            // sum(volume_cents) AS BIGINT) AS share_bp
FROM all_nations GROUP BY 1
""",
)
def nation_market_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the share of one
    supplier nation inside a region's order volume for one part type,
    per year. The classic formulation divides two sums in an outer
    query; here both sums land in ONE conditional aggregation pass
    (sum + sum-when), so the fact stream is touched once and the share
    is computed on two finished scalars per year — integer basis
    points via DIV, never a double ratio of big sums. Part-type and
    region restrictions flow into the fact before any fact-fact
    shuffle: the PROMO part slice (1/6 of |P|) and the region customer
    slice prune lineitem/orders early; supplier-nation attaches to the
    surviving stream. Two fact-fact shuffles (lineitem-orders on
    orderkey; none other — all dims broadcast at fixture scale,
    restricted slices AQE-chosen at SF scale)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part_sel = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    rnation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("_cnk"))
    cust = (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(rnation), F.col("c_nationkey") == F.col("_cnk"))
        .select("c_custkey")
    )
    orders = read_table(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= _ts(orders, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _ts(orders, "o_orderdate", "1998-01-01"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    joined = (
        li.join(F.broadcast(part_sel), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    share = F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0)))
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            share.cast("bigint").alias("share_cents"),
            F.sum(vol).cast("bigint").alias("total_cents"),
        )
        .withColumn(
            "share_bp",
            F.expr("CAST(share_cents * 10000 DIV total_cents AS BIGINT)"),
        )
    )


# --------------------------------------------------------------------------
# Q9 analog: product-line profit by nation and year
# --------------------------------------------------------------------------


@register(
    "product_profit",
    oracle=f"""
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_CENTS.format(expr="(l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity)")})
            AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def product_profit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit): profit per supplier nation
    per order year over a name-matched part slice. The fixture has no
    partsupp.ps_supplycost, so cost is p_retailprice x quantity — the
    arithmetic shape (a SUBTRACTION inside the per-row money term,
    producing negative cells that floor() must handle identically in
    both engines: floor rounds toward -inf in Spark AND DuckDB) is
    what the query exercises, plus the LIKE-pruned part slice
    broadcast into the fact before either fact-fact shuffle. The part
    substring filter cannot push to parquet as a range, but it prunes
    the broadcast side to 1/6 of |P| before the join; lineitem
    shuffles once (orderkey) after the part and supplier dims have
    already restricted it."""
    part_sel = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = (
        li.join(F.broadcast(part_sel), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    profit = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("bigint")
    return joined.groupBy(
        "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(F.sum(profit).cast("bigint").alias("profit_cents"))


# --------------------------------------------------------------------------
# Q11 analog: important stock value (scalar-fraction HAVING)
# --------------------------------------------------------------------------


@register(
    "important_stock_value",
    oracle=f"""
WITH slice AS (
  SELECT l.l_partkey,
         {_CENTS.format(expr="l.l_extendedprice * (1 - l.l_discount)")} AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_7', 'NATION_17')
), per_part AS (
  SELECT l_partkey AS p_partkey, CAST(sum(value_cents) AS BIGINT) AS value_cents
  FROM slice GROUP BY 1
)
SELECT p_partkey, value_cents
FROM per_part
WHERE value_cents * 2000 > (SELECT sum(value_cents) FROM per_part)
""",
)
def important_stock_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part supply value from
    two nations' suppliers, keeping parts whose value exceeds a fixed
    FRACTION of the slice total. The scalar subquery is one extra
    aggregation over the already-aggregated per-part table (part-count
    sized, not fact sized) whose single row broadcasts back as a
    non-equi comparison — the fact is scanned once, shuffled once (on
    partkey). The per-part table is referenced twice (total + filter) —
    a diamond Catalyst does NOT dedupe (the exchanges canonicalize
    differently through the alias chain, verified on the final AQE
    plan), so it is persist()ed: bounded at |P| rows x 2 bigints, the
    broadcast-total stage materializes it and the probe side reads the
    cache — one fact scan at any SF, pinned by the plan test's
    InMemoryTableScan assertion. The fraction test is integer
    cross-multiplication (value * 2000 > total), never a double
    division of big sums. The nation-restricted supplier slice
    broadcasts into the scan side."""
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_17")
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    val = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    per_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("l_partkey").alias("p_partkey"), val.alias("_v"))
        .groupBy("p_partkey")
        .agg(F.sum("_v").cast("bigint").alias("value_cents"))
    ).persist()
    total = per_part.agg(F.sum("value_cents").alias("_total"))
    return (
        per_part.join(
            F.broadcast(total), F.col("value_cents") * 2000 > F.col("_total")
        )
        .select("p_partkey", "value_cents")
    )


# --------------------------------------------------------------------------
# Q12 analog: late-shipment priority classes
# --------------------------------------------------------------------------


@register(
    "late_shipment_priority",
    oracle="""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY 1
""",
)
def late_shipment_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): count
    high- vs low-priority orders among LATE lines (shipped >90 days
    after order date — the fixture lacks commit/receipt dates, so
    lateness is ship-vs-order; it lacks shipmode, so the grouping key
    is returnflag). The per-row predicate spans both join sides, so it
    evaluates on the joined stream — but the one-year shipdate window
    IS single-sided and pushes to the lineitem parquet scan, cutting
    the fact before its only shuffle (orderkey). Priority
    classification is a conditional aggregation (two sum-whens in one
    pass), the Q12 signature."""
    li = read_table(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _ts(li, "l_shipdate", "1997-01-01"))
        & (F.col("l_shipdate") < _ts(li, "l_shipdate", "1998-01-01"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


# --------------------------------------------------------------------------
# Q16 analog: supplier count by part descriptor (distinct + anti-join)
# --------------------------------------------------------------------------


@register(
    "supplier_count_by_part",
    oracle="""
WITH supply AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), ok AS (
  SELECT sp.l_partkey, sp.l_suppkey
  FROM supply sp
  WHERE sp.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT o.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ok o
JOIN part p ON p.p_partkey = o.l_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 19, 29, 39, 49)
GROUP BY 1, 2, 3
""",
)
def supplier_count_by_part_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) over an excluded-supplier anti-join.
    The supply relation derives from lineitem as in min_cost_supplier;
    its distinct is the one fact-sized shuffle. The NOT IN subquery
    (suppliers with negative balance standing in for the spec's
    complaint scan) decorrelates to a broadcast LEFT ANTI join —
    NOT-IN-via-anti is safe here because s_suppkey is non-null by
    schema; a null-able NOT IN would need the null-aware variant. The
    part descriptor slice (brand<>, type<>, size IN) broadcasts; the
    final count-distinct re-aggregates the already-distinct pairs, so
    no expanding distinct state."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    supply = li.distinct()
    bad = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ok = supply.join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    part_sel = (
        read_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 19, 29, 39, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ok.join(F.broadcast(part_sel), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q19 analog: disjunctive brand/size/quantity revenue
# --------------------------------------------------------------------------


@register(
    "disjunctive_revenue",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum({_CENTS.format(expr="l.l_extendedprice * (1 - l.l_discount)")}), 0)
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def disjunctive_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under a disjunction of
    conjunctions): the OR spans both join sides, so it can't be a plain
    pushed filter — but each branch implies single-sided bounds whose
    UNION is pushable: p_brand IN (3 brands) + p_size<=15 prune the
    part side, l_quantity BETWEEN 1 AND 30 prunes the fact scan, both
    BEFORE the join; the exact disjunction then evaluates on the
    joined stream. This derived-envelope trick is the difference
    between scanning 100 TB and scanning the ~1/8 the envelope keeps.
    Part slice broadcasts; no other shuffle — the global sum is a
    scalar aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    li = li.filter(F.col("l_quantity").between(1, 30)).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = (
        read_table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & (F.col("p_size") <= 15)
            & (F.col("p_size") >= 1)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).filter(branch)
    rev = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.coalesce(F.sum(rev), F.lit(0)).cast("bigint").alias("revenue_cents"),
    )


# --------------------------------------------------------------------------
# Q20 analog: excess shippers (nested semi-join with aggregate subquery)
# --------------------------------------------------------------------------


@register(
    "excess_shippers",
    oracle="""
WITH pairs AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS pair_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey, CAST(sum(pair_qty) AS BIGINT) AS total_qty,
         CAST(count(*) AS BIGINT) AS n_supp
  FROM pairs GROUP BY 1
), excess AS (
  SELECT DISTINCT pr.l_suppkey
  FROM pairs pr
  JOIN per_part pp ON pp.l_partkey = pr.l_partkey
  WHERE pr.pair_qty * pp.n_supp * 2 > pp.total_qty * 3
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM excess)
""",
)
def excess_shippers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who
    shipped MORE than 1.5x the per-supplier average of some selected
    part in a year. The spec's nested `availqty > 0.5 * sum(shipped)`
    correlates partsupp against lineitem; without partsupp the same
    nesting is pair-qty vs part average — an aggregate subquery
    feeding a semi-join chain, which is the shape under test. The
    per-part average arrives by cross-multiplication (2*pair*n >
    3*total — quantities are integral, so bigint-exact), decorrelated
    to one part-keyed aggregate of the ALREADY-aggregated pair table
    (two cheap shuffles over pair-count rows after one fact-sized
    aggregate; the name-sliced part set broadcasts into the fact
    first). The pair table feeds both the per-part average and the
    excess probe — a diamond Catalyst does not dedupe (see
    important_stock_value) — so it is persist()ed: bounded at
    |selected parts| x |suppliers-per-part| rows, one fact scan at any
    SF. The final IN folds to a semi-join against the small
    distinct-supplier set."""
    li = read_table(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _ts(li, "l_shipdate", "1997-01-01"))
        & (F.col("l_shipdate") < _ts(li, "l_shipdate", "1998-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    part_sel = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    pairs = (
        li.join(F.broadcast(part_sel), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("pair_qty"))
    ).persist()
    per_part = pairs.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("pair_qty").cast("bigint").alias("total_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n_supp"),
    )
    excess = (
        pairs.join(per_part, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("pair_qty") * F.col("n_supp") * 2 > F.col("total_qty") * 3)
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .join(
            F.broadcast(read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return supp.join(
        F.broadcast(excess), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "n_name")


# --------------------------------------------------------------------------
# Q21 analog: suppliers who kept orders waiting (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------


@register(
    "waiting_orders_suppliers",
    oracle="""
WITH lines AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp,
         min(CASE WHEN late = 1 THEN l_suppkey END) AS sole_late_supp
  FROM lines GROUP BY 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order po
JOIN supplier s ON s.s_suppkey = po.sole_late_supp
WHERE po.n_supp > 1 AND po.n_late_supp = 1
GROUP BY 1
""",
)
def waiting_orders_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finalized orders, the supplier whose line was late (ship >90 days
    after order — the fixture's lateness stand-in, see
    late_shipment_priority) while EVERY other supplier on the order
    was on time, and at least one other supplier exists. The spec
    writes this as EXISTS + NOT EXISTS self-joins on lineitem; both
    fold into ONE aggregation pass per order — distinct suppliers,
    distinct LATE suppliers, and (min-trick) the identity of the late
    supplier when it is unique — turning two extra fact-sized joins
    into one orderkey shuffle the l-o join already needed. numwait
    then re-aggregates the order-sized table by supplier."""
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("_late"),
    )
    late_supp = F.when(F.col("_late"), F.col("l_suppkey"))
    per_order = lines.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(late_supp).alias("n_late_supp"),
        F.min(late_supp).alias("sole_late_supp"),
    )
    waiting = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(supp), F.col("sole_late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22 analog: idle high-balance customers (scalar subquery + anti-join)
# --------------------------------------------------------------------------


@register(
    "idle_customer_balance",
    oracle="""
WITH bal AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), cutoff AS (
  SELECT CAST(sum(bal_cents) // count(*) AS BIGINT) AS avg_cents
  FROM bal WHERE bal_cents > 0
)
SELECT b.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(b.bal_cents) AS BIGINT) AS total_bal_cents
FROM bal b, cutoff
WHERE b.bal_cents > cutoff.avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = b.c_custkey)
GROUP BY 1
""",
)
def idle_customer_balance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average positive balance and NO orders, grouped by market
    segment (the fixture has no phone country codes). Two classic
    sub-shapes: the scalar AVG subquery becomes a one-row broadcast —
    computed as integer floor-average over cents (sum DIV count),
    because a double AVG of floats is summation-order-dependent and
    would diverge between engines — and NOT EXISTS becomes a LEFT
    ANTI join against the orders customer-key projection (two columns
    read from the orders scan, nothing else). Customer scans once;
    the anti-join is its only shuffle at SF scale."""
    bal = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    cutoff = bal.filter(F.col("bal_cents") > 0).agg(
        F.expr("CAST(sum(bal_cents) DIV count(*) AS BIGINT)").alias("avg_cents")
    )
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        bal.join(F.broadcast(cutoff), F.col("bal_cents") > F.col("avg_cents"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum("bal_cents").cast("bigint").alias("total_bal_cents"),
        )
    )
