"""Data-governance operators: l-diversity audit + robust (MAD) outlier
detection.

Companions to the existing privacy/quality gates (k_anonymize,
pii_scan, user_purge_audit, constraint_check): k-anonymity alone does
not stop attribute disclosure — a group of 50 people all sharing one
sensitive value is 50-anonymous and still leaks — so release pipelines
also check distinct l-diversity (Machanavajjhala et al., ICDE 2006).
And threshold-based outlier rules (constraint_check) break under heavy
tails; the robust standard is the median absolute deviation
(Hampel 1974): median and MAD have a 50% breakdown point where mean
and stddev have 0%.

Exactness discipline: l-diversity is pure integer counting; the MAD
pipeline works in quarter-cents — event values land on exact cents, the
exact 0.5-quantile interpolates at most to a half, and |x - med|
doubles the denominator again, so scaling by 4 makes every comparison
integer and cross-engine exact (the perplexity_buckets percentile
convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import read_table
from .registry import register

L_DIVERSITY = 3  # minimum distinct sensitive values per QI group
MAD_K = 3  # Hampel flag threshold: |x - med| > K * MAD


@register(
    "l_diversity_report",
    driver=False,
    oracle=f"""
WITH g AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
              AS BIGINT) AS n_sensitive
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(nat AS BIGINT) AS nation_qid, seg AS segment_qid,
       n_rows, n_sensitive,
       CAST(CASE WHEN n_sensitive >= {L_DIVERSITY} THEN 1 ELSE 0 END
            AS INTEGER) AS l_ok
FROM g
""",
)
def l_diversity_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit over the k_anonymize quasi-identifier
    groups: for every (nation, market-segment) group, count the
    DISTINCT sensitive values (account-balance bands of 1000) and flag
    groups below L — the groups where publishing the QI combination
    discloses the sensitive attribute even though the group is large.

    Spark shape: ONE aggregation — count_distinct over a hash-grouped
    scan (Spark plans it as the standard two-phase distinct-expand,
    both phases map-side partial). The group table is
    |nations x segments| rows; nothing data-sized survives the scan."""
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.col("c_nationkey").cast("bigint").alias("nation_qid"),
            F.col("c_mktsegment").alias("segment_qid"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(
                F.floor(F.col("c_acctbal") / 1000).cast("bigint")
            )
            .cast("bigint")
            .alias("n_sensitive"),
        )
        .select(
            "nation_qid",
            "segment_qid",
            "n_rows",
            "n_sensitive",
            F.when(F.col("n_sensitive") >= L_DIVERSITY, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("l_ok"),
        )
    )


@register(
    "mad_outliers",
    driver=False,
    oracle=f"""
WITH pc AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
med AS (SELECT quantile_cont(cents, 0.5) AS m FROM pc),
dev AS (
  SELECT pc.event_type, pc.cents, abs(pc.cents - med.m) AS d
  FROM pc, med
),
mad AS (SELECT quantile_cont(d, 0.5) AS md FROM dev),
lab AS (
  SELECT event_type,
         CASE WHEN cents - (SELECT m FROM med) > {MAD_K} * (SELECT md FROM mad)
              THEN 1 ELSE 0 END AS hi,
         CASE WHEN (SELECT m FROM med) - cents > {MAD_K} * (SELECT md FROM mad)
              THEN 1 ELSE 0 END AS lo
  FROM pc
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(hi) AS BIGINT) AS n_hi,
       CAST(sum(lo) AS BIGINT) AS n_lo,
       (SELECT CAST(floor(m * 4) AS BIGINT) FROM med) AS med_qcents,
       (SELECT CAST(floor(md * 4) AS BIGINT) FROM mad) AS mad_qcents
FROM lab GROUP BY event_type
""",
)
def mad_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier report over event values: flag events more than
    MAD_K median-absolute-deviations from the GLOBAL median (one
    median+MAD pair for the whole value column), with the flag counts
    REPORTED per event type — the heavy-tail-safe replacement for
    mean+3*stddev rules (the fixture's event values are right-tailed,
    so the high flag genuinely fires; order totals are uniform and
    would make the detector vacuous). Per-type robust statistics would
    be the same plan with the percentile reductions grouped by
    event_type — deliberately not done here: the global detector is the
    cross-type anomaly screen, the per-type variant answers a different
    question.

    Exactness: values land on exact cents; the exact median interpolates at
    (n-1)*0.5 so it is a multiple of 0.5 cents, deviations from it are
    multiples of 0.5, and the MAD is then a multiple of 0.25 — all
    exactly representable doubles, compared after a *4 floor to
    quarter-cent bigints, so both engines flag the identical rows.

    Spark shape: two scalar percentile reductions (median, then MAD
    over deviations — each collapses the corpus to ONE row, broadcast
    back), then one labeling scan with a hash aggregate on the bounded
    status key. At 100 TB the exact percentile swaps to
    percentile_approx (a mergeable t-digest) with the same plan shape;
    the exact form is the oracle-checkable fixture path."""
    pc = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    med = pc.agg(F.expr("percentile(cents, 0.5)").alias("m"))
    dev = pc.crossJoin(F.broadcast(med)).select(
        "event_type",
        "cents",
        "m",
        F.abs(F.col("cents") - F.col("m")).alias("d"),
    )
    mad = dev.agg(F.expr("percentile(d, 0.5)").alias("md"))
    lab = dev.crossJoin(F.broadcast(mad))
    return (
        lab.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(
                    F.col("cents") - F.col("m") > MAD_K * F.col("md"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_hi"),
            F.sum(
                F.when(
                    F.col("m") - F.col("cents") > MAD_K * F.col("md"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_lo"),
            F.floor(F.any_value("m") * 4).cast("bigint").alias("med_qcents"),
            F.floor(F.any_value("md") * 4).cast("bigint").alias("mad_qcents"),
        )
    )
