"""Distribution-drift monitoring: the checks a training-data pipeline
runs between two corpus/feature snapshots before shipping a new mix —
PSI over binned feature values, per-token KL drift between corpus
halves, and exact moment shifts per event family.

Cross-engine exactness strategy (the module's whole design): every
cross-row float SUM is forbidden (summation order diverges between
engines), so sums happen over integers — counts, floored cents, and
per-row floor(term * 1e6/1e9) "micro/nano" contributions — and every
transcendental (ln) is applied per ROW to doubles derived from exact
integers, the tfidf_top_terms precedent. The reported drift statistics
are therefore bigints that match DuckDB bit-for-bit.

Scale posture: each query is one conditional-aggregation pass over the
fact (epoch membership is a per-row predicate, never a self-join of two
filtered scans), followed by arithmetic on the aggregated table —
bin- or vocab-sized, not data-sized. Totals attach via windows over
bounded category partitions or via persist()ed vocab tables, so no
query scans its fact twice."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.numeric import round6
from .model import read_table
from .registry import register
from .queries_corpus import _SQL_TOKS

PSI_CUTOFF = "2024-01-16"
PSI_BIN_W = 50
PSI_NBINS = 10
TOKEN_DRIFT_K = 20


def _epoch_a(df: DataFrame) -> F.Column:
    return F.col("ts") < F.lit(f"{PSI_CUTOFF} 00:00:00").cast(
        df.schema["ts"].dataType
    )


@register(
    "feature_drift_psi",
    oracle=f"""
WITH binned AS (
  SELECT event_type,
         CAST(least(floor(value / {PSI_BIN_W}), {PSI_NBINS - 1}) AS BIGINT) AS bin,
         CASE WHEN ts < TIMESTAMP '{PSI_CUTOFF}' THEN 1 ELSE 0 END AS in_a
  FROM events
),
per_bin AS (
  SELECT event_type, bin,
         CAST(sum(in_a) AS BIGINT) AS cnt_a,
         CAST(sum(1 - in_a) AS BIGINT) AS cnt_b
  FROM binned GROUP BY 1, 2
),
tot AS (
  SELECT *,
         sum(cnt_a) OVER (PARTITION BY event_type) AS tot_a,
         sum(cnt_b) OVER (PARTITION BY event_type) AS tot_b
  FROM per_bin
),
terms AS (
  SELECT event_type, tot_a, tot_b,
         CAST(floor(
           ((cnt_a + 1.0) / (tot_a + {PSI_NBINS}) - (cnt_b + 1.0) / (tot_b + {PSI_NBINS}))
           * ln(((cnt_a + 1.0) / (tot_a + {PSI_NBINS})) / ((cnt_b + 1.0) / (tot_b + {PSI_NBINS})))
           * 1000000) AS BIGINT) AS term_micro
  FROM tot
)
SELECT event_type,
       CAST(max(tot_a) AS BIGINT) AS n_a,
       CAST(max(tot_b) AS BIGINT) AS n_b,
       CAST(sum(term_micro) AS BIGINT) AS psi_micro
FROM terms GROUP BY 1
""",
)
def feature_drift_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event family between the two
    halves of the event window. One conditional-aggregation pass bins
    the fact (epoch membership is a per-row CASE, so A and B counts
    come from the SAME scan — never two filtered scans joined); epoch
    totals attach as a window over the BIN-count partition (≤{nb} rows
    per event family — bounded category state, not data); the per-bin
    PSI term (Laplace-smoothed, per-row ln on doubles derived from
    exact counts) floors to integer micro-units so the final per-family
    sum is a bigint — exact across engines AND across Spark's own
    partial-agg orders. PSI > 0.2 is the classic retrain/re-mix
    trigger; this emits the evidence (n_a, n_b, psi_micro) rather than
    a verdict.""".format(nb=PSI_NBINS)
    ev = read_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.least(F.floor(F.col("value") / PSI_BIN_W), F.lit(PSI_NBINS - 1))
        .cast("bigint")
        .alias("bin"),
        F.when(_epoch_a(ev), 1).otherwise(0).alias("in_a"),
    )
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.sum("in_a").cast("bigint").alias("cnt_a"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("cnt_b"),
    )
    w = Window.partitionBy("event_type")
    tot = per_bin.select(
        "*",
        F.sum("cnt_a").over(w).alias("tot_a"),
        F.sum("cnt_b").over(w).alias("tot_b"),
    )
    pa = (F.col("cnt_a") + 1.0) / (F.col("tot_a") + PSI_NBINS)
    pb = (F.col("cnt_b") + 1.0) / (F.col("tot_b") + PSI_NBINS)
    term = F.floor((pa - pb) * F.log(pa / pb) * 1_000_000).cast("bigint")
    return (
        tot.select("event_type", "tot_a", "tot_b", term.alias("term_micro"))
        .groupBy("event_type")
        .agg(
            F.max("tot_a").cast("bigint").alias("n_a"),
            F.max("tot_b").cast("bigint").alias("n_b"),
            F.sum("term_micro").cast("bigint").alias("psi_micro"),
        )
    )


@register(
    "token_drift_report",
    oracle=f"""
WITH toks AS (
  SELECT CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 0 END AS in_a,
         unnest({_SQL_TOKS}) AS term
  FROM documents
),
per_term AS (
  SELECT term,
         CAST(sum(in_a) AS BIGINT) AS cnt_a,
         CAST(sum(1 - in_a) AS BIGINT) AS cnt_b
  FROM toks GROUP BY 1
),
tot AS (
  SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
         CAST(sum(cnt_b) AS BIGINT) AS tot_b,
         CAST(count(*) AS BIGINT) AS vocab
  FROM per_term
),
scored AS (
  SELECT p.term, p.cnt_a, p.cnt_b,
         CAST(floor(
           ((p.cnt_a + 1.0) / (t.tot_a + t.vocab))
           * ln(((p.cnt_a + 1.0) / (t.tot_a + t.vocab)) / ((p.cnt_b + 1.0) / (t.tot_b + t.vocab)))
           * 1000000000) AS BIGINT) AS contrib_nano
  FROM per_term p CROSS JOIN tot t
)
SELECT term, cnt_a, cnt_b, contrib_nano
FROM scored
ORDER BY abs(contrib_nano) DESC, term
LIMIT {TOKEN_DRIFT_K}
""",
)
def token_drift_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token KL-divergence contributions between the two source
    halves of the corpus (sources src0-9 vs src10-19): which tokens'
    frequencies moved most — the evidence behind a "the new crawl
    slice changed the vocabulary" alarm. One token-explode pass with
    conditional epoch counts; the per-term table (vocab-sized) is
    persist()ed because BOTH the scalar totals and the scoring read it
    — one corpus scan at any SF. Contributions are per-row
    Laplace-smoothed p*ln(p/q) floored to nano-units (bigint), ranked
    by |contribution| with a term tie-break through
    TakeOrderedAndProject — a distributed heap, never a global sort."""
    from .functions.text import _tokens as tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.when(F.substring("source", 4, 10).cast("int") < 10, 1)
        .otherwise(0)
        .alias("in_a"),
        F.explode(tokens(F.col("text"))).alias("term"),
    )
    per_term = toks.groupBy("term").agg(
        F.sum("in_a").cast("bigint").alias("cnt_a"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("cnt_b"),
    ).persist()
    tot = per_term.agg(
        F.sum("cnt_a").cast("bigint").alias("tot_a"),
        F.sum("cnt_b").cast("bigint").alias("tot_b"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    pa = (F.col("cnt_a") + 1.0) / (F.col("tot_a") + F.col("vocab"))
    pb = (F.col("cnt_b") + 1.0) / (F.col("tot_b") + F.col("vocab"))
    contrib = F.floor(pa * F.log(pa / pb) * 1_000_000_000).cast("bigint")
    return (
        per_term.crossJoin(F.broadcast(tot))
        .select("term", "cnt_a", "cnt_b", contrib.alias("contrib_nano"))
        .orderBy(F.abs(F.col("contrib_nano")).desc(), "term")
        .limit(TOKEN_DRIFT_K)
    )


@register(
    "numeric_drift_report",
    oracle=f"""
WITH cents AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{PSI_CUTOFF}' THEN 1 ELSE 0 END AS in_a,
         CAST(floor(value * 100) AS BIGINT) AS c
  FROM events
),
m AS (
  SELECT event_type,
         CAST(sum(in_a) AS BIGINT) AS n_a,
         CAST(sum(1 - in_a) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN in_a = 1 THEN c ELSE 0 END) AS BIGINT) AS s_a,
         CAST(sum(CASE WHEN in_a = 0 THEN c ELSE 0 END) AS BIGINT) AS s_b,
         CAST(sum(CASE WHEN in_a = 1 THEN c * c ELSE 0 END) AS BIGINT) AS q_a,
         CAST(sum(CASE WHEN in_a = 0 THEN c * c ELSE 0 END) AS BIGINT) AS q_b
  FROM cents GROUP BY 1
)
SELECT event_type, n_a, n_b,
       floor((CAST(s_a AS DOUBLE) / n_a / 100) * 1000000) / 1000000 AS mean_a,
       floor((CAST(s_b AS DOUBLE) / n_b / 100) * 1000000) / 1000000 AS mean_b,
       floor((sqrt(CAST(q_a AS DOUBLE) / n_a - (CAST(s_a AS DOUBLE) / n_a) * (CAST(s_a AS DOUBLE) / n_a)) / 100) * 1000000) / 1000000 AS std_a,
       floor((sqrt(CAST(q_b AS DOUBLE) / n_b - (CAST(s_b AS DOUBLE) / n_b) * (CAST(s_b AS DOUBLE) / n_b)) / 100) * 1000000) / 1000000 AS std_b
FROM m
""",
)
def numeric_drift_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact first/second-moment shift per event family between the two
    epoch halves: mean and population-stddev of the value column on
    each side, from ONE conditional-aggregation pass whose
    accumulators are integer cents and cents² (bigint-exact in any
    summation order; cents² of a 500-unit domain at 1e7 rows stays
    ~2e16, inside bigint). The only floating point is the final
    per-GROUP division/sqrt on finished integers — deterministic and
    rounded to 6 decimals. The moment-from-sums identity
    (q/n - (s/n)²) is what makes the two epochs one pass instead of
    two scans + a join."""
    ev = read_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        F.when(_epoch_a(ev), 1).otherwise(0).alias("in_a"),
        F.floor(F.col("value") * 100).cast("bigint").alias("c"),
    )
    a = F.col("in_a") == 1
    m = cents.groupBy("event_type").agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("n_b"),
        F.sum(F.when(a, F.col("c")).otherwise(0)).cast("bigint").alias("s_a"),
        F.sum(F.when(~a, F.col("c")).otherwise(0)).cast("bigint").alias("s_b"),
        F.sum(F.when(a, F.col("c") * F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("q_a"),
        F.sum(F.when(~a, F.col("c") * F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("q_b"),
    )
    def mean(s, n):
        return round6(s.cast("double") / n / 100)

    def std(q, s, n):
        sn = s.cast("double") / n
        return round6(F.sqrt(q.cast("double") / n - sn * sn) / 100)

    return m.select(
        "event_type",
        "n_a",
        "n_b",
        mean(F.col("s_a"), F.col("n_a")).alias("mean_a"),
        mean(F.col("s_b"), F.col("n_b")).alias("mean_b"),
        std(F.col("q_a"), F.col("s_a"), F.col("n_a")).alias("std_a"),
        std(F.col("q_b"), F.col("s_b"), F.col("n_b")).alias("std_b"),
    )
