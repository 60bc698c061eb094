"""Eval-metrology operators: the measurement kernels an LLM eval
pipeline runs AFTER generation — sample-level pass rates, annotator
agreement, and span extraction quality (beyond-reference surface,
like the other LLM-pipeline waves; the reference is a CDC engine).

- ``pass_at_k``: the unbiased pass@k estimator over n samples per task
  (1 - C(n-c,k)/C(n,k), the standard code-eval statistic). With n and k
  fixed literals the combinatorics reduce to a falling-factorial
  product, so the whole estimator is EXACT integer arithmetic in
  micros — the product (n-c)(n-c-1)...(n-c-k+1) hits a zero factor
  precisely when fewer than k incorrect samples exist, which is the
  pass@k=1 case, no clamping needed.

- ``annotator_confusion`` / ``cohens_kappa``: two deterministic
  annotators (md5-derived: a shared latent label + per-annotator
  noise — the repo's hash-assignment discipline standing in for a
  human labeling table) over a 4-category task; the confusion matrix
  and chance-corrected agreement. kappa = (po - pe)/(1 - pe) held in
  micros end-to-end: po and pe are integer divisions of exact counts,
  the final ratio is one more integer division — cross-engine
  bit-exact, no floats.

- ``span_f1_report``: extraction-task scoring — token-index overlap
  between a gold span and a predicted span per document,
  micro-averaged P/R/F1 plus macro-F1. The identity
  F1 = 2*overlap/(|pred| + |gold|) keeps even the harmonic mean in
  single integer divisions.

Scale posture: every query is one documents scan folded straight to a
bounded table (task-sample explode -> <= n+1 pass-count rows; label
derivation -> 16 confusion cells; span arithmetic -> one report row).
No windows anywhere, no data-sized joins — the only exchanges are
map-side-combined hash aggregations, and the second-level aggregations
run on category/count-domain tables (the bounded-driver-control class
the BPE argmax established).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import read_table
from .registry import register

MICRO = 1_000_000

# pass@k panel: n samples per task, the two report ks
PASS_N = 10
PASS_K = 5  # pass@1 is also reported (its formula collapses to c/n)
PASS_OK_NIBBLE = 6  # sample correct iff md5 nibble < 6 (p = 6/16)
_PERM_N_K = 30240  # perm(10, 5) = 10*9*8*7*6

KAPPA_CATS = 4
KAPPA_FAITHFUL_NIBBLE = 11  # annotator copies the latent label iff nibble < 11

SPAN_MAX_LEN = 5  # spans are 1..5 tokens


def _nibble_sql(salt: str, expr: str) -> str:
    """First hex nibble (0..15) of md5('<salt>:' || expr) — DuckDB."""
    return (
        f"(strpos('0123456789abcdef', substr(md5('{salt}:' || "
        f"CAST({expr} AS VARCHAR)), 1, 1)) - 1)"
    )


def _nibble_col(salt: str, col: F.Column) -> F.Column:
    """Same nibble on the Spark side (queries_evalprep._rel_col idiom)."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 1), 16, 10).cast("int")


# ------------------------------- pass@k -------------------------------


def _perm_product_sql(c: str) -> str:
    """perm(PASS_N - c, PASS_K) as a falling-factorial product literal."""
    return " * ".join(f"({PASS_N} - {c} - {i})" for i in range(PASS_K))


@register(
    "pass_at_k",
    driver=False,
    oracle=f"""
WITH samples AS (
  SELECT doc_id, s,
         CASE WHEN {_nibble_sql("pass", "doc_id || '/' || s")} < {PASS_OK_NIBBLE}
              THEN 1 ELSE 0 END AS ok
  FROM documents, unnest(generate_series(0, {PASS_N - 1})) AS t(s)
),
per_task AS (
  SELECT doc_id, CAST(sum(ok) AS BIGINT) AS c FROM samples GROUP BY doc_id
)
SELECT CAST(c AS BIGINT) AS n_correct,
       CAST(count(*) AS BIGINT) AS n_tasks,
       CAST(({MICRO} * c) // {PASS_N} AS BIGINT) AS pass1_micro,
       CAST({MICRO} - ({MICRO} * ({_perm_product_sql("c")})) // {_PERM_N_K}
            AS BIGINT) AS pass5_micro
FROM per_task GROUP BY c ORDER BY c
""",
)
def pass_at_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@1 and pass@{PASS_K} per correct-count bucket over
    {PASS_N} deterministic samples per task (task = document, sample
    verdict = md5 nibble — the stand-in for an execution harness's
    pass/fail table). Two hash aggregations: task-sized then
    (n+1)-row; the estimator itself is exact integer micros (see
    module docstring for why the falling factorial needs no clamp)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    samples = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(PASS_N - 1))).alias("s")
    )
    ok = (
        _nibble_col(
            "pass", F.concat(F.col("doc_id").cast("string"), F.lit("/"), F.col("s"))
        )
        < PASS_OK_NIBBLE
    ).cast("int")
    per_task = (
        samples.select("doc_id", ok.alias("ok"))
        .groupBy("doc_id")
        .agg(F.sum("ok").cast("bigint").alias("c"))
    )
    prod = " * ".join(f"({PASS_N} - c - {i})" for i in range(PASS_K))
    return (
        per_task.groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tasks"))
        .selectExpr(
            "CAST(c AS BIGINT) AS n_correct",
            "n_tasks",
            f"CAST(({MICRO} * c) div {PASS_N} AS BIGINT) AS pass1_micro",
            f"CAST({MICRO} - ({MICRO} * ({prod})) div {_PERM_N_K} AS BIGINT)"
            " AS pass5_micro",
        )
        .orderBy("n_correct")
    )


# -------------------- annotator agreement (Cohen's kappa) --------------------


def _label_sql(who: str) -> str:
    """Annotator label: the shared latent category unless this
    annotator's noise nibble fires, then an independent category."""
    latent = f"({_nibble_sql('lat', 'doc_id')} % {KAPPA_CATS})"
    alt = f"({_nibble_sql('alt' + who, 'doc_id')} % {KAPPA_CATS})"
    faithful = f"{_nibble_sql('nz' + who, 'doc_id')} < {KAPPA_FAITHFUL_NIBBLE}"
    return f"CASE WHEN {faithful} THEN {latent} ELSE {alt} END"


def _label_col(who: str) -> F.Column:
    latent = _nibble_col("lat", F.col("doc_id")) % KAPPA_CATS
    alt = _nibble_col("alt" + who, F.col("doc_id")) % KAPPA_CATS
    return (
        F.when(
            _nibble_col("nz" + who, F.col("doc_id")) < KAPPA_FAITHFUL_NIBBLE, latent
        )
        .otherwise(alt)
        .cast("int")
    )


_LABELED_SQL = f"""
labeled AS (
  SELECT doc_id, CAST({_label_sql("A")} AS INTEGER) AS label_a,
         CAST({_label_sql("B")} AS INTEGER) AS label_b
  FROM documents
)
"""


def _labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents").select(
        "doc_id", _label_col("A").alias("label_a"), _label_col("B").alias("label_b")
    )


@register(
    "annotator_confusion",
    driver=False,
    oracle=f"""
WITH {_LABELED_SQL}
SELECT label_a, label_b, CAST(count(*) AS BIGINT) AS n
FROM labeled GROUP BY label_a, label_b ORDER BY label_a, label_b
""",
)
def annotator_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {KAPPA_CATS}x{KAPPA_CATS} inter-annotator confusion matrix —
    the table every labeling-quality review starts from. One scan, one
    map-side-combined aggregation to 16 cells."""
    return (
        _labeled(spark, sf_dir)
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("label_a", "label_b")
    )


@register(
    "cohens_kappa",
    driver=False,
    oracle=f"""
WITH {_LABELED_SQL},
conf AS (
  SELECT label_a, label_b, CAST(count(*) AS BIGINT) AS n
  FROM labeled GROUP BY label_a, label_b
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN label_a = label_b THEN n ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM conf
),
pe AS (
  SELECT CAST(sum(ma.na * mb.nb) AS BIGINT) AS pe_num
  FROM (SELECT label_a AS c, CAST(sum(n) AS BIGINT) AS na FROM conf GROUP BY 1) ma
  JOIN (SELECT label_b AS c, CAST(sum(n) AS BIGINT) AS nb FROM conf GROUP BY 1) mb
    ON ma.c = mb.c
),
m AS (
  SELECT n_docs, n_agree,
         CAST(({MICRO} * n_agree) // n_docs AS BIGINT) AS po_micro,
         CAST(({MICRO} * pe_num) // (n_docs * n_docs) AS BIGINT) AS pe_micro
  FROM tot, pe
)
SELECT n_docs, n_agree, po_micro, pe_micro,
       -- kappa is NEGATIVE for below-chance agreement: emulate Spark's
       -- truncating div (DuckDB // floors) with sign * (abs // d)
       CAST(CASE WHEN po_micro < pe_micro
                 THEN -(({MICRO} * (pe_micro - po_micro)) // ({MICRO} - pe_micro))
                 ELSE ({MICRO} * (po_micro - pe_micro)) // ({MICRO} - pe_micro)
            END AS BIGINT) AS kappa_micro
FROM m
""",
)
def cohens_kappa_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected two-annotator agreement, exact in micros:
    po = observed agreement, pe = marginal-product chance agreement,
    kappa = (po - pe) / (1 - pe) — each held as one integer division of
    exact counts, so the statistic is bit-identical cross-engine.
    Physical shape: the data-sized work is ONE aggregation to the
    16-cell confusion table; marginals, the pe dot-product, and the
    final ratio all run on category-sized tables (bounded exchanges,
    like the token_budget_allocation window)."""
    conf = (
        _labeled(spark, sf_dir)
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = conf.agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("label_a") == F.col("label_b"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    ma = conf.groupBy(F.col("label_a").alias("c")).agg(
        F.sum("n").cast("bigint").alias("na")
    )
    mb = conf.groupBy(F.col("label_b").alias("c")).agg(
        F.sum("n").cast("bigint").alias("nb")
    )
    pe = (
        ma.join(mb, "c")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("pe_num"))
    )
    return (
        tot.crossJoin(F.broadcast(pe))  # 1-row scalars: bounded
        .selectExpr(
            "n_docs",
            "n_agree",
            f"CAST(({MICRO} * n_agree) div n_docs AS BIGINT) AS po_micro",
            f"CAST(({MICRO} * pe_num) div (n_docs * n_docs) AS BIGINT) AS pe_micro",
        )
        .selectExpr(
            "n_docs",
            "n_agree",
            "po_micro",
            "pe_micro",
            f"CAST(({MICRO} * (po_micro - pe_micro)) div ({MICRO} - pe_micro)"
            " AS BIGINT) AS kappa_micro",
        )
    )


# --------------------------- span extraction F1 ---------------------------

_SPANS_SQL = f"""
spans AS (
  SELECT doc_id, ntok,
         greatest(0, least(g0 + glen, ntok) - g0) AS glen_eff,
         greatest(0, least(p0 + plen, ntok) - p0) AS plen_eff,
         greatest(0, least(least(g0 + glen, ntok), least(p0 + plen, ntok))
                     - greatest(g0, p0)) AS ov
  FROM (
    SELECT doc_id, ntok,
           {_nibble_sql("g0", "doc_id")} % greatest(ntok, 1) AS g0,
           1 + {_nibble_sql("gl", "doc_id")} % {SPAN_MAX_LEN} AS glen,
           {_nibble_sql("p0", "doc_id")} % greatest(ntok, 1) AS p0,
           1 + {_nibble_sql("pl", "doc_id")} % {SPAN_MAX_LEN} AS plen
    FROM (SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents)
  )
)
"""


@register(
    "span_f1_report",
    driver=False,
    oracle=f"""
WITH {_SPANS_SQL}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ov) AS BIGINT) AS total_overlap,
       CAST(({MICRO} * sum(ov)) // sum(plen_eff) AS BIGINT) AS micro_p_micro,
       CAST(({MICRO} * sum(ov)) // sum(glen_eff) AS BIGINT) AS micro_r_micro,
       CAST((2 * {MICRO} * sum(ov)) // (sum(plen_eff) + sum(glen_eff))
            AS BIGINT) AS micro_f1_micro,
       CAST(sum((2 * {MICRO} * ov) // (plen_eff + glen_eff)) // count(*)
            AS BIGINT) AS macro_f1_micro
FROM spans WHERE plen_eff + glen_eff > 0
""",
)
def span_f1_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction scoring: token-index overlap between a gold span and
    a predicted span per document (md5-derived positions — the
    deterministic stand-in for a model-output table), micro-averaged
    P/R/F1 and macro-F1. F1 = 2*ov/(|pred|+|gold|) keeps the harmonic
    mean a single integer division, so both averages are exact micros.
    One scan folded to one row; span clipping guarantees the summed
    denominators are positive on any fixture with nonempty texts."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("ntok")
    )
    raw = docs.select(
        "doc_id",
        "ntok",
        (_nibble_col("g0", F.col("doc_id")) % F.greatest("ntok", F.lit(1))).alias("g0"),
        (1 + _nibble_col("gl", F.col("doc_id")) % SPAN_MAX_LEN).alias("glen"),
        (_nibble_col("p0", F.col("doc_id")) % F.greatest("ntok", F.lit(1))).alias("p0"),
        (1 + _nibble_col("pl", F.col("doc_id")) % SPAN_MAX_LEN).alias("plen"),
    )
    spans = raw.selectExpr(
        "doc_id",
        "greatest(0, least(g0 + glen, ntok) - g0) AS glen_eff",
        "greatest(0, least(p0 + plen, ntok) - p0) AS plen_eff",
        "greatest(0, least(least(g0 + glen, ntok), least(p0 + plen, ntok))"
        " - greatest(g0, p0)) AS ov",
    ).filter("plen_eff + glen_eff > 0")
    return spans.selectExpr(
        "CAST(ov AS BIGINT) AS ov",
        "CAST(plen_eff AS BIGINT) AS plen_eff",
        "CAST(glen_eff AS BIGINT) AS glen_eff",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ov").cast("bigint").alias("total_overlap"),
        F.expr(f"CAST(({MICRO} * sum(ov)) div sum(plen_eff) AS BIGINT)").alias(
            "micro_p_micro"
        ),
        F.expr(f"CAST(({MICRO} * sum(ov)) div sum(glen_eff) AS BIGINT)").alias(
            "micro_r_micro"
        ),
        F.expr(
            f"CAST((2 * {MICRO} * sum(ov)) div (sum(plen_eff) + sum(glen_eff))"
            " AS BIGINT)"
        ).alias("micro_f1_micro"),
        F.expr(
            f"CAST(sum((2 * {MICRO} * ov) div (plen_eff + glen_eff)) div count(*)"
            " AS BIGINT)"
        ).alias("macro_f1_micro"),
    )


# ----------------------- confidence calibration -----------------------

CAL_CONF_BASE = 250_000  # conf_micro = base + nibble * step: 0.25 .. 0.953125
CAL_CONF_STEP = 46_875
CAL_LABEL_STEP = 62_500  # label ~ Bernoulli(conf): nibble*step < conf
CAL_BIN_W = 100_000  # five top-label bins over [0.5, 1.0)

_CAL_SQL = f"""
cal AS (
  SELECT doc_id, conf_micro,
         CASE WHEN {_nibble_sql("lab", "doc_id")} * {CAL_LABEL_STEP} < conf_micro
              THEN 1 ELSE 0 END AS label,
         CASE WHEN conf_micro >= 500000 THEN 1 ELSE 0 END AS predicted
  FROM (
    SELECT doc_id,
           {CAL_CONF_BASE} + {_nibble_sql("c", "doc_id")} * {CAL_CONF_STEP}
             AS conf_micro
    FROM documents
  )
),
binned AS (
  SELECT (conf_top - 500000) // {CAL_BIN_W} AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(correct) AS BIGINT) AS n_correct,
         CAST(sum(conf_top) AS BIGINT) AS sum_conf
  FROM (
    SELECT CASE WHEN predicted = 1 THEN conf_micro
                ELSE 1000000 - conf_micro END AS conf_top,
           CASE WHEN predicted = label THEN 1 ELSE 0 END AS correct
    FROM cal
  ) GROUP BY bin
)
"""


def _cal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, n, n_correct, sum_conf) — the binned top-label calibration
    table both calibration queries fold. Labels are Bernoulli(conf) by
    md5 nibble, so the synthetic model is near-calibrated by
    construction and the gap columns measure sampling noise, not a
    broken fixture."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    conf = (CAL_CONF_BASE + _nibble_col("c", F.col("doc_id")) * CAL_CONF_STEP).alias(
        "conf_micro"
    )
    cal = docs.select("doc_id", conf).select(
        "conf_micro",
        (
            _nibble_col("lab", F.col("doc_id")) * CAL_LABEL_STEP
            < F.col("conf_micro")
        )
        .cast("int")
        .alias("label"),
        (F.col("conf_micro") >= 500_000).cast("int").alias("predicted"),
    )
    top = cal.select(
        F.when(F.col("predicted") == 1, F.col("conf_micro"))
        .otherwise(1_000_000 - F.col("conf_micro"))
        .alias("conf_top"),
        (F.col("predicted") == F.col("label")).cast("int").alias("correct"),
    )
    return (
        top.groupBy(((F.col("conf_top") - 500_000) / CAL_BIN_W).cast("bigint").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("correct").cast("bigint").alias("n_correct"),
            F.sum("conf_top").cast("bigint").alias("sum_conf"),
        )
    )


@register(
    "calibration_report",
    driver=False,
    oracle=f"""
WITH {_CAL_SQL}
SELECT CAST(bin AS BIGINT) AS bin, n, n_correct,
       CAST(({MICRO} * n_correct) // n AS BIGINT) AS acc_micro,
       CAST(sum_conf // n AS BIGINT) AS avg_conf_micro,
       CAST(abs(({MICRO} * n_correct) // n - sum_conf // n) AS BIGINT)
         AS gap_micro
FROM binned ORDER BY bin
""",
)
def calibration_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reliability diagram as a table: five top-label confidence
    bins over [0.5, 1.0), each with accuracy, mean confidence, and the
    |acc - conf| gap in exact micros. One scan to five rows; the md5
    label model is Bernoulli(conf), so gaps stay small and nonzero —
    a real miscalibrated model shows up as a monotone gap ramp here."""
    return _cal(spark, sf_dir).selectExpr(
        "CAST(bin AS BIGINT) AS bin",
        "n",
        "n_correct",
        f"CAST(({MICRO} * n_correct) div n AS BIGINT) AS acc_micro",
        "CAST(sum_conf div n AS BIGINT) AS avg_conf_micro",
        f"CAST(abs(({MICRO} * n_correct) div n - sum_conf div n) AS BIGINT)"
        " AS gap_micro",
    ).orderBy("bin")


@register(
    "calibration_ece",
    driver=False,
    oracle=f"""
WITH {_CAL_SQL}
SELECT CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(n * abs(({MICRO} * n_correct) // n - sum_conf // n))
            // sum(n) AS BIGINT) AS ece_micro,
       CAST(max(abs(({MICRO} * n_correct) // n - sum_conf // n)) AS BIGINT)
         AS mce_micro
FROM binned
""",
)
def calibration_ece_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected and Maximum Calibration Error over the top-label bins:
    ECE = sum_b (n_b/N) * |acc_b - conf_b|, MCE = max_b of the gap —
    the two numbers a model card quotes. Every division is integer on
    a per-bin exact count, so both are bit-identical cross-engine.
    The final fold runs on the five-row binned table."""
    b = _cal(spark, sf_dir).selectExpr(
        "n",
        f"abs(({MICRO} * n_correct) div n - sum_conf div n) AS gap",
    )
    return b.agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.expr("CAST(sum(n * gap) div sum(n) AS BIGINT)").alias("ece_micro"),
        F.max("gap").cast("bigint").alias("mce_micro"),
    )
