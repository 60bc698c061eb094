"""Data-mixing and curriculum operators: the step between corpus
curation and the training run — decide HOW MUCH of each domain enters
the mixture and IN WHAT ORDER.

Three operators every large-scale pretraining pipeline runs after
dedup/quality filtering (beyond-reference surface, like the rest of
the LLM-pipeline waves; the reference is a CDC engine with no corpus
ops):

- ``temperature_mixture_weights``: temperature-scaled (alpha) sampling
  weights per domain — w_d proportional to size_d^alpha with alpha=0.5,
  the standard multilingual/multi-domain rebalancing (raise rare
  domains, damp dominant ones). Exactness: sqrt IS correctly rounded
  under IEEE 754 (unlike ln/exp — no libm caveat here), so
  floor(sqrt(size)*1e6) is bit-identical cross-engine, and the
  normalization is integer div in decimal(38,0)/HUGEINT.

- ``token_budget_allocation``: apportion an integer token budget across
  domains proportional to those weights with the LARGEST-REMAINDER
  method (Hamilton apportionment): base_d = floor(B*s_d/S), then the
  B - sum(base) leftover units go to the largest fractional remainders
  (ties by domain name). Every intermediate is an integer — the
  allocation is exact and sums to the budget by construction.

- ``curriculum_buckets``: stage assignment by document-length quantile
  (semantics of ntile over a total order) — the shortest quarter trains
  first. The total order (n_chars, doc_id) makes it deterministic.

- ``curriculum_buckets_approx``: the boundary-cut variant of the same
  staging — stage = position relative to three broadcast length
  boundaries instead of an exact global rank. Zero data-sized windows;
  ties share a stage (the wobble the exact query does not have), and a
  pytest asserts >= 99% doc-level agreement with the exact stages.

Scale posture: the first two aggregate the corpus to a DOMAIN-sized
table (one pass, one hash-agg shuffle); the apportionment window runs
on that domain-sized table — single partition, but bounded by the
domain count (dozens), the same bounded-driver-control class as the
BPE argmax. curriculum_buckets computes the exact global rank WITHOUT
a global window: a length histogram (bounded: one row per distinct
n_chars) yields count-balanced shard cuts and per-shard rank offsets;
the only data-sized wide op is ONE per-shard rank window — the
corpus_shuffle pattern, with range shards instead of hash shards.
curriculum_buckets_approx drops even that window: boundaries come off
the histogram, docs are labeled in a single scan — the 100 TB path,
with the exact query as its agreement oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .model import read_table
from .registry import register

ALPHA_SQRT_SCALE = 1_000_000  # micro fixed-point for sqrt(size)
WEIGHT_SCALE = 1_000_000  # micro fixed-point for normalized weights
TOKEN_BUDGET = 1_000_000  # tokens to apportion across domains
CURRICULUM_STAGES = 4
# Parallelism knob for the exact ranking: one shard sorts ~N/SHARDS docs
# (like SHUF_SHARDS in corpus_shuffle — 32 here, ~100k on a real cluster
# so each shard is an executor-sized slice).
CURRICULUM_SHARDS = 32


def _domain_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass -> domain-sized table: doc counts and char mass
    per source. The ONLY data-sized job in this wave."""
    return (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("raw_chars"),
        )
    )


_DOMAIN_SIZES_SQL = """
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS raw_chars
  FROM documents GROUP BY source
"""


@register(
    "temperature_mixture_weights",
    driver=False,
    oracle=f"""
WITH sizes AS ({_DOMAIN_SIZES_SQL}),
scaled AS (
  SELECT source, n_docs, raw_chars,
         CAST(floor(sqrt(CAST(raw_chars AS DOUBLE)) * {ALPHA_SQRT_SCALE})
              AS BIGINT) AS s
  FROM sizes
)
SELECT source, n_docs, raw_chars,
       CAST((CAST(s AS HUGEINT) * {WEIGHT_SCALE})
            // (SELECT sum(CAST(s AS HUGEINT)) FROM scaled) AS BIGINT)
         AS weight_micro
FROM scaled
ORDER BY source
""",
)
def temperature_mixture_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha=0.5 temperature mixture weights per source domain (micro
    fixed-point, sum <= 1e6 with the div truncation). sqrt is the one
    transcendental-free root: IEEE 754 REQUIRES correct rounding for
    it, so the per-domain scaled size is bit-identical cross-engine
    with no libm assumption."""
    sizes = _domain_sizes(spark, sf_dir)
    scaled = sizes.withColumn(
        "s",
        F.floor(F.sqrt(F.col("raw_chars").cast("double")) * ALPHA_SQRT_SCALE).cast(
            "bigint"
        ),
    )
    total = scaled.select(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("_total")
    )
    return (
        scaled.crossJoin(F.broadcast(total))  # 1-row scalar: bounded
        .select(
            "source",
            "n_docs",
            "raw_chars",
            F.expr(f"CAST((CAST(s AS DECIMAL(38,0)) * {WEIGHT_SCALE}) div _total AS BIGINT)")
            .alias("weight_micro"),
        )
        .orderBy("source")
    )


@register(
    "token_budget_allocation",
    driver=False,
    oracle=f"""
WITH sizes AS ({_DOMAIN_SIZES_SQL}),
quota AS (
  SELECT source, raw_chars,
         CAST((CAST(raw_chars AS HUGEINT) * {TOKEN_BUDGET})
              // (SELECT sum(CAST(raw_chars AS HUGEINT)) FROM sizes)
           AS BIGINT) AS base_alloc,
         CAST((CAST(raw_chars AS HUGEINT) * {TOKEN_BUDGET})
              % (SELECT sum(CAST(raw_chars AS HUGEINT)) FROM sizes)
           AS BIGINT) AS remainder
  FROM sizes
),
ranked AS (
  SELECT *,
         rank() OVER (ORDER BY remainder DESC, source) AS rem_rank,
         (SELECT {TOKEN_BUDGET} - sum(base_alloc) FROM quota) AS leftover
  FROM quota
)
SELECT source, raw_chars, base_alloc,
       CAST(CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS final_alloc
FROM ranked
ORDER BY source
""",
)
def token_budget_allocation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of TOKEN_BUDGET across domains,
    proportional to char mass: floor quotas, then the leftover units go
    to the largest remainders (Hamilton's method — the allocation sums
    EXACTLY to the budget, which proportional-floor alone cannot).
    Window + scalar run on the domain-sized table: single partition by
    construction, bounded by the domain count."""
    sizes = _domain_sizes(spark, sf_dir)
    d38 = "CAST(raw_chars AS DECIMAL(38,0))"
    total = sizes.select(F.sum(F.expr(d38)).alias("_total"))
    quota = sizes.crossJoin(F.broadcast(total)).select(
        "source",
        "raw_chars",
        F.expr(f"CAST(({d38} * {TOKEN_BUDGET}) div _total AS BIGINT)").alias(
            "base_alloc"
        ),
        F.expr(f"CAST(({d38} * {TOKEN_BUDGET}) % _total AS BIGINT)").alias(
            "remainder"
        ),
    )
    w_all = Window.partitionBy()  # domain-sized: bounded single partition
    ranked = quota.select(
        "*",
        F.rank().over(w_all.orderBy(F.desc("remainder"), F.asc("source"))).alias(
            "rem_rank"
        ),
        (F.lit(TOKEN_BUDGET) - F.sum("base_alloc").over(w_all)).alias("leftover"),
    )
    extra = F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "source",
        "raw_chars",
        "base_alloc",
        extra.cast("bigint").alias("extra"),
        (F.col("base_alloc") + extra).cast("bigint").alias("final_alloc"),
    ).orderBy("source")


def _curriculum_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, stage) with stage EXACTLY equal to
    ntile(CURRICULUM_STAGES) over (ORDER BY n_chars, doc_id) — computed
    without an unpartitioned window. Construction:

    1. length histogram (one row per distinct n_chars — bounded by the
       length domain, never by row count);
    2. cumulative counts over the histogram give each length value its
       global rank offset AND a count-balanced shard id
       floor(cum_before * SHARDS / N) — monotone in n_chars, so shard
       ranges respect the global order. All rows of one length share a
       shard (ties need a single doc_id sort to be ranked exactly; the
       pathological one-length-dominates skew case would need doc_id
       range cuts instead — documented, not fixture-reachable);
    3. per-shard row_number over (n_chars, doc_id) — the ONE data-sized
       exchange, hashpartitioning(shard) with ~N/SHARDS rows each (the
       corpus_shuffle shape);
    4. global rank g = shard offset (min cum_before in shard) + shard
       pos, and stage falls out of the ntile arithmetic: with
       q = N div k, r = N mod k, the first r buckets hold q+1 rows —
       g <= (q+1)*r  ->  stage = (g-1) div (q+1) + 1,
       else             stage = r + (g - (q+1)*r - 1) div q + 1.
       Pure integer, bit-identical to the ntile oracle.
    """
    docs = read_table(spark, sf_dir, "documents")
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w_cum = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()  # histogram-sized: bounded single partition
    hist2 = hist.select(
        "n_chars",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("cum_before"),
        F.sum("cnt").over(w_all).alias("n_total"),
    ).withColumn(
        "shard",
        F.expr(f"CAST((cum_before * {CURRICULUM_SHARDS}) div n_total AS BIGINT)"),
    )
    offs = hist2.groupBy("shard").agg(
        F.min("cum_before").alias("off"), F.min("n_total").alias("n_total")
    )
    w_shard = Window.partitionBy("shard").orderBy("n_chars", "doc_id")
    pos = (
        docs.select("doc_id", "n_chars")
        .join(F.broadcast(hist2.select("n_chars", "shard")), "n_chars")
        .select(
            "doc_id",
            "n_chars",
            "shard",
            F.row_number().over(w_shard).cast("bigint").alias("pos"),
        )
    )
    k = CURRICULUM_STAGES
    return (
        pos.join(F.broadcast(offs), "shard")
        .withColumn("g", F.col("off") + F.col("pos"))
        .selectExpr(
            "doc_id",
            "n_chars",
            f"""CASE WHEN g <= ((n_total div {k}) + 1) * (n_total % {k})
                  THEN (g - 1) div ((n_total div {k}) + 1) + 1
                  ELSE (n_total % {k})
                       + (g - ((n_total div {k}) + 1) * (n_total % {k}) - 1)
                         div (n_total div {k}) + 1
                END AS stage""",
        )
    )


def _stage_targets_sql(i: int, n: str) -> str:
    """Cumulative row count of exact-ntile stages 1..i over ``n`` rows:
    i*(n div k) + least(i, n mod k) — shared by engine and oracle."""
    k = CURRICULUM_STAGES
    return f"{i} * ({n} // {k}) + least({i}, {n} % {k})"


@register(
    "curriculum_buckets_approx",
    driver=False,
    oracle=f"""
WITH hist AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY n_chars
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
c AS (
  SELECT n_chars, cnt,
         CAST(sum(cnt) OVER (ORDER BY n_chars) AS BIGINT) AS cum
  FROM hist
),
b AS (
  SELECT
    min(CASE WHEN cum >= {_stage_targets_sql(1, "n")} THEN n_chars END) AS b1,
    min(CASE WHEN cum >= {_stage_targets_sql(2, "n")} THEN n_chars END) AS b2,
    min(CASE WHEN cum >= {_stage_targets_sql(3, "n")} THEN n_chars END) AS b3
  FROM c, tot
)
SELECT CAST(1 + (CASE WHEN d.n_chars > b.b1 THEN 1 ELSE 0 END)
              + (CASE WHEN d.n_chars > b.b2 THEN 1 ELSE 0 END)
              + (CASE WHEN d.n_chars > b.b3 THEN 1 ELSE 0 END) AS INTEGER) AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(d.n_chars) AS BIGINT) AS min_chars,
       CAST(max(d.n_chars) AS BIGINT) AS max_chars,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d, b
GROUP BY stage ORDER BY stage
""",
)
def curriculum_buckets_approx_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-cut curriculum staging — the 100 TB path promised by the
    module docstring: three length boundaries come off the histogram
    (b_i = smallest n_chars whose cumulative count reaches the exact
    stage-i cumulative size), get broadcast, and documents are labeled
    in one scan by comparing n_chars against them. ZERO windows touch
    the documents table and there is no rank at all — the trade is that
    ties share a stage, so stage sizes wobble by the tie mass at each
    boundary (the exact query splits ties by doc_id). A pytest asserts
    >= 99% doc-level agreement with ``curriculum_buckets`` at fixture
    scale. Boundaries are EXACT percentile cuts, not a sketch: the
    histogram is length-domain-sized, so exactness costs nothing —
    approx_percentile would only be needed for an unbounded key domain,
    and this construction is what it degrades to."""
    docs = read_table(spark, sf_dir, "documents")
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w_cum = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()  # histogram-sized: bounded
    c = hist.select(
        "n_chars",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    bounds = c.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.expr(_stage_targets_sql(i, "n").replace("//", "div")),
                    F.col("n_chars"),
                )
            ).alias(f"b{i}")
            for i in (1, 2, 3)
        ]
    )
    over = lambda b: F.when(F.col("n_chars") > F.col(b), 1).otherwise(0)  # noqa: E731
    return (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            "n_chars",
            (F.lit(1) + over("b1") + over("b2") + over("b3"))
            .cast("int")
            .alias("stage"),
        )
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("stage")
    )


@register(
    "curriculum_buckets",
    driver=False,
    oracle=f"""
WITH staged AS (
  SELECT doc_id, n_chars,
         ntile({CURRICULUM_STAGES}) OVER (ORDER BY n_chars, doc_id) AS stage
  FROM documents
)
SELECT CAST(stage AS INTEGER) AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM staged GROUP BY stage ORDER BY stage
""",
)
def curriculum_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum staging: each document gets a training
    stage 1..4 by exact length quantile (short documents first); the
    report gives per-stage counts and char boundaries — what a
    curriculum dataloader consumes. Semantics are exactly
    ntile(4) OVER (ORDER BY n_chars, doc_id), but the plan is the
    distributed histogram-offset construction of ``_curriculum_staged``
    — the only data-sized wide ops are the histogram hash-agg and ONE
    per-shard rank exchange; no unpartitioned window ever sees the
    documents table (pinned in tests/test_plans.py)."""
    return (
        _curriculum_staged(spark, sf_dir)
        .groupBy(F.col("stage").cast("int").alias("stage"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("stage")
    )
