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
  (ntile over a total order) — the shortest quarter trains first.
  ntile's total order makes it deterministic; tie-break by doc_id.

Scale posture: the first two aggregate the corpus to a DOMAIN-sized
table (one pass, one hash-agg shuffle); the apportionment window runs
on that domain-sized table — single partition, but bounded by the
domain count (dozens), the same bounded-driver-control class as the
BPE argmax. curriculum_buckets is a global range-partition sort (the
TeraSort shape Spark distributes natively; the repo's
range_partition_sort query pins that plan) — at 100 TB the stage
boundary would come from approx percentiles instead, trading exactness
for a sort-free pass; the exact ntile here doubles as that variant's
oracle.
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
    """Length-based curriculum staging: ntile(4) over (n_chars, doc_id)
    assigns each document a training stage (short documents first);
    the report gives per-stage counts and char boundaries — what a
    curriculum dataloader consumes. The total order makes the split
    deterministic; the sort is Spark's native distributed range
    partition (TeraSort shape), not a single-node sort."""
    docs = read_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "n_chars",
        F.ntile(CURRICULUM_STAGES)
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("stage"),
    )
    return (
        staged.groupBy(F.col("stage").cast("int").alias("stage"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("stage")
    )
