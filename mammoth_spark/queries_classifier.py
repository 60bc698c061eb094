"""Training the quality classifier IN the engine: full-batch logistic
regression by gradient descent, the train-side companion to
``classifier_score`` (which only APPLIES a fixed linear model). The
task is RULE DISTILLATION — the practice of fitting a cheap linear
scorer to agree with an expensive rule suite (here a Gopher-style gate:
enough tokens AND enough stopwords) so the 100 TB corpus pays one
fused expression per document instead of the full rule battery, and so
the score is a smooth rankable margin rather than a hard gate. Same
iterate-aggregate-broadcast shape as ``kmeans_step`` and ``bpe_train``.

Cross-engine exactness (the kmeans/drift convention, extended to a
transcendental link function):

- Features are doubles derived from exact integers by the SAME literal
  expression text on both sides (capped counts recentered around the
  rule thresholds), so every IEEE operation matches.
- The sigmoid link runs per ROW (``1/(1+exp(-z))`` with z built as the
  same left-associated sum), and each row's gradient contribution is
  floored to integer micro-units BEFORE summation — the only cross-row
  sums are bigint sums. Gradient totals are < 2^53, so the weight
  update ``floor((LR * G) / n)`` is exact in double on both engines
  (double division instead of integer DIV because Spark's DIV
  truncates toward zero while floor semantics are wanted for negative
  gradients).
- Iteration 1 starts from w = 0, where the full expression reduces to
  sigma = 0.5 exactly (exp(0) == 1 in IEEE); the oracle unrolls the
  same GD_ITERS iterations as CTEs with the weights carried as scalar
  columns. Final training accuracy ~0.94 against a 0.70 base rate at
  fixture scale — the model demonstrably learns the gate, it does not
  collapse to the majority class.

Scale shape: ONE pass per GD iteration over the feature table (a
single partial-aggregated scan producing D bigint gradient totals per
partition — the gradient is a mergeable sketch, like the moment
sketches in ``numeric_drift_report``), followed by a 1-row driver
collect and a literal-folded weight update (the BPE argmax convention:
bounded driver control, never data). The feature table itself is one
documents scan, localCheckpointed and shared by all iterations + eval.
At 100 TB: GD_ITERS x one columnar scan with zero shuffles beyond the
partial-agg exchange; weights never leave micro-integer space so
convergence is bit-reproducible run to run.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import _tokens
from .model import read_table
from .registry import register

GD_ITERS = 8
GD_LR = 4  # integer learning rate: delta_w_micro = floor((GD_LR * G) / n)
RULE_MIN_TOKENS = 30  # the distilled gate: n_tokens >= 30 ...
RULE_MIN_STOP = 2  # ... AND >= 2 stopword occurrences
_STOP = ("the", "a", "of", "and")
_FEATURES = ("bias", "len_c", "stop_c", "meanlen_cap")
_NF = len(_FEATURES)


def _feature_table(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> DataFrame:
    """Per-document features + the rule label, every value a double
    derived from exact integers (identical expression text in the
    oracle's ``f`` CTE). len/stop counts are capped at 2x the rule
    threshold and recentered to [-1, 1] — without the recentering,
    full-batch GD from w=0 needs ~10x the iterations to move the
    decision boundary off the origin (measured on the fixture)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOP))).cast("bigint")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    out = docs.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        (
            F.least(n_tok, F.lit(2 * RULE_MIN_TOKENS)).cast("double")
            / F.lit(float(RULE_MIN_TOKENS))
            - F.lit(1.0)
        ).alias("x1"),
        (
            F.least(n_stop, F.lit(2 * RULE_MIN_STOP)).cast("double")
            / F.lit(float(RULE_MIN_STOP))
            - F.lit(1.0)
        ).alias("x2"),
        F.when(
            n_tok > 0,
            F.least(
                sum_len.cast("double") / n_tok.cast("double") / F.lit(10.0),
                F.lit(1.0),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("x3"),
        F.when(
            (n_tok >= RULE_MIN_TOKENS) & (n_stop >= RULE_MIN_STOP), F.lit(1.0)
        )
        .otherwise(F.lit(0.0))
        .alias("y"),
    )
    return out.localCheckpoint() if checkpoint else out


def _z(w_micro: list[int]):
    z = F.lit(0.0)
    for j, w in enumerate(w_micro):
        z = z + (F.lit(int(w)).cast("double") / F.lit(1000000.0)) * F.col(f"x{j}")
    return z


def _train_weights(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[int]]:
    """GD_ITERS full-batch iterations; returns (feature table, final
    micro-integer weights). Per iteration: one scan -> D bigint gradient
    totals (partial-aggregated) -> 1-row collect -> literal-folded
    update (bounded driver control)."""
    feats = _feature_table(spark, sf_dir)
    n = None  # rides the FIRST gradient agg (one fewer job, r13)
    w = [0] * _NF
    for _ in range(GD_ITERS):
        s = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w)))
        aggs = [
            F.sum(
                F.floor(
                    (s - F.col("y")) * F.col(f"x{j}") * F.lit(1000000.0)
                ).cast("bigint")
            ).alias(f"g{j}")
            for j in range(_NF)
        ]
        if n is None:
            aggs.append(F.count(F.lit(1)).alias("_n"))
        grads = feats.agg(*aggs).collect()[0]
        if n is None:
            n = grads["_n"]
        w = [
            w[j] - math.floor((GD_LR * 1.0 * grads[f"g{j}"]) / n)
            for j in range(_NF)
        ]
    return feats, w


def _oracle_feature_cte() -> str:
    stop = ", ".join(f"'{s}'" for s in _STOP)
    return f"""
f AS (
  SELECT doc_id,
         1.0 AS x0,
         CAST(least(len(toks), {2 * RULE_MIN_TOKENS}) AS DOUBLE)
           / {float(RULE_MIN_TOKENS)} - 1.0 AS x1,
         CAST(least(len(list_filter(toks, t -> t IN ({stop}))),
                    {2 * RULE_MIN_STOP}) AS DOUBLE)
           / {float(RULE_MIN_STOP)} - 1.0 AS x2,
         CASE WHEN len(toks) > 0
              THEN least(CAST(list_sum(list_transform(toks, t -> length(t)))
                              AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE) / 10.0, 1.0)
              ELSE 0.0 END AS x3,
         CASE WHEN len(toks) >= {RULE_MIN_TOKENS}
               AND len(list_filter(toks, t -> t IN ({stop})))
                   >= {RULE_MIN_STOP}
              THEN 1.0 ELSE 0.0 END AS y
  FROM (SELECT doc_id, text,
               regexp_extract_all(text,
                 '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]') AS toks
        FROM documents)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f)"""


def _oracle_z() -> str:
    return "0.0 + " + " + ".join(
        f"(CAST(w.w{j} AS DOUBLE) / 1000000.0) * f.x{j}" for j in range(_NF)
    )


def _oracle_iter(r: int) -> str:
    """One unrolled GD iteration: gradient totals under weights w{r},
    then the floored micro-update into w{r+1}."""
    gsum = ", ".join(
        f"sum(CAST(floor((1.0 / (1.0 + exp(-({_oracle_z()}))) - f.y) * f.x{j}"
        f" * 1000000.0) AS BIGINT)) AS g{j}"
        for j in range(_NF)
    )
    wup = ", ".join(
        f"w.w{j} - CAST(floor(({GD_LR}.0 * g.g{j}) / nn.n) AS BIGINT) AS w{j}"
        for j in range(_NF)
    )
    return f""",
g{r} AS (SELECT {gsum} FROM f, w{r} w),
w{r + 1} AS (SELECT {wup} FROM w{r} w, g{r} g, nn)"""


_ORACLE_W0 = ",\nw0 AS (SELECT " + ", ".join(
    f"CAST(0 AS BIGINT) AS w{j}" for j in range(_NF)
) + ")"

_ORACLE_CHAIN = (
    "WITH "
    + _oracle_feature_cte()
    + _ORACLE_W0
    + "".join(_oracle_iter(r) for r in range(GD_ITERS))
)


@register(
    "quality_classifier_train",
    oracle=_ORACLE_CHAIN
    + f"""
SELECT feature, w_micro FROM (
  {" UNION ALL ".join(
      f"SELECT '{name}' AS feature, w{j} AS w_micro FROM w{GD_ITERS}"
      for j, name in enumerate(_FEATURES)
  )}
) ORDER BY feature
""",
)
def quality_classifier_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill the rule gate into a linear scorer: GD_ITERS full-batch
    logistic-GD iterations over the document feature table; reports the
    final micro-integer weight per feature (bit-identical to the
    oracle's unrolled CTE chain). The returned table is driver-built
    from the collected weights — the model artifact, not data."""
    _, w = _train_weights(spark, sf_dir)
    rows = [(name, int(w[j])) for j, name in enumerate(_FEATURES)]
    from .model import local_df

    return local_df(
        spark, rows, "feature string, w_micro bigint"
    ).orderBy("feature")


@register(
    "quality_classifier_eval",
    oracle=_ORACLE_CHAIN
    + f"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_label,
       CAST(sum(CASE WHEN z >= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
       CAST(sum(CASE WHEN (z >= 0.0) = (y = 1.0) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(floor(sum(CASE WHEN (z >= 0.0) = (y = 1.0) THEN 1 ELSE 0 END)
                  * 1000.0 / count(*)) AS BIGINT) AS acc_milli
FROM (
  SELECT f.y, {_oracle_z()} AS z FROM f, w{GD_ITERS} w
)
""",
)
def quality_classifier_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the distilled model back to the corpus: decision boundary
    z >= 0 against the rule label, one scan over the checkpointed
    feature table with the final weights literal-folded. Reports the
    agreement rate (train accuracy ~0.94 vs the 0.70 majority base at
    fixture scale) — the number a pipeline tracks per retrain to decide
    whether the cheap scorer may replace the rule battery."""
    feats, w = _train_weights(spark, sf_dir)
    pred = _z(w) >= F.lit(0.0)
    truth = F.col("y") == F.lit(1.0)
    return feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(truth, 1).otherwise(0)).cast("bigint").alias("n_pos_label"),
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias("n_pred_pos"),
        F.sum(F.when(pred == truth, 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.floor(
            F.sum(F.when(pred == truth, 1).otherwise(0)) * F.lit(1000.0)
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("acc_milli"),
    )
