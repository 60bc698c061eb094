"""In-engine classifier training (mammoth_spark/queries_classifier.py).

Oracle parity runs in tests/test_oracle_parity.py; here: the model must
actually LEARN (accuracy strictly above the majority base rate), the
training must be bit-reproducible, and the physical shape must hold
(one pruned partial-aggregated scan per iteration, no Python in the
plan).
"""

from pyspark.sql import functions as F

from mammoth_spark import queries  # noqa: F401  (registers everything)
from mammoth_spark.queries_classifier import (
    _NF,
    _feature_table,
    _train_weights,
)
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_classifier_learns_above_base_rate(spark):
    # the distilled model must beat majority-class on its own training
    # corpus — a degenerate all-negative/all-positive model would sit AT
    # the base rate, which is what this guards against
    row = QUERIES["quality_classifier_eval"](spark, SF).collect()[0]
    base = max(row["n_pos_label"], row["n_docs"] - row["n_pos_label"])
    assert row["n_correct"] > base, (
        f"model does not beat the majority class: {row}"
    )
    assert 0 < row["n_pred_pos"] < row["n_docs"], "degenerate decision boundary"


def test_classifier_training_bit_reproducible(spark):
    # micro-integer weights + floored updates: two runs must agree
    # exactly, not approximately
    _, w1 = _train_weights(spark, SF)
    _, w2 = _train_weights(spark, SF)
    assert w1 == w2
    assert len(w1) == _NF and any(w != 0 for w in w1)


def test_classifier_feature_scan_pruned_no_python(spark):
    # the per-iteration scan must read only the columns the features
    # need (doc_id, text, lang is NOT needed — the rule label derives
    # from text alone) and stay fully JVM-side
    feats = _feature_table(spark, SF, checkpoint=False)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    read = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" in read and "lang" not in read and "n_chars" not in read


def test_classifier_gradient_agg_partial(spark):
    # the gradient is a mergeable sketch: partial HashAggregate below
    # the exchange, final above — and only ONE exchange (the 1-row
    # gather), never a shuffle of the feature rows
    feats = _feature_table(spark, SF, checkpoint=False)
    s = F.lit(0.5)
    agg = feats.agg(
        *[
            F.sum(
                F.floor((s - F.col("y")) * F.col(f"x{j}") * F.lit(1e6)).cast(
                    "bigint"
                )
            ).alias(f"g{j}")
            for j in range(_NF)
        ]
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, "no partial aggregation"
    assert plan.count("Exchange") == 1, "gradient agg must gather once"
