"""Semantic invariants for the eval-metrology wave (round 8) —
properties the oracle-parity hash can't express: the estimators must
mean what their formulas say, not just agree across engines."""

import pytest

import mammoth_spark.queries  # noqa: F401  — registers every query
from mammoth_spark.queries_evalmetrics import (
    KAPPA_CATS,
    MICRO,
    PASS_N,
)
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_pass_at_k_estimator_shape(rows, spark):
    out = sorted(rows("pass_at_k"), key=lambda r: r["n_correct"])
    from mammoth_spark.model import read_table

    total = read_table(spark, SF, "documents").count()
    assert sum(r["n_tasks"] for r in out) == total
    for r in out:
        c = r["n_correct"]
        assert 0 <= c <= PASS_N
        # pass@1 collapses to c/n exactly
        assert r["pass1_micro"] == (MICRO * c) // PASS_N
        # more samples can only help: pass@5 dominates pass@1
        assert r["pass5_micro"] >= r["pass1_micro"]
        assert 0 <= r["pass5_micro"] <= MICRO
        # 6+ correct out of 10 -> any 5-subset contains a pass
        if c >= 6:
            assert r["pass5_micro"] == MICRO
    # monotone in c
    p5 = [r["pass5_micro"] for r in out]
    assert p5 == sorted(p5)


def test_confusion_and_kappa_consistent(rows):
    conf = rows("annotator_confusion")
    (k,) = rows("cohens_kappa")
    assert sum(r["n"] for r in conf) == k["n_docs"]
    agree = sum(r["n"] for r in conf if r["label_a"] == r["label_b"])
    assert agree == k["n_agree"]
    assert k["po_micro"] == (MICRO * agree) // k["n_docs"]
    assert 0 <= k["pe_micro"] < MICRO
    # the shared-latent design makes the annotators genuinely
    # correlated: chance-corrected agreement must be clearly positive
    # (both copy the latent ~69% of the time -> kappa ~0.4-0.6)
    assert k["kappa_micro"] > 200_000
    assert k["kappa_micro"] < MICRO
    # kappa <= po always (pe >= 0), and every cell/category is present
    assert k["kappa_micro"] <= k["po_micro"]
    cats = {(r["label_a"], r["label_b"]) for r in conf}
    assert all(0 <= a < KAPPA_CATS and 0 <= b < KAPPA_CATS for a, b in cats)


def test_span_f1_bounds_and_identity(rows):
    (r,) = rows("span_f1_report")
    assert r["n_docs"] > 0 and r["total_overlap"] >= 0
    for k in ("micro_p_micro", "micro_r_micro", "micro_f1_micro", "macro_f1_micro"):
        assert 0 <= r[k] <= MICRO
    # harmonic mean never exceeds the arithmetic mean (integer slack 1)
    assert r["micro_f1_micro"] <= (r["micro_p_micro"] + r["micro_r_micro"]) // 2 + 1
    # F1 = 0 iff overlap = 0
    if r["total_overlap"] == 0:
        assert r["micro_f1_micro"] == 0


def test_evalmetrics_plans_stay_bounded(spark):
    """No windows, no Python, no data-sized single-partition funnels:
    each query folds one scan into bounded aggregates."""
    for name in ("pass_at_k", "cohens_kappa", "span_f1_report"):
        plan = (
            QUERIES[name](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan, name
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        # any SinglePartition hop must sit above an aggregation (the
        # 1-row/16-cell scalar funnels), never above a raw scan
        idx = 0
        while True:
            sp = plan.find("Exchange SinglePartition", idx)
            if sp < 0:
                break
            assert "HashAggregate" in plan[sp:], f"{name}: raw-data funnel"
            idx = sp + 1
