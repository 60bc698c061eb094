"""Semantic invariants for the round-8b wave: stratified allocation,
calibration, sequence packing, and the corpus version diff."""

import math

import pytest

import mammoth_spark.queries  # noqa: F401  — registers every query
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_stratified_alloc_is_neyman_and_sums_exactly(rows):
    from mammoth_spark.queries_selection import STRAT_BUDGET, _S_MILLI

    out = rows("stratified_sample_alloc")
    assert out, "no strata"
    # Hamilton: the allocation sums EXACTLY to the budget
    assert sum(r["alloc"] for r in out) == STRAT_BUDGET
    for r in out:
        assert r["n_docs"] > 1
        # s_milli is exactly floor(sqrt(var_floor) * 1e3)
        assert r["s_milli"] == math.floor(math.sqrt(r["var_floor"]) * _S_MILLI)
        assert r["alloc"] >= 0
    # Neyman dominance: the stratum with the largest N*S weight gets
    # the largest allocation
    heaviest = max(out, key=lambda r: r["n_docs"] * r["s_milli"])
    assert heaviest["alloc"] == max(r["alloc"] for r in out)


def test_calibration_report_and_ece_consistent(rows, spark):
    from mammoth_spark.model import read_table
    from mammoth_spark.queries_evalmetrics import MICRO

    report = sorted(rows("calibration_report"), key=lambda r: r["bin"])
    (ece,) = rows("calibration_ece")
    total = read_table(spark, SF, "documents").count()
    assert sum(r["n"] for r in report) == total == ece["n_docs"]
    assert {r["bin"] for r in report} <= {0, 1, 2, 3, 4}
    for r in report:
        assert 0 <= r["acc_micro"] <= MICRO
        assert 500_000 <= r["avg_conf_micro"] < MICRO
        assert r["gap_micro"] == abs(r["acc_micro"] - r["avg_conf_micro"])
    # ECE is the n-weighted mean gap; MCE the max gap
    ece_re = sum(r["n"] * r["gap_micro"] for r in report) // total
    assert ece["ece_micro"] == ece_re
    assert ece["mce_micro"] == max(r["gap_micro"] for r in report)
    assert ece["ece_micro"] <= ece["mce_micro"]
    # the Bernoulli(conf) label model is near-calibrated: ECE well
    # under 10 points at fixture scale
    assert ece["ece_micro"] < 100_000


def test_sequence_packing_accounting(rows, spark):
    from mammoth_spark.model import read_table
    from mammoth_spark.queries_curation import SEQ_LEN

    (r,) = rows("sequence_packing_report")
    total = read_table(spark, SF, "documents").count()
    assert r["n_docs"] == total
    assert r["n_sequences"] == -(-r["total_tokens"] // SEQ_LEN)  # ceil
    assert 0 <= r["n_crossing"] <= r["n_docs"]
    # concat-split packing wastes only the final sequence's tail
    assert (
        r["fill_micro"]
        == (1_000_000 * r["total_tokens"]) // (r["n_sequences"] * SEQ_LEN)
    )
    assert r["fill_micro"] > 900_000  # the tail is one partial sequence
    # short docs, 512-token sequences: crossings exist but are the
    # minority — a boundary sits at most every SEQ_LEN tokens
    assert 0 < r["n_crossing"] <= r["total_tokens"] // SEQ_LEN + 1


def test_corpus_version_diff_accounting(rows, spark):
    from mammoth_spark.model import read_table

    (r,) = rows("corpus_version_diff")
    total = read_table(spark, SF, "documents").count()
    assert r["n_v1"] == total
    # every v1 doc is exactly one of removed/modified/unchanged;
    # every v2 doc is exactly one of added/modified/unchanged
    assert r["n_removed"] + r["n_modified"] + r["n_unchanged"] == r["n_v1"]
    assert r["n_added"] + r["n_modified"] + r["n_unchanged"] == r["n_v2"]
    # the nibble rates (~1/16 each) produce a real but minority churn
    assert 0 < r["n_added"] and 0 < r["n_removed"] and 0 < r["n_modified"]
    assert r["churn_micro"] == (
        1_000_000 * (r["n_added"] + r["n_removed"] + r["n_modified"])
    ) // r["n_v1"]
    assert r["churn_micro"] < 400_000


def test_round8b_plans_stay_bounded(spark):
    """The wave's physical claims: no data-sized single-partition
    funnels, no Python, and the packing query's only data-sized wide
    op is the per-shard cumsum window (corpus_shuffle shape)."""
    for name in (
        "stratified_sample_alloc",
        "calibration_report",
        "calibration_ece",
        "corpus_version_diff",
    ):
        plan = (
            QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        idx = 0
        while True:
            sp = plan.find("Exchange SinglePartition", idx)
            if sp < 0:
                break
            assert "HashAggregate" in plan[sp:], f"{name}: raw-data funnel"
            idx = sp + 1
    plan = (
        QUERIES["sequence_packing_report"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan and "shard" in plan  # per-shard cumsum
    assert "EvalPython" not in plan
    # the offsets window runs on the shards-row table: its
    # single-partition exchange must sit above the shard aggregation
    sp = plan.find("Exchange SinglePartition")
    if sp >= 0:
        assert "HashAggregate" in plan[sp:]


def test_embedding_dim_stats_and_covariance_agree(rows):
    """Two independent implementations of the same second moments —
    the per-dimension variance (single explode) and the pair-table
    covariance diagonal (nested-transform gram cells) — must agree
    EXACTLY, and the pair table must hold all D*(D+1)/2 cells."""
    from mammoth_spark.queries_embed_eval import EMB_DIM

    dims = rows("embedding_dim_stats")
    (cov,) = rows("embedding_covariance_summary")
    assert len(dims) == EMB_DIM
    n = {r["n_vecs"] for r in dims}
    assert len(n) == 1  # every dimension sees every vector
    assert all(r["var_micro2"] >= 0 for r in dims)
    assert cov["n_cells"] == EMB_DIM * (EMB_DIM + 1) // 2
    assert cov["trace_micro2"] == sum(r["var_micro2"] for r in dims)
    assert 0 <= cov["offdiag_abs_max_micro2"] <= cov["offdiag_abs_sum_micro2"]
    assert (
        cov["offdiag_ratio_micro"]
        == (1_000_000 * cov["offdiag_abs_sum_micro2"]) // cov["trace_micro2"]
    )


def test_token_diversity_panel_consistent(rows):
    (r,) = rows("token_diversity_report")
    assert 0 < r["vocab"] <= r["n_tok"]
    assert 0 <= r["hapax"] <= r["vocab"]
    assert 0 < r["top1_count"] <= r["n_tok"]
    assert 0 <= r["gini_micro"] < 1_000_000
    assert r["ttr_micro"] == (1_000_000 * r["vocab"]) // r["n_tok"]
    assert r["top1_share_micro"] == (1_000_000 * r["top1_count"]) // r["n_tok"]
    assert r["hapax_share_micro"] == (1_000_000 * r["hapax"]) // r["vocab"]
    # a natural-language fixture is diverse: high gini, minority top-1
    assert r["gini_micro"] > 900_000
    assert r["top1_share_micro"] < 100_000


def test_embedding_covariance_plan_no_self_join(spark):
    """The gram cells are generated INSIDE the row (nested transform +
    one explode) — the plan must contain no join at all, no Python,
    and exactly one embeddings scan; the (i,j) aggregation must
    partial-aggregate map-side so the shuffle is cell-count-sized."""
    plan = (
        QUERIES["embedding_covariance_summary"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "CartesianProduct", "EvalPython"):
        assert bad not in plan, bad
    assert plan.count("FileScan parquet") == 1
    assert "partial_sum" in plan  # map-side combine before the (i,j) shuffle


def test_token_diversity_plan_single_vocab_fold(spark):
    """One token explode -> vocab hash-agg -> scalar fold: no joins,
    no windows, no Python; single-partition hops only above aggregates."""
    plan = (
        QUERIES["token_diversity_report"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert "EvalPython" not in plan
    sp = plan.find("Exchange SinglePartition")
    if sp >= 0:
        assert "HashAggregate" in plan[sp:]
