"""Semantic invariants for the round-7 mixture and eval-prep waves —
properties the oracle-parity hash can't express (parity proves the two
engines agree; these prove the answer means what the docstring says).
"""

import pytest

import mammoth_spark.queries  # noqa: F401  — registers every query
from mammoth_spark.queries_evalprep import RANK_K, REL_SCALE
from mammoth_spark.queries_mixture import (
    CURRICULUM_STAGES,
    TOKEN_BUDGET,
    WEIGHT_SCALE,
)
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_token_budget_sums_exactly(rows):
    """Largest-remainder apportionment: the WHOLE point is that the
    allocation sums exactly to the budget (proportional-floor alone
    under-allocates by up to n_domains - 1)."""
    out = rows("token_budget_allocation")
    assert sum(r["final_alloc"] for r in out) == TOKEN_BUDGET
    assert all(r["extra"] in (0, 1) for r in out)
    assert all(r["final_alloc"] >= r["base_alloc"] for r in out)
    # floor quotas alone must NOT reach the budget (else the remainder
    # step tested nothing on this fixture)
    assert sum(r["base_alloc"] for r in out) < TOKEN_BUDGET


def test_temperature_damps_dominant_domains(rows):
    """alpha=0.5 rebalancing: the largest domain's weight share must be
    SMALLER than its raw share, the smallest domain's LARGER — that is
    what temperature sampling is for."""
    out = rows("temperature_mixture_weights")
    total_raw = sum(r["raw_chars"] for r in out)
    big = max(out, key=lambda r: r["raw_chars"])
    small = min(out, key=lambda r: r["raw_chars"])
    assert big["weight_micro"] / WEIGHT_SCALE < big["raw_chars"] / total_raw
    assert small["weight_micro"] / WEIGHT_SCALE > small["raw_chars"] / total_raw
    # div truncation: micros sum to at most 1e6, short by < n_domains
    s = sum(r["weight_micro"] for r in out)
    assert WEIGHT_SCALE - len(out) < s <= WEIGHT_SCALE


def test_curriculum_stages_partition_by_length(rows):
    out = sorted(rows("curriculum_buckets"), key=lambda r: r["stage"])
    assert [r["stage"] for r in out] == list(range(1, CURRICULUM_STAGES + 1))
    # ntile: stage sizes differ by at most one, and length ranges are
    # non-decreasing across stages (ties may share a boundary value)
    sizes = [r["n_docs"] for r in out]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(out, out[1:]):
        assert a["max_chars"] <= b["min_chars"]


def test_curriculum_staged_is_bit_identical_to_ntile(spark):
    """The distributed histogram-offset construction must reproduce
    ntile(4) OVER (ORDER BY n_chars, doc_id) EXACTLY at doc level —
    not statistically: the round-8 rewrite replaced the unpartitioned
    window with per-shard ranks + broadcast offsets, and this pins that
    the arithmetic (q/r bucket split) is the same function."""
    from mammoth_spark.model import read_table
    from mammoth_spark.queries_mixture import _curriculum_staged

    docs = read_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    srt = sorted(docs, key=lambda r: (r["n_chars"], r["doc_id"]))
    n = len(srt)
    q, rem = divmod(n, CURRICULUM_STAGES)
    cut = (q + 1) * rem
    expect = {}
    for g, row in enumerate(srt, 1):
        if g <= cut:
            expect[row["doc_id"]] = (g - 1) // (q + 1) + 1
        else:
            expect[row["doc_id"]] = rem + (g - cut - 1) // q + 1
    got = {
        r["doc_id"]: r["stage"] for r in _curriculum_staged(spark, SF).collect()
    }
    assert got == expect


def test_ntile_stage_formula_property():
    """The closed-form stage arithmetic used by _curriculum_staged is
    ntile for EVERY (n, k), including n < k and exact multiples — a
    pure-arithmetic hypothesis sweep, no Spark needed (both engines
    evaluate this same integer expression)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(1, 400), st.integers(1, 9))
    def check(n, k):
        q, r = divmod(n, k)
        cut = (q + 1) * r
        reference = []
        for b in range(1, k + 1):
            reference += [b] * ((q + 1) if b <= r else q)
        formula = [
            (g - 1) // (q + 1) + 1 if g <= cut else r + (g - cut - 1) // q + 1
            for g in range(1, n + 1)
        ]
        assert formula == reference

    check()


def test_curriculum_approx_agrees_with_exact(spark):
    """The boundary-cut variant differs from exact ntile only where a
    tie run straddles a stage boundary; at fixture scale >= 99% of
    documents must land in the same stage."""
    from mammoth_spark.model import read_table
    from mammoth_spark.queries_mixture import _curriculum_staged

    docs = read_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    srt = sorted(docs, key=lambda r: (r["n_chars"], r["doc_id"]))
    n = len(srt)
    q, rem = divmod(n, CURRICULUM_STAGES)
    bounds = [
        srt[i * q + min(i, rem) - 1]["n_chars"] for i in range(1, CURRICULUM_STAGES)
    ]
    approx = {
        r["doc_id"]: 1 + sum(r["n_chars"] > b for b in bounds) for r in docs
    }
    exact = {
        r["doc_id"]: r["stage"] for r in _curriculum_staged(spark, SF).collect()
    }
    same = sum(approx[d] == exact[d] for d in exact)
    assert same / n >= 0.99, f"stage agreement {same}/{n}"


def test_phrase_search_counts_consistent(rows):
    out = rows("phrase_search")
    assert 0 < len(out) <= 5
    for r in out:
        assert r["n_occurrences"] >= r["n_docs"] > 0
        assert " " in r["phrase"]


def test_mrr_is_exact_integer_reciprocal(rows):
    out = rows("mrr_at_k")
    for r in out:
        assert 1 <= r["first_rel_rank"] <= RANK_K
        assert r["rr_micro"] == REL_SCALE // r["first_rel_rank"]


def test_ndcg_log2_table_matches_math(rows):
    """The inlined discount table IS floor(log2(rank+1)*1e6) — pinned
    here so the literals can never drift from the formula they encode
    (the query itself must not call log2: that is the point)."""
    import math

    from mammoth_spark.queries_evalprep import _LOG2_MICRO

    assert len(_LOG2_MICRO) == RANK_K
    for rank, micro in enumerate(_LOG2_MICRO, start=1):
        assert micro == math.floor(math.log2(rank + 1) * 1_000_000)


def test_ndcg_bounded_and_ideal_dominates(rows):
    out = rows("ndcg_at_k")
    assert out, "query panel produced no ranked lists"
    for r in out:
        assert 0 <= r["dcg_micro"] <= r["idcg_micro"]
        assert 0 <= r["ndcg_micro"] <= REL_SCALE


def test_cross_split_leak_accounting(rows):
    (r,) = rows("cross_split_leak_report")
    assert r["n_leaking_groups"] <= r["n_dup_groups"]
    assert r["n_heldout_contaminated"] >= r["n_leaking_groups"] * 0  # >= 0
    # every leaking group contributes at least one contaminated doc
    assert r["n_heldout_contaminated"] >= r["n_leaking_groups"]


def test_bt_strength_ranks_track_wins(rows):
    """BT with uniform game counts must broadly agree with raw wins; at
    minimum: shares sum to ~1e6, ranks are a permutation, and the top
    player by strength has at least as many wins as the bottom."""
    out = rows("bt_strength_duels")
    assert sorted(r["rnk"] for r in out) == list(range(1, len(out) + 1))
    s = sum(r["strength_share_micro"] for r in out)
    assert 1_000_000 - len(out) < s <= 1_000_000
    by_rank = sorted(out, key=lambda r: r["rnk"])
    assert by_rank[0]["n_wins"] >= by_rank[-1]["n_wins"]
    assert all(r["strength_micro"] > 0 for r in out)


def test_wilson_bound_below_winrate_and_sample_size_aware(rows, spark):
    """The Wilson lower bound sits strictly below the point estimate and
    penalizes small samples: the same win RATE on fewer games must get
    a lower bound."""
    out = rows("preference_winrate")
    for r in out:
        assert 0 <= r["wilson_lb_micro"] < r["winrate_micro"]
    # synthetic check of the monotonicity property via the same kernel:
    # p=0.6 with n=10 vs n=1000
    import math

    def wilson(w, n, z=1.96):
        p, zz = w / n, z * z
        return (p + zz / (2 * n) - z * math.sqrt(p * (1 - p) / n + zz / (4 * n * n))) / (
            1 + zz / n
        )

    assert wilson(6, 10) < wilson(600, 1000)


def test_transition_matrix_rows_normalize(rows):
    out = rows("event_transition_matrix")
    from collections import defaultdict

    by_from = defaultdict(list)
    for r in out:
        by_from[r["from_type"]].append(r)
    for frm, rws in by_from.items():
        s = sum(r["prob_micro"] for r in rws)
        # div truncation: short of 1e6 by < n_transitions
        assert 1_000_000 - len(rws) < s <= 1_000_000, frm
        assert all(r["n"] > 0 for r in rws)
