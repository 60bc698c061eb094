"""Driver-contract rotation policy (codified per VERDICT r06 #7).

The correctness driver records at most 50 ``queries()`` entries per
round, while the registry holds 200+; every query therefore earns its
driver-verified row through rotation. From round 7 on, each round's
``registry.DRIVER_EXPORT`` is CUT BY ``cut_contract`` below — a pure
function of the registry and the committed ``CORRECTNESS_r*.json``
ledger — and ``tests/test_oracle_parity.py::test_contract_is_ledger_cut``
asserts the committed static list equals the computed cut. The rule:

1. never-driver-verified queries first (alphabetical — every one is a
   first-ever row, the highest-information slot);
2. then ``FLAGSHIPS`` whose implementation paths were refactored after
   their last driver row (re-verify on the current tree before anything
   else already-green);
3. then all remaining queries oldest-row-first (round, then name) — so
   every query's driver row ages at most ``ceil(N/50)+1`` rounds
   (~5 rounds at the current 202-query registry) before re-verification.

``upto_round`` pins which ledger files the cut reads: the round-R
contract is cut from rounds < R, so the cut (and its test) stays stable
after the driver writes ``CORRECTNESS_rR.json`` at round end.
"""

from __future__ import annotations

import glob
import json
import os
import re

# The round whose contract registry.DRIVER_EXPORT currently encodes.
# Bump this (and regenerate the export with `python tools/rotation_ledger.py
# --cut`) at the start of each round.
CONTRACT_ROUND = 14

# Queries whose implementation paths were refactored AFTER their last
# driver row and must re-verify on the current tree before anything
# else already-green. Round 14 (optimization round 2) flags two sets:
# (a) VERDICT r13 #2's carry-over — the twelve paths round 13 changed
# that the r13 sample never re-verified (driver-side pagerank loop,
# persist-partitioning reuse, observation-fused dedup rounds,
# localCheckpoint pins, IVM/time-travel/rebucket/WAP lifecycle
# restructures); (b) the paths THIS round's optimizations touch:
# lifecycle-fused mid-stream compacts (after_batch hook) on the
# MOR-toast twins and the triple-composition query, the distributed
# bloom probe (probe_df — no driver key collect) on both lookup
# queries, and thread-overlapped multi-table staging (_stage_epoch /
# initialize / rollback folds) on every multi-member catalog query —
# the heaviest of which re-verify here. Drop entries once they hold a
# row on the current tree.
FLAGSHIPS: list[str] = [
    # (a) r13-changed, not in the r13 sample (VERDICT r13 #2)
    "pagerank_topk",
    "dedup_clusters",
    "dedup_survivorship",
    "lsh_recall_report",
    "bt_strength_duels",
    "embedding_covariance_summary",
    "perplexity_buckets",
    "incremental_agg_maintenance",
    "txn_time_travel",
    "catalog_rebucket_online",
    "streaming_wap_pipeline",
    "streaming_cdc_apply_toast",
    # (b) r14-optimized paths
    "streaming_cdc_apply_mor_toast",
    "streaming_txn_mixed_toast",
    "bucketed_bloom_lookup",
    "bmor_bloom_lookup",
    "streaming_txn_triple_strategy",
    "streaming_txn_mixed_targets",
    "catalog_rollback_mor",
    "catalog_stats_count_mor",
    "catalog_erase_history",
]

CONTRACT_SIZE = 50


def last_green_rounds(repo_root: str, upto_round: int | None = None) -> dict[str, int]:
    """Map query name -> latest round with a green driver row,
    reading only rounds < ``upto_round`` (all rounds if None)."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if upto_round is not None and rnd >= upto_round:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            # A hash_match=False row is NOT green: the values may agree,
            # but the driver's typed hash flagged the representation
            # (the r10 cdf_incremental_agg lesson — an uncast DuckDB SUM).
            # Such a query must re-verify first, exactly like one never
            # driver-run. rows-only checks record hash_match=None and
            # stay eligible.
            if (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def cut_contract(
    queries: list[str],
    repo_root: str,
    size: int = CONTRACT_SIZE,
    upto_round: int | None = None,
) -> list[str]:
    """Deterministically cut a driver contract from the ledger."""
    if upto_round is None:
        upto_round = CONTRACT_ROUND
    last = last_green_rounds(repo_root, upto_round=upto_round)
    never = sorted(n for n in queries if n not in last)
    flags = [n for n in FLAGSHIPS if n in queries and n in last and n not in never]
    rest = sorted(
        (n for n in queries if n in last and n not in flags),
        key=lambda n: (last[n], n),
    )
    return (never + flags + rest)[:size]
