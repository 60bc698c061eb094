"""Unigram-LM tokenizer wave (mammoth_spark/queries_unigram.py).

Oracle parity for both queries runs in tests/test_oracle_parity.py like
every registered query; here: hand-computed EM semantics on a corpus
small enough to check by hand, the segmentation-validity property at
fixture scale, and the physical-plan guarantees the module docstring
claims (broadcast piece probe, vocab-sized DP, TakeOrdered head).
"""

import os

import pytest
from pyspark.sql import functions as F

from mammoth_spark import queries  # noqa: F401  (registers everything)
from mammoth_spark.queries_unigram import (
    _edge_table,
    _seed_vocab,
    _viterbi_best,
    _word_table,
)
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf_dir = str(tmp_path / "sf_uni")
    os.makedirs(sf_dir, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_unigram_hand_computed_em(spark, tmp_path):
    # corpus "ab ab cd": words ab:2, cd:1. Seed counts: a2 b2 ab2 c1 d1
    # cd1 (total 9). Whole-word pieces always beat their char split
    # (one fewer positive cost term), so round-1 best segs are [ab],[cd]
    # -> counts ab:2, cd:1; round 2 re-scores on {ab:2, cd:1} and the
    # segs are unchanged (chars fell out of the vocab, whole words are
    # the only segmentations left).
    sf_dir = _write_docs(spark, tmp_path, [(0, "ab ab cd", "en", "s", 8)])
    out = QUERIES["unigram_lm_train"](spark, sf_dir).collect()
    got = [(r["rank"], r["piece"], r["cnt"]) for r in out]
    assert got == [(1, "ab", 2), (2, "cd", 1)]

    stats = QUERIES["unigram_encode_stats"](spark, sf_dir).collect()[0]
    assert (stats["n_words"], stats["n_pieces"], stats["pieces_per_kword"]) == (
        3,
        3,
        1000,
    )


def test_unigram_tiebreak_prefers_fewer_pieces_then_lens(spark, tmp_path):
    # "aaaa" x1 alone: seed pieces a:4, aa:3, aaa:2, aaaa:1 (total 10).
    # cost(p) = mlog(10) - mlog(cnt): [aaaa] pays 2302585 - 0 = 2302585;
    # [aa,aa] pays 2*(2302585-1098612) = 2407946; [aaa,a] = 1609438 +
    # 916291 = 2525729 -> best is the whole word despite cnt 1.
    sf_dir = _write_docs(spark, tmp_path, [(0, "aaaa", "en", "s", 4)])
    out = QUERIES["unigram_lm_train"](spark, sf_dir).collect()
    assert [(r["rank"], r["piece"], r["cnt"]) for r in out] == [(1, "aaaa", 1)]


def test_unigram_best_seg_reconstructs_every_word(spark):
    # DP validity property at fixture scale: the winning segmentation
    # concatenates back to the word exactly, and nseg == |pcs| — for
    # EVERY distinct word (single-char pieces guarantee feasibility).
    words = _word_table(spark, SF)
    best = _viterbi_best(words, _seed_vocab(words))
    bad = best.filter(
        (F.concat_ws("", F.col("pcs")) != F.col("word"))
        | (F.size("pcs") != F.col("nseg"))
    ).count()
    assert bad == 0
    assert best.count() == words.count()


def test_unigram_word_table_partial_agg_and_pruned_scan(spark):
    # the one data-sized job: word-frequency aggregation must map-side
    # combine (partial + final HashAggregate) and the scan must read
    # only the text column
    tf = _word_table(spark, SF, checkpoint=False)
    plan = tf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, "partial aggregation missing"
    assert "ReadSchema: struct<text:string>" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_dp_edge_probe_broadcasts_pieces(spark):
    # the DP edge probe joins the BOUNDED piece table broadcast —
    # shuffling the word table against pieces would make the vocab probe
    # a data-sized exchange — and the whole per-word forward DP runs as
    # ONE expression over the collected edge list: exactly one Exchange
    # (the groupBy(word) edge-collect) in the whole Viterbi plan per EM
    # round, vs the 12 the pre-r13 relaxation rounds paid
    words = _word_table(spark, SF)
    vocab = _seed_vocab(words)
    pieces = vocab.select("piece", F.lit(0).cast("bigint").alias("pcost"))
    plan = (
        _edge_table(words, pieces)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan

    # vocab is localCheckpointed in _em_counts; mirror that here so the
    # assertion sees the EM-round plan, not the seed-vocab lineage
    best_plan = (
        _viterbi_best(words, vocab.localCheckpoint())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", best_plan)) <= 1


def test_unigram_train_head_is_take_ordered(spark, tmp_path):
    # the reported vocabulary head must be TakeOrderedAndProject over the
    # (checkpointed, vocab-sized) count table — not a global sort
    sf_dir = _write_docs(
        spark, tmp_path, [(0, "ab ab cd", "en", "s", 8), (1, "ab cd", "en", "s", 5)]
    )
    df = QUERIES["unigram_lm_train"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
