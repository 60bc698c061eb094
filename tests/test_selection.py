"""Weighted WOR sampling + MMR rerank: independent Python references
(md5 -> E-S keys; sequential-sum cosines -> greedy MMR), the
statistical property each one exists for, and plan pins."""

import hashlib
import math

import pyarrow.parquet as pq

import __spark_entry__  # noqa: F401  (registers the full query surface)
from mammoth_spark.queries_selection import (
    _C_LN,
    _KEY_SCALE,
    MMR_K,
    MMR_N,
    WOR_K,
    WOR_SALT,
)
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_wor_matches_python_reference(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    keys = []
    for doc_id, w in zip(
        t.column("doc_id").to_pylist(), t.column("n_chars").to_pylist()
    ):
        if w <= 0:
            continue
        h = hashlib.md5(f"{WOR_SALT}{doc_id}".encode()).hexdigest()
        u = int(h[:13], 16) + 1
        key = math.floor(
            (float(_C_LN) - math.log(float(u))) * _KEY_SCALE / w
        )
        keys.append((key, doc_id, w))
    expect = sorted(keys)[:WOR_K]
    got = [
        (r.key_micro, r.doc_id, r.weight)
        for r in QUERIES["weighted_sample_wor"](spark, SF)
        .orderBy("key_micro", "doc_id")
        .collect()
    ]
    assert got == expect


def test_wor_is_weight_proportional(spark):
    """The point of E-S keys: long documents enter the sample with
    proportionally higher probability, so the sample's mean length must
    sit clearly above the corpus mean (deterministic draw, pinned)."""
    rows = QUERIES["weighted_sample_wor"](spark, SF).collect()
    assert len(rows) == WOR_K
    t = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    weights = [w for w in t.column("n_chars").to_pylist() if w > 0]
    corpus_mean = sum(weights) / len(weights)
    sample_mean = sum(r.weight for r in rows) / len(rows)
    assert sample_mean > corpus_mean * 1.1


def _seq_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def test_mmr_matches_python_reference(spark):
    """Greedy MMR recomputed in plain Python with the SAME sequential
    double summation as F.aggregate / DuckDB list_reduce, so the
    micro-cosines (and therefore the whole trajectory) match exactly."""
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    embs = {
        v: [float(x) for x in e]
        for v, e in zip(
            t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
        )
    }
    nrm = {v: math.sqrt(_seq_dot(e, e)) for v, e in embs.items()}
    q = embs[0]
    mrel = {
        v: math.floor(_seq_dot(e, q) / (nrm[v] * nrm[0]) * 1000000)
        for v, e in embs.items()
        if v != 0
    }
    cand = sorted(mrel, key=lambda v: (-mrel[v], v))[:MMR_N]
    msim = {
        (a, b): math.floor(
            _seq_dot(embs[a], embs[b]) / (nrm[a] * nrm[b]) * 1000000
        )
        for a in cand
        for b in cand
        if a != b
    }
    selected, expect = [], []
    for rank in range(1, MMR_K + 1):
        best = None
        for v in cand:
            if v in selected:
                continue
            mx = max((msim[(v, s)] for s in selected), default=0)
            score = 7 * mrel[v] - 3 * mx
            if best is None or (-score, v) < (-best[4], best[1]):
                best = (rank, v, mrel[v], mx, score)
        selected.append(best[1])
        expect.append(best)
    got = [
        (r.sel_rank, r.vec_id, r.mrel, r.max_msim, r.score_micro)
        for r in QUERIES["mmr_rerank"](spark, SF).orderBy("sel_rank").collect()
    ]
    assert got == expect


def test_mmr_diversifies_and_is_monotone(spark):
    rows = QUERIES["mmr_rerank"](spark, SF).orderBy("sel_rank").collect()
    assert [r.sel_rank for r in rows] == list(range(1, MMR_K + 1))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == MMR_K
    # the greedy objective is provably non-increasing (penalties only
    # grow, the pool only shrinks)
    scores = [r.score_micro for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert rows[0].max_msim == 0  # first pick is pure relevance
    # diversity did something: later picks carry a real redundancy
    # penalty (the rerank is not just the relevance head re-emitted)
    assert any(r.max_msim != 0 for r in rows[1:])


def test_wor_plan_is_scan_plus_topk(spark):
    plan = _plan(QUERIES["weighted_sample_wor"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan  # no shuffle, only heads
    assert "EvalPython" not in plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read_schema and "n_chars" in read_schema
    assert "text" not in read_schema and "lang" not in read_schema
