"""Kneser-Ney bigram LM: independent Python reference, coverage
identity, bit-reproducibility, and the physical-plan pins the
docstrings claim (broadcast model joins, partial-agg c12 build,
TakeOrderedAndProject head, no Python in the plan)."""

import re

import pandas as pd

from mammoth_spark.queries_lm import _MICRO, KN_MODEL_HEAD
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
TOK = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _py_reference(texts):
    """Plain-Python interpolated KN over a tiny corpus (vocab cap not
    reached): returns (model dict, per-doc rows) with the exact same
    integer micro arithmetic."""
    toks = {d: TOK.findall(t) for d, t in texts.items()}
    c12 = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1, n1p_f, n1p_b = {}, {}, {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        n1p_f[a] = n1p_f.get(a, 0) + 1
        n1p_b[b] = n1p_b.get(b, 0) + 1
    n1p_all = len(c12)
    model = {
        (a, b): ((4 * c - 3) * n1p_all + 3 * n1p_f[a] * n1p_b[b])
        * _MICRO
        // (4 * c1[a] * n1p_all)
        for (a, b), c in c12.items()
    }
    docs = {}
    for d, ts in toks.items():
        n_seen = n_backoff = n_cont = s = 0
        for a, b in zip(ts, ts[1:]):
            if (a, b) in model:
                n_seen += 1
                s += model[(a, b)]
            elif a in c1:
                n_backoff += 1
                s += (3 * n1p_f[a] * n1p_b.get(b, 0) * _MICRO) // (
                    4 * c1[a] * n1p_all
                )
            else:
                n_cont += 1
                s += (n1p_b.get(b, 0) * _MICRO) // n1p_all
        nb = max(len(ts) - 1, 0)
        docs[d] = (nb, n_seen, n_backoff, n_cont, s // nb if nb else 0)
    return model, docs


def test_kn_matches_python_reference(spark, tmp_path):
    texts = {
        1: "the cat sat on the mat . the cat ran",
        2: "a cat sat ; the dog sat on a log",
        3: "dogs and cats and dogs",
        4: "x",
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    model, docs = _py_reference(texts)

    got_model = {
        (r.w1, r.w2): r.micro_pkn
        for r in QUERIES["kn_lm_train"](spark, str(tmp_path)).collect()
    }
    assert len(model) <= KN_MODEL_HEAD  # head covers the whole tiny model
    assert got_model == model

    got_docs = {
        r.doc_id: (r.n_bigrams, r.n_seen, r.n_backoff, r.n_cont, r.mean_micro)
        for r in QUERIES["kn_lm_score"](spark, str(tmp_path)).collect()
    }
    assert got_docs == docs


def test_kn_score_covers_every_bigram(spark):
    rows = QUERIES["kn_lm_score"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_seen + r.n_backoff + r.n_cont == r.n_bigrams
    # smoothing is exercised, not vacuous: both fallback branches fire
    assert sum(r.n_backoff for r in rows) > 0
    assert sum(r.n_cont for r in rows) > 0
    # and the discounted seen path dominates in-distribution text
    assert sum(r.n_seen for r in rows) > 0


def test_kn_train_is_bit_reproducible(spark):
    a = [tuple(r) for r in QUERIES["kn_lm_train"](spark, SF).collect()]
    b = [tuple(r) for r in QUERIES["kn_lm_train"](spark, SF).collect()]
    assert a == b


def test_kn_plan_shapes(spark):
    train = _plan(QUERIES["kn_lm_train"](spark, SF))
    score = _plan(QUERIES["kn_lm_score"](spark, SF))
    for plan in (train, score):
        # the model assembly never sort-merge-joins and never leaves the JVM
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan
        assert "EvalPython" not in plan
    # the score side scans parquet directly (the train side's scan is
    # behind the c12 localCheckpoint): pruned to the two used columns,
    # with a map-side partial aggregate for the per-doc rollup
    assert "partial_" in score
    read_schema = score.split("ReadSchema")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema
    # model head is a bounded top-k, not a global sort
    assert "TakeOrderedAndProject" in train
