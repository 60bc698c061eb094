"""WordPiece: independent Python reference (train + greedy encode),
the likelihood-vs-frequency divergence from BPE, mass conservation of
the encode histogram, bit-reproducibility, and plan pins."""

import pandas as pd

import __spark_entry__  # noqa: F401  (registers the full query surface)
from mammoth_spark.queries_wordpiece import _SCALE, _SEP, _SEP2, WP_ROUNDS
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _py_wordpiece(word_freq, rounds):
    """Plain-Python WordPiece on the wrapped-string representation —
    the same non-overlapping left-to-right replace the engine and the
    oracle use, so 'aaa' merges identically everywhere."""
    wrapped = {_SEP + _SEP2.join(w) + _SEP: f for w, f in word_freq.items()}
    records = []
    for r in range(1, rounds + 1):
        symc, pairc = {}, {}
        for wr, f in wrapped.items():
            syms = wr[1:-1].split(_SEP2)
            for s in syms:
                symc[s] = symc.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pairc[(a, b)] = pairc.get((a, b), 0) + f
        if not pairc:
            break
        scored = {
            (a, b): (c * _SCALE) // (symc[a] * symc[b])
            for (a, b), c in pairc.items()
        }
        best = min(
            scored,
            key=lambda p: (-scored[p], -pairc[p], p[0] + _SEP + p[1]),
        )
        a, b = best
        new = {}
        for wr, f in wrapped.items():
            new[wr.replace(_SEP + a + _SEP2 + b + _SEP, _SEP + a + b + _SEP)] = f
        wrapped = new
        n_syms = len(
            {s for wr in wrapped for s in wr[1:-1].split(_SEP2)}
        )
        records.append((r, a + "+" + b, pairc[best], scored[best], n_syms))
    return wrapped, records


def _py_greedy(word, vocab):
    pos, np = 0, 0
    while pos < len(word):
        ln = max(
            l
            for l in range(1, len(word) - pos + 1)
            if word[pos : pos + l] in vocab
        )
        pos += ln
        np += 1
    return np


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")


def test_wordpiece_matches_python_reference(spark, tmp_path):
    # 'zq' is rare but perfectly cohesive; 'abab' pairs are frequent but
    # diluted by their parts' counts
    texts = [" ".join(["abab"] * 30 + ["zq"] * 3 + ["banana"] * 5)]
    _write_docs(tmp_path, texts)
    word_freq = {"abab": 30, "zq": 3, "banana": 5}
    wrapped, records = _py_wordpiece(word_freq, WP_ROUNDS)

    got = [
        (r.round, r.merge_pair, r.pair_freq, r.micro_score, r.n_symbol_types)
        for r in QUERIES["wordpiece_train"](spark, str(tmp_path))
        .orderBy("round")
        .collect()
    ]
    assert got == records

    vocab = {s for wr in wrapped for s in wr[1:-1].split(_SEP2)} | {
        c for w in word_freq for c in w
    }
    expect = {}
    for w, f in word_freq.items():
        np = _py_greedy(w, vocab)
        t = expect.setdefault(np, [0, 0, None])
        t[0] += 1
        t[1] += f
        t[2] = w if t[2] is None else min(t[2], w)
    got_stats = {
        r.n_pieces: [r.n_word_types, r.total_freq, r.min_word]
        for r in QUERIES["wordpiece_encode_stats"](spark, str(tmp_path)).collect()
    }
    assert got_stats == expect


def test_wordpiece_first_merge_diverges_from_bpe(spark, tmp_path):
    # BPE (pure pair frequency) must pick a+b (freq 60); WordPiece's
    # likelihood score must pick the cohesive rare pair z+q:
    #   score(z+q) = 3/(3*3) = 1/3  >  score(a+b) = 60/(90*60)
    texts = [" ".join(["abab"] * 30 + ["zq"] * 3)]
    _write_docs(tmp_path, texts)
    wp_first = (
        QUERIES["wordpiece_train"](spark, str(tmp_path))
        .orderBy("round")
        .collect()[0]
    )
    assert wp_first.merge_pair == "z+q"
    bpe_first = (
        QUERIES["bpe_train"](spark, str(tmp_path)).orderBy("round").collect()[0]
    )
    assert bpe_first.merge_pair == "a+b"


def test_wordpiece_encode_conserves_mass(spark):
    rows = QUERIES["wordpiece_encode_stats"](spark, SF).collect()
    assert rows
    # every distinct word lands in exactly one bucket, and merged pieces
    # actually compress: some words need fewer pieces than characters
    total_types = sum(r.n_word_types for r in rows)
    words = (
        QUERIES["wordpiece_train"](spark, SF)  # warm path, then count words
        .sparkSession.read.parquet(f"{SF}/documents.parquet")
        .selectExpr("explode(split(text, ' ')) AS w")
        .filter("w rlike '^[a-z]{2,}$'")
        .select("w")
        .distinct()
        .count()
    )
    assert total_types == words
    assert min(r.n_pieces for r in rows) >= 1


def test_wordpiece_is_bit_reproducible(spark):
    a = [tuple(r) for r in QUERIES["wordpiece_train"](spark, SF).collect()]
    b = [tuple(r) for r in QUERIES["wordpiece_train"](spark, SF).collect()]
    assert a == b


def test_wordpiece_plans_stay_jvm_side(spark):
    stats = _plan(QUERIES["wordpiece_encode_stats"](spark, SF))
    # the greedy probe joins the bounded piece table broadcast, and
    # nothing in the loop leaves the JVM
    assert "BroadcastHashJoin" in stats
    assert "EvalPython" not in stats
    assert "SortMergeJoin" not in stats
