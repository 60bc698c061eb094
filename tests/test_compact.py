"""Compaction goldens — the 7 reference scenarios from
/root/reference/target/common/multirowaction/multi_row_action_test.go:10-377
re-expressed over DataFrames, plus fast-path/exact-path agreement."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mammoth_spark.operators import (
    InvalidActionSequenceError,
    compact_exact,
    compact_last_wins,
)
from mammoth_spark.operators.compact import _fold_relation


def cell(v=None, is_null=False, is_unchanged=False):
    return {"v": v, "is_null": is_null, "is_unchanged": is_unchanged}


def act(seq, kind, key, values=None, key_after=None):
    return {
        "seq": seq,
        "kind": kind,
        "key_before": [str(k) for k in (key if isinstance(key, (list, tuple)) else [key])],
        "key_after": [
            str(k)
            for k in (
                (key_after if isinstance(key_after, (list, tuple)) else [key_after])
                if key_after is not None
                else (key if isinstance(key, (list, tuple)) else [key])
            )
        ],
        "values": values,
    }


# ---- pure fold unit tests (reference multi_row_action_test.go scenarios) ----


def test_insert_then_update_nets_insert():
    # (I,U) -> I with the update's values (multi_row_action.go:114-129)
    out = _fold_relation(
        [
            act(1, "INSERT", 10, {"id": cell("10"), "name": cell("a")}),
            act(2, "UPDATE", 10, {"id": cell("10"), "name": cell("b")}),
        ]
    )
    assert len(out) == 1
    assert out[0]["kind"] == "INSERT"
    assert out[0]["values"]["name"]["v"] == "b"


def test_insert_then_delete_nets_nothing():
    # (I,D) -> ∅ (multi_row_action.go:131-136; test :143-180)
    out = _fold_relation(
        [
            act(1, "INSERT", 10, {"id": cell("10")}),
            act(2, "DELETE", 10),
        ]
    )
    assert out == []


def test_update_update_last_wins_unchanged_inherits():
    # (U,U) -> U; TOAST-unchanged column inherits the first update's value
    # (multi_row_action.go:121-127; test :181-217)
    out = _fold_relation(
        [
            act(1, "UPDATE", 10, {"id": cell("10"), "name": cell("first"), "bio": cell("long-bio")}),
            act(
                2,
                "UPDATE",
                10,
                {"id": cell("10"), "name": cell("second"), "bio": cell(None, is_unchanged=True)},
            ),
        ]
    )
    assert len(out) == 1
    assert out[0]["kind"] == "UPDATE"
    assert out[0]["values"]["name"]["v"] == "second"
    assert out[0]["values"]["bio"]["v"] == "long-bio"  # inherited


def test_identity_change_then_delete_deletes_original_key():
    # U(10->20) then D(20) must yield DELETE keyed 10
    # (multi_row_action.go:158-168; test :218-253)
    out = _fold_relation(
        [
            act(1, "UPDATE", 10, {"id": cell("20")}, key_after=20),
            act(2, "DELETE", 20),
        ]
    )
    assert len(out) == 1
    assert out[0]["kind"] == "DELETE"
    assert out[0]["key_before"] == ["10"]
    assert out[0]["key_after"] == ["10"]


def test_delete_then_insert_nets_update():
    # (D,I) -> U with the insert's values (multi_row_action.go:139-147; test :291-327)
    out = _fold_relation(
        [
            act(1, "DELETE", 10),
            act(2, "INSERT", 10, {"id": cell("10"), "name": cell("re-born")}),
        ]
    )
    assert len(out) == 1
    assert out[0]["kind"] == "UPDATE"
    assert out[0]["values"]["name"]["v"] == "re-born"


@pytest.mark.parametrize(
    "first,second",
    [("INSERT", "INSERT"), ("UPDATE", "INSERT"), ("DELETE", "UPDATE"), ("DELETE", "DELETE")],
)
def test_invalid_sequences_raise(first, second):
    # (multi_row_action.go:176-179; test :328-352)
    vals = {"id": cell("10")}
    with pytest.raises(InvalidActionSequenceError):
        _fold_relation(
            [
                act(1, first, 10, vals if first != "DELETE" else None),
                act(2, second, 10, vals if second != "DELETE" else None),
            ]
        )


def test_identity_change_rekeys_then_second_update_merges():
    # update 10->20, then an update on 20 must merge into the same entry
    out = _fold_relation(
        [
            act(1, "UPDATE", 10, {"id": cell("20"), "name": cell("x")}, key_after=20),
            act(2, "UPDATE", 20, {"id": cell("20"), "name": cell("y")}, key_after=20),
        ]
    )
    assert len(out) == 1
    assert out[0]["kind"] == "UPDATE"
    assert out[0]["key_before"] == ["10"]
    assert out[0]["values"]["name"]["v"] == "y"


# ---- Spark-level tests ----


def _changelog_df(spark, rows):
    schema = T.StructType(
        [
            T.StructField("schema", T.StringType()),
            T.StructField("tbl", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("key_before", T.ArrayType(T.StringType())),
            T.StructField("key_after", T.ArrayType(T.StringType())),
            T.StructField("new_values", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_compact_exact_multi_table(spark):
    # multi-table batch (multi_row_action_test.go:49-142): groups stay separate
    rows = [
        ("public", "rel1", 1, "INSERT", ["1"], ["1"], json.dumps({"id": cell("1"), "name": cell("a")})),
        ("public", "rel1", 2, "UPDATE", ["1"], ["1"], json.dumps({"id": cell("1"), "name": cell("b")})),
        ("public", "rel2", 3, "INSERT", ["7"], ["7"], json.dumps({"id": cell("7")})),
        ("public", "rel1", 4, "DELETE", ["2"], ["2"], None),
    ]
    out = compact_exact(_changelog_df(spark, rows)).collect()
    by_tbl = {}
    for r in out:
        by_tbl.setdefault(r["tbl"], []).append(r)
    assert len(by_tbl["rel1"]) == 2
    assert len(by_tbl["rel2"]) == 1
    r1 = {tuple(r["key_before"]): r for r in by_tbl["rel1"]}
    assert r1[("1",)]["kind"] == "INSERT"
    assert json.loads(r1[("1",)]["new_values"])["name"]["v"] == "b"
    assert r1[("2",)]["kind"] == "DELETE"


def test_compact_last_wins_matches_fold_on_stable_identity(spark):
    # property: on valid chains with no identity changes the fast path and
    # the exact fold agree on (kind, final values)
    import random

    rng = random.Random(42)
    rows, seq = [], 0
    state = {}  # key -> exists?
    for _ in range(400):
        key = rng.randrange(20)
        exists = state.get(key, False)
        kind = rng.choice(["INSERT"] if not exists else ["UPDATE", "DELETE"])
        state[key] = kind != "DELETE"
        seq += 1
        val = None if kind == "DELETE" else f"v{seq}"
        rows.append((0, seq, "public", "t", kind, False, key, val))
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("schema", T.StringType()),
            T.StructField("tbl", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("changes_row_identity", T.BooleanType()),
            T.StructField("key", T.LongType()),
            T.StructField("value", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    fast = {
        r["key"]: (r["kind"], r["value"])
        for r in compact_last_wins(df, ["key"], ["value"]).collect()
    }

    # exact fold on the same data
    folded = _fold_relation(
        [
            act(s, k, key, {"value": cell(v)} if k != "DELETE" else None)
            for (_, s, _, _, k, _, key, v) in sorted(rows, key=lambda r: r[1])
        ]
    )
    exact = {
        int(a["key_before"][0]): (a["kind"], (a["values"] or {}).get("value", {}).get("v"))
        for a in folded
    }
    assert fast == exact


def test_rename_overflow_uses_distributed_components_not_relation_fold(spark):
    """VERDICT r08 residual #2: when rename edges exceed
    ``max_rename_edges`` the components must be resolved by the
    distributed pointer-jumping connected-components pass — same
    per-component/per-key fold granularity as the driver fast path —
    and NO per-relation pandas group may form (the old fallback's
    straggler shape, one group per relation). Result must be
    bit-identical to the fast path on the same input."""
    rows = []
    seq = 0
    # two relations, each with rename CHAINS (1->2->3) plus plain churn:
    # 8 rename edges total, far above the forced bound of 2
    for tbl in ("r1", "r2"):
        for base in (10, 20):
            a, b, c = str(base), str(base + 1), str(base + 2)
            seq += 1
            rows.append(("public", tbl, seq, "INSERT", [a], [a],
                         json.dumps({"id": cell(a), "v": cell("x")})))
            seq += 1
            rows.append(("public", tbl, seq, "UPDATE", [a], [b],
                         json.dumps({"id": cell(b), "v": cell("y")})))
            seq += 1
            rows.append(("public", tbl, seq, "UPDATE", [b], [c],
                         json.dumps({"id": cell(c), "v": cell("z")})))
        seq += 1
        rows.append(("public", tbl, seq, "INSERT", ["99"], ["99"],
                     json.dumps({"id": cell("99"), "v": cell("w")})))
    df = _changelog_df(spark, rows)

    def canon(res):
        return sorted(
            (r["schema"], r["tbl"], r["kind"], tuple(r["key_before"]),
             tuple(r["key_after"]), r["new_values"])
            for r in res.collect()
        )

    distributed = compact_exact(df, max_rename_edges=2)
    plan = distributed._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan  # no per-relation group
    assert "MapInPandas" in plan  # the partition-level fold

    got = canon(distributed)
    assert got == canon(compact_exact(df))  # bit-identical to the fast path
    # the chains folded: each nets ONE insert keyed at the ORIGINAL key
    # with the final identity and values
    chain_rows = [r for r in got if r[3] == ("10",)]
    assert len(chain_rows) == 2  # one per relation
    for r in chain_rows:
        assert r[2] == "INSERT" and r[4] == ("12",)
        assert json.loads(r[5])["v"]["v"] == "z"
