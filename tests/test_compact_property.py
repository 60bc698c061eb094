"""Property-based checks of the compaction algebra (A9).

The reference ships only 7 hand-written scenarios
(target/common/multirowaction/multi_row_action_test.go:10-377). Here
hypothesis generates random VALID action chains — including identity
renames and delete-then-reinsert resurrections — and asserts two
properties the hand-written cases can't cover:

1. The component-sharded parallel fold equals the whole-relation
   sequential fold (compact_exact's scale path vs its fallback path).
2. The result is invariant under permutation of input row order
   (only ``seq`` defines order — required for any distributed shuffle).
"""

import json
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mammoth_spark.model import local_df
from mammoth_spark.operators.compact import compact_exact

from pyspark.sql import types as T

_SCHEMA = T.StructType(
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


def _cell(rng, allow_unchanged):
    if allow_unchanged and rng.random() < 0.3:
        return {"v": None, "is_null": False, "is_unchanged": True}
    if rng.random() < 0.2:
        return {"v": None, "is_null": True, "is_unchanged": False}
    return {"v": str(rng.randrange(1000)), "is_null": False, "is_unchanged": False}


def _entity_chain(rng, key_pool):
    """One row entity's valid action list: I/U start; U may rename to a
    fresh key; D ends or resurrects via (D,I)."""
    actions = []
    cur = key_pool.pop()
    kind = rng.choice(["INSERT", "UPDATE"])
    alive = True
    for _ in range(rng.randrange(1, 5)):
        if not alive:
            # resurrection: (D,I) -> U (multi_row_action.go:139-147)
            kind = "INSERT"
            alive = True
        if kind == "DELETE":
            actions.append(("DELETE", cur, cur, None))
            alive = False
            if rng.random() < 0.6:
                break
            continue
        new_key = cur
        if kind == "UPDATE" and key_pool and rng.random() < 0.35:
            new_key = key_pool.pop()  # identity rename
        values = {"c": _cell(rng, allow_unchanged=kind == "UPDATE")}
        actions.append((kind, cur, new_key, values))
        cur = new_key
        kind = rng.choice(["UPDATE", "DELETE"])
    return actions


def _rows(seed):
    rng = random.Random(seed)
    key_pool = [str(k) for k in range(100, 100 + 40)]
    rng.shuffle(key_pool)
    chains = [_entity_chain(rng, key_pool) for _ in range(rng.randrange(1, 8))]
    # interleave chains preserving per-entity order, then stamp seq
    merged = []
    idx = [0] * len(chains)
    while any(i < len(c) for i, c in zip(idx, chains)):
        live = [j for j, c in enumerate(chains) if idx[j] < len(c)]
        j = rng.choice(live)
        merged.append(chains[j][idx[j]])
        idx[j] += 1
    rows = []
    for seq, (kind, kb, ka, values) in enumerate(merged, start=1):
        rows.append(
            (
                "public",
                "users",
                seq,
                kind,
                [kb],
                [ka],
                json.dumps(values) if values is not None else None,
            )
        )
    return rows


def _canon(df):
    out = []
    for r in df.collect():
        vals = json.loads(r["new_values"]) if r["new_values"] else None
        out.append(
            (tuple(r["key_before"]), tuple(r["key_after"]), r["kind"], r["seq"], repr(vals))
        )
    return sorted(out)


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_sharded_fold_equals_relation_fold_and_order_invariance(spark, seed):
    rows = _rows(seed)
    if not rows:
        return
    df = local_df(spark, rows, _SCHEMA)
    sharded = _canon(compact_exact(df))
    # max_rename_edges=-1 forces the whole-relation fallback fold
    relation_level = _canon(compact_exact(df, max_rename_edges=-1))
    assert sharded == relation_level
    # row-order permutation must not change the result
    shuffled = list(rows)
    random.Random(seed + 1).shuffle(shuffled)
    assert _canon(compact_exact(local_df(spark, shuffled, _SCHEMA))) == sharded


# ---------------------------------------------------------------------------
# connected_components (dedup_clusters' engine) vs a naive union-find
# ---------------------------------------------------------------------------


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """The distributed log-rounds algorithm must produce EXACTLY the
    min-id component labeling of a sequential union-find, for arbitrary
    graphs (cycles, self-parallel edges, disconnected chunks)."""
    from mammoth_spark.functions.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {v: find(v) for v in parent}

    df = local_df(
        spark,
        [(int(a), int(b)) for a, b in edges],
        T.StructType(
            [
                T.StructField("id_a", T.LongType()),
                T.StructField("id_b", T.LongType()),
            ]
        ),
    )
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == expected


def test_lsh_more_bands_is_superset_recall(spark, sf_dir):
    """The recall-knob contract: band b always hashes signature slice
    [b*n_rows, (b+1)*n_rows), so an 8-band configuration's candidate set
    contains the 4-band default's — after identical exact-Jaccard
    verification the emitted pair set must be a superset, and every pair
    in both configurations must clear the threshold."""
    from mammoth_spark.functions.dedup import dedup_minhash_lsh
    from mammoth_spark.model import read_table

    docs = read_table(spark, sf_dir, "documents")
    base = {
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(docs, jaccard_threshold=0.2).select(
            "id_a", "id_b"
        ).collect()
    }
    wide = {
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(
            docs, jaccard_threshold=0.2, n_bands=8, n_rows=2
        ).select("id_a", "id_b").collect()
    }
    assert base <= wide
    assert len(base) > 0


# ---------------------------------------------------------------------------
# TOAST tri-state: COW MERGE CASE == MOR read-time resolution == ground truth
# ---------------------------------------------------------------------------


def _toast_cell(rng, allow_unchanged):
    if allow_unchanged and rng.random() < 0.35:
        return {"v": None, "is_null": False, "is_unchanged": True}
    if rng.random() < 0.2:
        return {"v": None, "is_null": True, "is_unchanged": False}
    return {"v": str(rng.randrange(100)), "is_null": False, "is_unchanged": False}


def _toast_chain(rng, key):
    """One stable-identity valid chain: INSERT (concrete cells), then
    UPDATEs (cells may be unchanged / explicit NULL / values), optional
    DELETE, optional resurrection via a fresh fully-valued INSERT."""
    actions = []
    alive = False
    for _ in range(rng.randrange(1, 6)):
        if not alive:
            actions.append(
                ("INSERT", key,
                 {c: _toast_cell(rng, allow_unchanged=False) for c in ("a", "b")})
            )
            alive = True
            continue
        if rng.random() < 0.25:
            actions.append(("DELETE", key, None))
            alive = False
            continue
        actions.append(
            ("UPDATE", key,
             {c: _toast_cell(rng, allow_unchanged=True) for c in ("a", "b")})
        )
    return actions


def _toast_ground_truth(rows):
    """Sequential per-action fold of the reference CASE: unchanged
    inherits the current value, is_null sets NULL, else the new value;
    DELETE removes the row (multi_row_action.go + snowflake_target.go:552)."""
    state = {}
    for _, key, kind, cells in sorted(rows):
        if kind == "DELETE":
            state.pop(key, None)
            continue
        row = dict(state.get(key) or {"a": None, "b": None})
        for c, cell in cells.items():
            if cell["is_unchanged"]:
                continue
            row[c] = None if cell["is_null"] else cell["v"]
        state[key] = row
    return {k: (v["a"], v["b"]) for k, v in state.items()}


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_toast_cow_equals_mor_equals_ground_truth(spark, tmp_path_factory, seed):
    """For random valid TOAST chains split at ARBITRARY micro-batch
    boundaries, three implementations must agree exactly: the COW path
    (compact_last_wins_flagged -> change_flatten -> merge_upsert_flagged
    per batch), the MOR path (compact_for_mor_flagged -> write_delta ->
    per-column read-time resolution, with an OPTIMIZE fold at a random
    boundary), and a sequential Python fold of the reference CASE. This
    generalizes the 7 hand-written scenarios to the whole valid-chain
    space, including unchanged-after-resurrection and explicit-NULL-
    then-unchanged interleavings the goldens don't reach."""
    from mammoth_spark.operators import (
        change_flatten,
        compact_last_wins_flagged,
        merge_upsert_flagged,
    )
    from mammoth_spark.sources.target import ParquetMorTarget, compact_for_mor_flagged

    rng = random.Random(seed)
    chains = [_toast_chain(rng, str(k)) for k in range(rng.randrange(1, 6))]
    merged = []
    idx = [0] * len(chains)
    while any(i < len(c) for i, c in zip(idx, chains)):
        live = [j for j, c in enumerate(chains) if idx[j] < len(c)]
        j = rng.choice(live)
        merged.append(chains[j][idx[j]])
        idx[j] += 1
    rows = [
        (seq, key, kind, cells)
        for seq, (kind, key, cells) in enumerate(merged, start=1)
    ]
    expected = _toast_ground_truth(rows)

    # random contiguous batch boundaries (1-4 batches)
    n_batches = rng.randrange(1, min(4, len(rows)) + 1)
    cuts = sorted(rng.sample(range(1, len(rows)), n_batches - 1)) if n_batches > 1 else []
    bounds = [0] + cuts + [len(rows)]
    batches = [rows[lo:hi] for lo, hi in zip(bounds, bounds[1:])]
    compact_after = rng.randrange(0, len(batches))  # MOR fold position

    cell_t = T.StructType(
        [
            T.StructField("v", T.StringType()),
            T.StructField("is_null", T.BooleanType()),
            T.StructField("is_unchanged", T.BooleanType()),
        ]
    )
    log_t = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("a", cell_t),
            T.StructField("b", cell_t),
        ]
    )

    def to_df(batch):
        return local_df(
            spark,
            [
                (
                    seq,
                    key,
                    kind,
                    None if cells is None else tuple(cells["a"].values()),
                    None if cells is None else tuple(cells["b"].values()),
                )
                for seq, key, kind, cells in batch
            ],
            log_t,
        )

    # COW: in-memory target frame, per-batch flagged MERGE
    cow = local_df(
        spark,
        [],
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("a", T.StringType()),
                T.StructField("b", T.StringType()),
            ]
        ),
    )
    mor = ParquetMorTarget(
        spark,
        str(tmp_path_factory.mktemp(f"toastprop{seed}")),
        ["key"],
        ["a", "b"],
        flagged=True,
    )
    mor.initialize(cow)
    for i, batch in enumerate(batches):
        bdf = to_df(batch)
        compacted = compact_last_wins_flagged(bdf, ["key"], ["a", "b"]).drop(
            "last_seq", "n_actions"
        )
        flat = change_flatten(compacted, ["key"], ["a", "b"], flagged=True)
        cow = merge_upsert_flagged(cow, flat, ["key"], ["a", "b"]).localCheckpoint(
            eager=True
        )
        mor.write_delta(compact_for_mor_flagged(bdf, ["key"], ["a", "b"]))
        if i == compact_after:
            mor.compact()

    as_dict = lambda df: {r["key"]: (r["a"], r["b"]) for r in df.collect()}  # noqa: E731
    assert as_dict(cow) == expected
    assert as_dict(mor.read()) == expected
