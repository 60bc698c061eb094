"""cdc_compact — keyed change compaction (SURVEY §2 A9, the flagship).

Semantics from the reference's ``multirowaction`` package
(reference target/common/multirowaction/multi_row_action.go:22-180):
an ordered fold of all actions on the same row identity into at most one
net action, with the pair rules

    (I,U)->I   (U,U)->U   (I,D)->∅   (U,D)->D   (D,I)->U
    (I,I), (U,I), (D,U), (D,D) -> error (invalid sequence)

per-column values: the later action's value wins unless it is TOAST-
``unchanged``, in which case the earlier value is inherited
(multi_row_action.go:121-127,149-154); an UPDATE that changes the row
identity re-keys the in-flight entry (deduplicateActions,
multi_row_action.go:69-101), and a (U,D) pair where the U changed identity
deletes under the ORIGINAL key (multi_row_action.go:158-168).

Two implementations:

* ``compact_last_wins`` / ``compact_last_wins_flagged`` — the distributed
  fast path. For valid chains with stable identity, the pairwise fold is
  equivalent to a closed form over (first kind, last kind) and a
  "latest non-unchanged value per column" reduction. Both are expressed as
  ``groupBy(key).agg(min_by/max_by)`` — hash aggregation with map-side
  partial combine, ONE shuffle keyed by row identity, no window sort.
  This is the plan you want at 100 TB: partial aggregation collapses each
  key's run locally before the exchange, so shuffle volume is ~#distinct
  keys, not #actions.

* ``compact_exact`` — full parity including identity-change chains and
  invalid-sequence errors. Identity renames form chains that no per-key
  windowing can follow (the key itself moves), so this path folds each
  relation's actions in order inside ``applyInPandas`` (Arrow-batched).
  Batches are micro-batches by contract (≤ ~25k actions, reference
  config/config.go:49), so a per-relation fold is bounded; at cluster
  scale you shard the fold by key-connected-components if ever needed.

Net-kind closed form (derivable from the pair table, assuming a valid
chain): if last kind is DELETE → DELETE, unless first kind is INSERT →
net nothing (drop); else INSERT if first kind is INSERT, else UPDATE.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import KIND_DELETE, KIND_INSERT, KIND_UPDATE


class InvalidActionSequenceError(RuntimeError):
    """Invalid action pair on one row identity — (I,I), (U,I), (D,U) or
    (D,D) — mirrors the reference's hard error
    (multi_row_action.go:176-179)."""


def net_kind_column(first_kind: Column, last_kind: Column) -> Column:
    """Closed-form net action kind; NULL means the chain nets to nothing."""
    return (
        F.when((first_kind == KIND_INSERT) & (last_kind == KIND_DELETE), F.lit(None))
        .when(last_kind == KIND_DELETE, F.lit(KIND_DELETE))
        .when(first_kind == KIND_INSERT, F.lit(KIND_INSERT))
        .otherwise(F.lit(KIND_UPDATE))
    )


def compact_last_wins(
    change_log: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    seq_col: str = "seq",
    kind_col: str = "kind",
) -> DataFrame:
    """Fast-path compaction for plain-column change logs (no TOAST flags).

    One hash aggregation per key: ``min_by(kind, seq)`` / ``max_by(kind,
    seq)`` give the first/last kinds, and for each value column
    ``max_by(value, seq-if-not-delete)`` gives the latest value carried by
    a non-DELETE action (DELETE actions carry no new values,
    reference sync/db/db.go:136-137). Rows netting to nothing (INSERT then
    DELETE inside one batch) are dropped, matching (I,D)->∅.
    """
    seq, kind = F.col(seq_col), F.col(kind_col)
    carries_values = kind != KIND_DELETE
    aggs = [
        F.min_by(kind, seq).alias("_first_kind"),
        F.max_by(kind, seq).alias("_last_kind"),
        F.max(seq).alias("last_seq"),
        F.count(F.lit(1)).alias("n_actions"),
    ] + [
        F.max_by(F.col(c), F.when(carries_values, seq)).alias(c) for c in value_cols
    ]
    out = change_log.groupBy(*key_cols).agg(*aggs)
    out = out.withColumn("kind", net_kind_column(F.col("_first_kind"), F.col("_last_kind")))
    return out.filter(F.col("kind").isNotNull()).select(
        *key_cols, "kind", "last_seq", "n_actions", *value_cols
    )


def compact_last_wins_flagged(
    change_log: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    seq_col: str = "seq",
    kind_col: str = "kind",
) -> DataFrame:
    """Fast-path compaction where each value column is a
    struct<v, is_null, is_unchanged> (the full change-log model).

    Per column the winning cell is the latest one that is not TOAST-
    ``unchanged`` (multi_row_action.go:121-127): ``max_by(cell,
    seq-if-changed)``. If every action left the column unchanged the result
    is NULL, which downstream merge reads as "inherit the target's value" —
    the same composition the reference uses at merge time
    (snowflake_target.go:552).
    """
    seq, kind = F.col(seq_col), F.col(kind_col)
    aggs = [
        F.min_by(kind, seq).alias("_first_kind"),
        F.max_by(kind, seq).alias("_last_kind"),
        F.max(seq).alias("last_seq"),
        F.count(F.lit(1)).alias("n_actions"),
    ]
    for c in value_cols:
        cell = F.col(c)
        changed = (kind != KIND_DELETE) & ~F.coalesce(cell["is_unchanged"], F.lit(False))
        aggs.append(F.max_by(cell, F.when(changed, seq)).alias(c))
    out = change_log.groupBy(*key_cols).agg(*aggs)
    out = out.withColumn("kind", net_kind_column(F.col("_first_kind"), F.col("_last_kind")))
    return out.filter(F.col("kind").isNotNull()).select(
        *key_cols, "kind", "last_seq", "n_actions", *value_cols
    )


# --------------------------- exact fold path ---------------------------


def _merge_values(old: dict | None, new: dict | None) -> dict | None:
    """Per-column merge: new wins unless is_unchanged, then old survives
    (multi_row_action.go:121-127,149-154)."""
    if new is None:
        return old
    if old is None:
        return new
    merged = {}
    for col, cell in new.items():
        if cell is not None and cell.get("is_unchanged"):
            merged[col] = old.get(col, cell)
        else:
            merged[col] = cell
    return merged


def _fold_relation(actions: Iterable[dict]) -> list[dict]:
    """Ordered fold of one relation's actions, keyed by row identity.

    Mirrors Grouper/deduplicateActions/mergeActions
    (multi_row_action.go:22-180): a dict keyed by the identity-BEFORE of
    each incoming action; identity-changing updates move the entry to the
    new key; merges follow the pair table; invalid pairs raise.
    """
    state: dict[tuple, dict] = {}
    order: list[tuple] = []  # stable output order of first touch

    for act in actions:
        key_before = tuple(act["key_before"])
        key_after = tuple(act["key_after"])
        prior = state.get(key_before)

        if prior is None:
            state[key_before] = dict(act)
            order.append(key_before)
            cur = key_before
        else:
            pk, ak = prior["kind"], act["kind"]
            if (pk, ak) in {
                (KIND_INSERT, KIND_INSERT),
                (KIND_UPDATE, KIND_INSERT),
                (KIND_DELETE, KIND_UPDATE),
                (KIND_DELETE, KIND_DELETE),
            }:
                raise InvalidActionSequenceError(
                    f"invalid action sequence on key {key_before}: {pk} then {ak}"
                )
            merged = dict(prior)
            merged["seq"] = act["seq"]
            if (pk, ak) == (KIND_INSERT, KIND_DELETE):
                # (I,D) -> net nothing (multi_row_action.go:131-136)
                del state[key_before]
                order.remove(key_before)
                continue
            if (pk, ak) == (KIND_DELETE, KIND_INSERT):
                # (D,I) -> UPDATE with the insert's values (:139-147)
                merged["kind"] = KIND_UPDATE
                merged["values"] = act["values"]
                merged["key_after"] = act["key_after"]
            elif ak == KIND_DELETE:
                # (U,D) -> DELETE under the ORIGINAL key; if the update had
                # changed identity, the delete still targets the pre-update
                # identity (:158-168)
                merged["kind"] = KIND_DELETE
                merged["values"] = None
                merged["key_after"] = merged["key_before"]
            else:
                # (I,U)->I, (U,U)->U: kind keeps prior, values merge (:121-127)
                merged["values"] = _merge_values(prior["values"], act["values"])
                merged["key_after"] = act["key_after"]
            state[key_before] = merged
            cur = key_before

        # identity change re-keys the live entry (deduplicateActions :69-101)
        entry = state[cur]
        if entry["kind"] != KIND_DELETE and tuple(entry["key_after"]) != cur:
            new_key = tuple(entry["key_after"])
            if new_key in state:
                raise InvalidActionSequenceError(
                    f"identity change collides with live key {new_key}"
                )
            state[new_key] = entry
            del state[cur]
            order[order.index(cur)] = new_key
            # the entry's key_before stays: a later DELETE must target it

    return [state[k] for k in order]


def compact_exact(
    change_log: DataFrame, seq_col: str = "seq", max_rename_edges: int = 100_000
) -> DataFrame:
    """Exact-parity compaction via an Arrow-batched sharded fold.

    Input columns: ``schema``, ``tbl``, ``seq``, ``kind``,
    ``key_before array<string>``, ``key_after array<string>``, and
    ``new_values`` as a JSON object of col -> {v, is_null, is_unchanged}
    cells (NULL for DELETE). Output: ≤1 net action per surviving row
    identity with the same shape.

    Sharding: the only reason the fold can't simply group by row identity
    is identity-change chains — a rename's state wanders across keys
    (deduplicateActions, multi_row_action.go:69-101). Renames are a tiny
    fraction of real WAL and bounded by the micro-batch contract, so we
    collect just the rename *edges* (key_before -> key_after), union-find
    them into connected components on the driver, broadcast the
    key -> component map, and fold each component — and each untouched
    key — as its own group. Result: the shuffle is keyed by row identity
    (same as the fast path), every executor folds in parallel, and the
    semantics are bit-identical to a whole-relation ordered fold because
    actions on unrelated identities never interact in the pair algebra.
    If a pathological batch carries > ``max_rename_edges`` renames, the
    components are computed DISTRIBUTED instead — pointer-jumping
    connected components (functions/dedup.py) over the rename-edge
    table — so the fold still runs per-component/per-key at any rename
    volume; no per-relation pandas group ever forms.
    """
    out_schema = T.StructType(
        [
            T.StructField("schema", T.StringType()),
            T.StructField("tbl", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("key_before", T.ArrayType(T.StringType())),
            T.StructField("key_after", T.ArrayType(T.StringType())),
            T.StructField("new_values", T.StringType()),  # JSON cells
        ]
    )

    import json

    def _rows_to_actions(rows: list[dict]) -> list[dict]:
        rows.sort(key=lambda d: d[seq_col])
        return [
            {
                "seq": d[seq_col],
                "kind": d["kind"],
                "key_before": list(d["key_before"]),
                "key_after": list(d["key_after"]),
                "values": json.loads(d["new_values"]) if d["new_values"] else None,
            }
            for d in rows
        ]

    def _folded_to_pdf(out: list[tuple[str, str, dict]]) -> pd.DataFrame:
        # explicit dtypes: a partition netting to ∅ yields an EMPTY frame,
        # and pandas would type its list columns float64, which Arrow
        # can't convert to list<string>
        return pd.DataFrame(
            {
                "schema": pd.Series([s for s, _, _ in out], dtype=object),
                "tbl": pd.Series([t for _, t, _ in out], dtype=object),
                "seq": pd.Series([a["seq"] for _, _, a in out], dtype="int64"),
                "kind": pd.Series([a["kind"] for _, _, a in out], dtype=object),
                "key_before": pd.Series([a["key_before"] for _, _, a in out], dtype=object),
                "key_after": pd.Series([a["key_after"] for _, _, a in out], dtype=object),
                "new_values": pd.Series(
                    [
                        json.dumps(a["values"]) if a["values"] is not None else None
                        for _, _, a in out
                    ],
                    dtype=object,
                ),
            },
            columns=[f.name for f in out_schema.fields],
        )

    def fold_partition(batches):
        # one Python pass per shuffle partition: group rows in plain dicts
        # (thousands of tiny per-key Arrow groups would each pay pandas
        # DataFrame-construction overhead), fold each group, emit once.
        # itertuples(name=None): namedtuples would mangle the _grp column
        groups: dict[tuple, list[dict]] = {}
        for pdf in batches:
            cols = list(pdf.columns)
            for vals in pdf.itertuples(index=False, name=None):
                d = dict(zip(cols, vals))
                groups.setdefault((d["schema"], d["tbl"], d["_grp"]), []).append(d)
        out: list[tuple[str, str, dict]] = []
        for (s, t, _g), rows in groups.items():
            out.extend((s, t, a) for a in _fold_relation(_rows_to_actions(rows)))
        yield _folded_to_pdf(out)

    kb = F.concat_ws("\x1f", F.col("key_before"))
    ka = F.concat_ws("\x1f", F.col("key_after"))
    rename_edges = (
        change_log.filter(kb != ka)
        .select("schema", "tbl", kb.alias("b"), ka.alias("a"))
        .distinct()
        .limit(max_rename_edges + 1)
        .collect()
    )
    if len(rename_edges) > max_rename_edges:
        # Pathological rename volume (VERDICT r08 residual #2): resolve
        # the rename chains DISTRIBUTED instead of collecting edges or
        # degrading to one pandas group per relation (a straggler at
        # 100×). The repo already owns the tool: pointer-jumping
        # connected components (functions/dedup.py, O(log diameter)
        # rounds) over the rename-edge table, vertices keyed as
        # (schema, tbl, key) so components never span relations. Rename
        # components are tiny by nature — the fold below still runs
        # per-component / per-untouched-key, the same granularity as the
        # driver fast path, just with the component map computed on the
        # executors and shuffle-joined (AQE broadcasts it when small).
        from ..functions.dedup import connected_components

        # vertices are hashed to bigint (connected_components' id domain —
        # its fixpoint test is a numeric sum). An xxhash64 collision would
        # only OVER-merge two components, which is semantically harmless:
        # folding unrelated identities in one group equals folding them
        # apart (the same invariant that justifies per-component folding
        # at all) — a collision costs a slightly larger group, never a
        # wrong result.
        vertex_b = F.xxhash64(F.col("schema"), F.col("tbl"), kb)
        vertex_a = F.xxhash64(F.col("schema"), F.col("tbl"), ka)
        edge_df = (
            change_log.filter(kb != ka)
            .select(vertex_b.alias("id_a"), vertex_a.alias("id_b"))
            .distinct()
        )
        labels = connected_components(edge_df).select(
            F.col("id").alias("m_vertex"),
            F.col("comp").cast("string").alias("m_comp"),
        )
        joined = change_log.join(
            labels, vertex_b == F.col("m_vertex"), "left"
        )
        grp = F.coalesce(
            F.concat(F.lit("c\x1e"), F.col("m_comp")),
            F.concat(F.lit("k\x1e"), kb),
        )
        sharded = joined.withColumn("_grp", grp).drop("m_vertex", "m_comp")
        return sharded.repartition("schema", "tbl", "_grp").mapInPandas(
            fold_partition, out_schema
        )

    # union-find over rename edges -> key-connected components
    parent: dict[tuple, tuple] = {}

    def find(x: tuple) -> tuple:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in rename_edges:
        rb = find((e["schema"], e["tbl"], e["b"]))
        ra = find((e["schema"], e["tbl"], e["a"]))
        if rb != ra:
            parent[ra] = rb

    if parent:
        from ..model import local_df

        comp_rows = [(k[0], k[1], k[2], "c\x1e" + "\x1f".join(find(k))) for k in list(parent)]
        comp_schema = T.StructType(
            [
                T.StructField("m_schema", T.StringType()),
                T.StructField("m_tbl", T.StringType()),
                T.StructField("m_key", T.StringType()),
                T.StructField("m_comp", T.StringType()),
            ]
        )
        comp_df = local_df(change_log.sparkSession, comp_rows, comp_schema)
        # every action on a chain-touched identity carries one of the
        # component's keys as key_before (both edge endpoints are mapped)
        joined = change_log.join(
            F.broadcast(comp_df),
            (F.col("schema") == F.col("m_schema"))
            & (F.col("tbl") == F.col("m_tbl"))
            & (kb == F.col("m_key")),
            "left",
        )
        grp = F.coalesce(F.col("m_comp"), F.concat(F.lit("k\x1e"), kb))
        sharded = joined.withColumn("_grp", grp).drop("m_schema", "m_tbl", "m_key", "m_comp")
    else:
        sharded = change_log.withColumn("_grp", kb)

    # hash-partition by group so each component/key lands whole in one
    # partition, then fold all of a partition's groups in ONE Python pass
    return sharded.repartition("schema", "tbl", "_grp").mapInPandas(fold_partition, out_schema)
