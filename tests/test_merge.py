"""Merge semantics goldens — scenarios from the reference's Snowflake
integration suite (/root/reference/target/snowflake/
snowflake_target_integration_test.go:27-707), run against a local
DataFrame target instead of Snowflake."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mammoth_spark.operators import change_flatten, merge_upsert, merge_upsert_flagged


def df_from(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


TARGET_SCHEMA = T.StructType(
    [
        T.StructField("column_1", T.StringType()),
        T.StructField("column_2", T.StringType()),
        T.StructField("column_3", T.StringType()),
    ]
)


def collect_map(df, key="column_1"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_upsert_insert_update_delete(spark):
    # upsert last-wins cycle (integration_test.go:106-200 shape)
    target = df_from(
        spark,
        [("a", "old-a", "x"), ("b", "old-b", "y")],
        TARGET_SCHEMA,
    )
    changes = df_from(
        spark,
        [
            ("a", "UPDATE", "new-a", "x2"),   # matched update
            ("b", "DELETE", None, None),       # matched delete
            ("c", "INSERT", "new-c", "z"),     # unmatched insert
            ("d", "DELETE", None, None),       # ghost delete -> no row
        ],
        T.StructType(
            [
                T.StructField("column_1", T.StringType()),
                T.StructField("kind", T.StringType()),
                T.StructField("column_2", T.StringType()),
                T.StructField("column_3", T.StringType()),
            ]
        ),
    )
    out = collect_map(
        merge_upsert(target, changes, ["column_1"], ["column_2", "column_3"])
    )
    assert set(out) == {"a", "c"}
    assert out["a"]["column_2"] == "new-a"
    assert out["c"]["column_3"] == "z"


def test_merge_flagged_toast_unchanged_keeps_target_value(spark):
    # TOAST-unchanged update must inherit the TARGET's value for that column
    # (integration_test.go:594-636; MERGE CASE at snowflake_target.go:552)
    target = df_from(spark, [("k1", "keep-me", "old3")], TARGET_SCHEMA)
    cell = T.StructType(
        [
            T.StructField("v", T.StringType()),
            T.StructField("is_null", T.BooleanType()),
            T.StructField("is_unchanged", T.BooleanType()),
        ]
    )
    compacted_schema = T.StructType(
        [
            T.StructField("column_1", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("column_2", cell),
            T.StructField("column_3", cell),
        ]
    )
    compacted = df_from(
        spark,
        [
            (
                "k1",
                "UPDATE",
                Row(v=None, is_null=False, is_unchanged=True),   # TOAST: keep target
                Row(v="new3", is_null=False, is_unchanged=False),
            ),
            (
                "k2",
                "INSERT",
                Row(v="i2", is_null=False, is_unchanged=False),
                Row(v=None, is_null=True, is_unchanged=False),   # explicit NULL
            ),
        ],
        compacted_schema,
    )
    flat = change_flatten(compacted, ["column_1"], ["column_2", "column_3"], flagged=True)
    out = collect_map(
        merge_upsert_flagged(target, flat, ["column_1"], ["column_2", "column_3"])
    )
    assert out["k1"]["column_2"] == "keep-me"      # unchanged -> target value
    assert out["k1"]["column_3"] == "new3"
    assert out["k2"]["column_2"] == "i2"
    assert out["k2"]["column_3"] is None           # is_null -> NULL


def test_merge_flagged_delete_and_untouched_rows(spark):
    target = df_from(spark, [("a", "va", "x"), ("b", "vb", "y")], TARGET_SCHEMA)
    cell = T.StructType(
        [
            T.StructField("v", T.StringType()),
            T.StructField("is_null", T.BooleanType()),
            T.StructField("is_unchanged", T.BooleanType()),
        ]
    )
    compacted = df_from(
        spark,
        [("a", "DELETE", None, None)],
        T.StructType(
            [
                T.StructField("column_1", T.StringType()),
                T.StructField("kind", T.StringType()),
                T.StructField("column_2", cell),
                T.StructField("column_3", cell),
            ]
        ),
    )
    flat = change_flatten(compacted, ["column_1"], ["column_2", "column_3"], flagged=True)
    out = collect_map(
        merge_upsert_flagged(target, flat, ["column_1"], ["column_2", "column_3"])
    )
    assert set(out) == {"b"}
    assert out["b"]["column_2"] == "vb"  # untouched row fully preserved


def test_composite_pk_merge(spark):
    # composite natural key (t4 fixture / merge golden snowflake_target_test.go:56-88)
    target = df_from(
        spark,
        [("a", "1", "old"), ("a", "2", "keep")],
        T.StructType(
            [
                T.StructField("k1", T.StringType()),
                T.StructField("k2", T.StringType()),
                T.StructField("val", T.StringType()),
            ]
        ),
    )
    changes = df_from(
        spark,
        [("a", "1", "UPDATE", "new"), ("b", "9", "INSERT", "fresh")],
        T.StructType(
            [
                T.StructField("k1", T.StringType()),
                T.StructField("k2", T.StringType()),
                T.StructField("kind", T.StringType()),
                T.StructField("val", T.StringType()),
            ]
        ),
    )
    out = {
        (r["k1"], r["k2"]): r["val"]
        for r in merge_upsert(target, changes, ["k1", "k2"], ["val"]).collect()
    }
    assert out == {("a", "1"): "new", ("a", "2"): "keep", ("b", "9"): "fresh"}


def test_mor_equals_cow_and_survives_compact(spark, sf_dir, tmp_path):
    """Merge-on-read vs copy-on-write equivalence: the same three change
    batches applied through ParquetMorTarget (append deltas, reconcile at
    read) and ParquetMergeTarget (rewrite per batch) must produce the
    same final state; compact() + vacuum() must not change it while
    making the layout delta-free."""
    from pyspark.sql import functions as F

    from mammoth_spark.model import events_as_change_log, read_table
    from mammoth_spark.operators.compact import compact_last_wins
    from mammoth_spark.sources.target import (
        ParquetMergeTarget,
        ParquetMorTarget,
        compact_for_mor,
    )

    log = events_as_change_log(read_table(spark, sf_dir, "events")).select(
        "seq", "key", "kind", F.floor(F.col("value") * 1000).cast("bigint").alias("vm")
    )
    b = log.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).first()
    cut1 = b["lo"] + (b["hi"] - b["lo"]) // 3
    cut2 = b["lo"] + 2 * (b["hi"] - b["lo"]) // 3
    batches = [
        log.filter(F.col("seq") <= cut1),
        log.filter((F.col("seq") > cut1) & (F.col("seq") <= cut2)),
        log.filter(F.col("seq") > cut2),
    ]

    base0 = compact_last_wins(batches[0], ["key"], ["vm"])
    init = base0.filter(F.col("kind") != "DELETE").select("key", "vm")

    cow = ParquetMergeTarget(spark, str(tmp_path / "cow"), ["key"], ["vm"])
    cow.initialize(init)
    for batch in batches[1:]:
        cow.write(compact_last_wins(batch, ["key"], ["vm"]))

    mor = ParquetMorTarget(spark, str(tmp_path / "mor"), ["key"], ["vm"])
    mor.initialize(init)
    for batch in batches[1:]:
        mor.write_delta(compact_for_mor(batch, ["key"], ["vm"]))

    as_dict = lambda df: {r["key"]: r["vm"] for r in df.collect()}  # noqa: E731
    cow_state, mor_state = as_dict(cow.read()), as_dict(mor.read())
    assert mor_state == cow_state and len(mor_state) > 0

    assert mor._manifest()["deltas"] == 2
    mor.compact()
    assert mor._manifest()["deltas"] == 0
    removed = mor.vacuum()
    assert any(n.startswith("delta_") for n in removed)
    assert as_dict(mor.read()) == cow_state


def test_mor_net_nothing_chain_still_tombstones(spark, tmp_path):
    """compact_for_mor must keep (INSERT, DELETE)-net-nothing chains as
    DELETE tombstones: the batch's chain has to shadow an OLDER base row
    (compact_last_wins would drop it — correct for COW MERGE, wrong for
    a MOR delta)."""
    from pyspark.sql import types as T

    from mammoth_spark.model import local_df
    from mammoth_spark.sources.target import ParquetMorTarget, compact_for_mor

    schema_log = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("key", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("vm", T.LongType()),
        ]
    )
    schema_base = T.StructType(
        [T.StructField("key", T.LongType()), T.StructField("vm", T.LongType())]
    )
    mor = ParquetMorTarget(spark, str(tmp_path / "m"), ["key"], ["vm"])
    mor.initialize(local_df(spark, [(1, 10), (2, 20)], schema_base))
    # key 1: re-created then destroyed inside the delta -> must vanish
    batch = local_df(
        spark,
        [(100, 1, "INSERT", 11), (101, 1, "DELETE", None), (102, 2, "UPDATE", 21)],
        schema_log,
    )
    mor.write_delta(compact_for_mor(batch, ["key"], ["vm"]))
    state = {r["key"]: r["vm"] for r in mor.read().collect()}
    assert state == {2: 21}
