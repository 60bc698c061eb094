"""Bloom key index on the bucketed COW target (Hudi bloom-index shape):
staging writes an exact per-bucket-version ``_BLOOM`` sidecar; ``probe``
answers point lookups reading only buckets an admitted key routes to —
an absent key costs zero file I/O. False negatives are impossible (the
filter is rebuilt from the staged rows of each version); false positives
cost one pruned read and never a wrong row."""

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mammoth_spark.sources.target import ParquetBucketedTarget

KV = T.StructType(
    [T.StructField("key", T.StringType()), T.StructField("name", T.StringType())]
)
CHG = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)


@pytest.fixture
def target(spark, tmp_path):
    t = ParquetBucketedTarget(
        spark,
        str(tmp_path / "items"),
        ["key"],
        ["name"],
        n_buckets=4,
        bloom_bits=1024,
    )
    t.initialize(
        spark.createDataFrame([(f"k{i}", f"name-{i}") for i in range(64)], KV)
    )
    return t


def _state(df):
    return {r["key"]: r["name"] for r in df.collect()}


def test_bloom_sidecars_written_per_bucket_version(spark, target):
    m = target._manifest()["buckets"]
    for b in range(4):
        assert os.path.exists(
            os.path.join(target._bucket_dir(b, m[str(b)]), "_BLOOM")
        )


def test_probe_present_keys_exact(spark, target):
    got = _state(target.probe([("k3",), ("k17",), ("k60",)]))
    assert got == {"k3": "name-3", "k17": "name-17", "k60": "name-60"}
    assert target.last_probe_stats["n_keys"] == 3
    # a present key can never be bloom-rejected
    assert target.last_probe_stats["bloom_negative"] == 0


def test_probe_absent_keys_skip_io(spark, target):
    target.probe([("zz1",), ("zz2",), ("zz3",), ("zz4",), ("zz5",)])
    st = target.last_probe_stats
    # 1024 bits over ~16 keys/bucket: essentially every absent key is
    # rejected without touching a file
    assert st["bloom_negative"] >= 4
    assert st["buckets_read"] <= 1


def test_probe_mixed_and_empty_result_schema(spark, target):
    df = target.probe([("k1",), ("zz-absent",)])
    assert _state(df) == {"k1": "name-1"}
    empty = target.probe([("zz-absent",)])
    assert empty.columns == ["key", "name"]
    assert empty.count() == 0


def test_merge_rebuilds_bloom_deletes_shrink(spark, target):
    """COW staging rewrites the whole touched bucket, so the sidecar is
    rebuilt exactly: a deleted key becomes bloom-invisible again (no
    accumulation drift), and a new key becomes findable."""
    target.write(
        spark.createDataFrame(
            [("k1", "DELETE", None), ("fresh", "UPSERT", "brand-new")], CHG
        )
    )
    got = _state(target.probe([("fresh",)]))
    assert got == {"fresh": "brand-new"}

    # bloom of k1's NEW bucket version rejects k1 (exact rebuild) —
    # unless k1 shares all k bit positions with a surviving key (then
    # it is an ordinary false positive: a wasted read, zero wrong rows)
    out = target.probe([("k1",)])
    assert out.count() == 0


def test_probe_without_bloom_still_bucket_prunes(spark, tmp_path):
    t = ParquetBucketedTarget(
        spark, str(tmp_path / "plain"), ["key"], ["name"], n_buckets=8
    )
    t.initialize(
        spark.createDataFrame([(f"k{i}", f"n{i}") for i in range(32)], KV)
    )
    got = _state(t.probe([("k5",), ("absent",)]))
    assert got == {"k5": "n5"}
    st = t.last_probe_stats
    assert st["bloom_negative"] == 0  # no filter to reject with
    assert st["buckets_read"] <= 2  # but still only the keys' buckets


def test_probe_respects_explicit_bucket_map_versions(spark, target):
    """probe(bucket_map=...) reads the versions THAT map references —
    the TxnCatalog integration point (members pass the catalog's map)."""
    old_map = dict(target._manifest()["buckets"])
    target.write(spark.createDataFrame([("k1", "UPSERT", "renamed")], CHG))
    assert _state(target.probe([("k1",)])) == {"k1": "renamed"}
    assert _state(target.probe([("k1",)], bucket_map=old_map)) == {"k1": "name-1"}


def test_catalog_probe_bucketed_member(spark, tmp_path):
    """TxnCatalog.probe routes a bucketed member's point lookup through
    the member's bloom with the CATALOG's bucket map — catalog members
    have no own manifest, so the passthrough is the only correct way
    to probe them."""
    from mammoth_spark.sources.target import ParquetMergeTarget, TxnCatalog

    targets = {
        "users": ParquetMergeTarget(spark, str(tmp_path / "u"), ["key"], ["name"]),
        "items": ParquetBucketedTarget(
            spark,
            str(tmp_path / "i"),
            ["key"],
            ["name"],
            n_buckets=4,
            bloom_bits=1024,
        ),
    }
    cat = TxnCatalog(spark, str(tmp_path / "cat"), targets)
    cat.initialize(
        {
            "users": spark.createDataFrame([("1", "Taylor")], KV),
            "items": spark.createDataFrame(
                [(f"k{i}", f"n{i}") for i in range(32)], KV
            ),
        }
    )
    got = _state(cat.probe("items", [("k7",), ("absent",)]))
    assert got == {"k7": "n7"}
    st = targets["items"].last_probe_stats
    assert st["bloom_negative"] == 1 and st["buckets_read"] == 1

    with pytest.raises(ValueError, match="no bucket/bloom index"):
        cat.probe("users", [("1",)])


def test_probe_pushes_in_predicate_to_scan(spark, target):
    """Single-column-key probes rewrite to an IN predicate instead of a
    semi-join, so the key filter reaches the parquet scan and row-group
    min/max stats skip WITHIN the admitted buckets too."""
    df = target.probe([("k1",), ("k2",)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(key" in plan, plan[:800]
    assert "Join" not in plan


# -- round 12: bloom index on the bucketed MERGE-ON-READ target ---------------


from mammoth_spark.sources.target import ParquetBucketedMorTarget, compact_for_mor


@pytest.fixture
def bmor_target(spark, tmp_path):
    t = ParquetBucketedMorTarget(
        spark,
        str(tmp_path / "bm_items"),
        ["key"],
        ["name"],
        n_buckets=4,
        bloom_bits=1024,
    )
    t.initialize(
        spark.createDataFrame([(f"k{i}", f"name-{i}") for i in range(64)], KV)
    )
    return t


def _mor_batch(spark, rows, seq0=0):
    return compact_for_mor(
        spark.createDataFrame(rows, CHG).withColumn(
            "seq", F.monotonically_increasing_id() + F.lit(seq0)
        ),
        ["key"],
        ["name"],
    )


def test_bmor_bloom_sidecars_on_base_and_deltas(spark, bmor_target):
    t = bmor_target
    m = t._manifest()["buckets"]
    for b in range(4):
        assert os.path.exists(
            os.path.join(t._base_dir(b, m[str(b)]["base"]), "_BLOOM")
        )
    t.write_delta(_mor_batch(spark, [("k1", "UPSERT", "renamed")], 100))
    m = t._manifest()["buckets"]
    touched = [b for b in range(4) if m[str(b)]["deltas"] > 0]
    assert touched
    for b in touched:
        assert os.path.exists(
            os.path.join(t._delta_dir(b, m[str(b)]["base"], 0), "_BLOOM")
        )


def test_bmor_probe_reconciles_chain(spark, bmor_target):
    t = bmor_target
    t.write_delta(_mor_batch(spark, [("k1", "UPSERT", "renamed"), ("k2", "DELETE", None)], 100))
    got = _state(t.probe([("k1",), ("k2",), ("k3",)]))
    # k1 resolves to the delta, k2's tombstone reconciles it away, k3 base
    assert got == {"k1": "renamed", "k3": "name-3"}
    st = t.last_probe_stats
    assert st["n_keys"] == 3 and st["bloom_negative"] == 0


def test_bmor_probe_absent_keys_skip_io(spark, bmor_target):
    t = bmor_target
    t.write_delta(_mor_batch(spark, [("k1", "UPSERT", "renamed")], 100))
    t.probe([("zz1",), ("zz2",), ("zz3",), ("zz4",), ("zz5",)])
    st = t.last_probe_stats
    assert st["bloom_negative"] >= 4
    assert st["buckets_read"] <= 1


def test_bmor_probe_new_key_in_delta_found(spark, bmor_target):
    """A key born in a DELTA slice is admitted by the delta's own
    sidecar even though the base's filter has never seen it."""
    t = bmor_target
    t.write_delta(_mor_batch(spark, [("fresh", "UPSERT", "brand-new")], 100))
    assert _state(t.probe([("fresh",)])) == {"fresh": "brand-new"}


def test_bmor_fold_resets_filters(spark, bmor_target):
    """After a fold the fresh base's sidecar is rebuilt from the folded
    rows: a deleted-then-folded key prunes to zero I/O again."""
    t = bmor_target
    t.write_delta(_mor_batch(spark, [("k1", "DELETE", None)], 100))
    t.compact()
    m = t._manifest()["buckets"]
    assert all(m[str(b)]["deltas"] == 0 for b in range(4) if m[str(b)]["deltas"])
    out = t.probe([("k1",)])
    assert out.count() == 0
    # the folded filter rejects it outright (modulo bit-collision FP)
    got2 = _state(t.probe([("k3",)]))
    assert got2 == {"k3": "name-3"}


def test_catalog_probe_bmor_member(spark, tmp_path):
    """TxnCatalog.probe passthrough for bucketed-MOR members: probes run
    against the CATALOG's committed chain state, with pruning stats."""
    from mammoth_spark.sources.target import TxnCatalog

    t = ParquetBucketedMorTarget(
        spark,
        str(tmp_path / "bm"),
        ["key"],
        ["name"],
        n_buckets=4,
        bloom_bits=1024,
    )
    cat = TxnCatalog(spark, str(tmp_path / "cat"), {"items": t})
    cat.initialize(
        {"items": spark.createDataFrame([(f"k{i}", f"n{i}") for i in range(32)], KV)}
    )
    cat.apply_txn({"items": _mor_batch(spark, [("k7", "UPSERT", "seven")], 100)}, epoch=0)
    got = _state(cat.probe("items", [("k7",), ("absent",)]))
    assert got == {"k7": "seven"}
    st = t.last_probe_stats
    assert st["bloom_negative"] == 1 and st["buckets_read"] == 1


# -- round 14: distributed probe (probe_df — no driver key collect) -----------


def _kdf(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_probe_df_matches_probe_cow(spark, target):
    keys = ["k3", "k17", "k60", "zz1", "zz2", "zz3", "zz4", "zz5"]
    want = _state(target.probe([(k,) for k in keys]))
    st_list = dict(target.last_probe_stats)
    got = _state(target.probe_df(_kdf(spark, keys)))
    st_df = dict(target.last_probe_stats)
    assert got == want
    # identical pruning: the SQL-side bit check and _bloom_admits read
    # the same sidecars through the same bit arithmetic
    assert st_df == st_list


def test_probe_df_matches_probe_bmor(spark, bmor_target):
    t = bmor_target
    t.write_delta(
        _mor_batch(spark, [("k1", "UPSERT", "renamed"), ("k2", "DELETE", None)], 100)
    )
    keys = ["k1", "k2", "k3", "fresh-absent", "zz1", "zz2"]
    want = _state(t.probe([(k,) for k in keys]))
    st_list = dict(t.last_probe_stats)
    got = _state(t.probe_df(_kdf(spark, keys)))
    st_df = dict(t.last_probe_stats)
    assert got == want == {"k1": "renamed", "k3": "name-3"}
    assert st_df == st_list


def test_probe_df_empty_and_all_absent(spark, target):
    out = target.probe_df(_kdf(spark, []))
    assert out.columns == ["key", "name"] and out.count() == 0
    assert target.last_probe_stats["n_keys"] == 0
    out = target.probe_df(_kdf(spark, ["zz-a", "zz-b", "zz-c", "zz-d", "zz-e"]))
    st = target.last_probe_stats
    assert st["n_keys"] == 5 and st["bloom_negative"] >= 4
