"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
fixtures; compare row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from mammoth_spark.registry import LOCAL_ONLY, ORACLES, QUERIES

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(SF_DIR)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mismatches}"


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_returns_no_hugeint(name):
    """The driver's hasher distinguishes DuckDB HUGEINT (int128, the
    default sum() output) from BIGINT even for equal values — every round-1
    hash_match failure traced to exactly this. Assert no oracle exposes a
    HUGEINT (or other unexpected) top-level column type."""
    con = _duck(SF_DIR)
    res = con.execute(ORACLES[name])
    bad = [
        (d[0], str(d[1]))
        for d in res.description
        if "HUGEINT" in str(d[1]).upper() or "INT128" in str(d[1]).upper()
    ]
    assert not bad, f"{name}: HUGEINT columns {bad} — wrap as CAST(sum(...) AS BIGINT)"


def test_driver_contract_size():
    """The round-1 driver recorded only the first 50 queries() entries;
    keep the exported contract at exactly <=50. Round 4 rotates in 50
    never-driver-verified queries (registry.DRIVER_EXPORT is the single
    source of truth); every name the r03 judge asked to promote must be
    in the contract, and nothing already driver-verified in r01-r03 may
    occupy a slot."""
    import json

    exported = list(entry_mod.queries().keys())
    assert len(exported) <= 50, f"{len(exported)} driver queries exceed the observed cap"
    for name in [
        # VERDICT r03 "Next round" #1 — judge-named promotions
        "lsh_recall_report", "triangle_count", "compaction_plan",
        "topk_sketch_merge", "unpivot_roundtrip", "rank_functions_report",
        "calendar_rollup", "xml_roundtrip", "pq_codes", "kmeans_step",
        "domain_cap", "pack_sequences", "dedup_exact_normalized",
        "key_skew_report",
        # VERDICT r03 "Next round" #3 — the TWS driver attempt
        "streaming_tws_totals",
    ]:
        assert name in exported, f"{name} must be in the driver contract"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified = set()
    for rnd in ("r01", "r02", "r03"):
        path = os.path.join(repo, f"CORRECTNESS_{rnd}.json")
        if os.path.exists(path):
            with open(path) as fh:
                verified |= set(json.load(fh))
    dupes = sorted(set(exported) & verified)
    assert not dupes, f"already driver-verified queries occupy r04 slots: {dupes}"
    for name in LOCAL_ONLY:
        assert name in QUERIES and name not in exported


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_runs(spark):
    for name, q in QUERIES.items():
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name
