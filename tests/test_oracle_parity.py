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
    keep the exported contract at exactly <=50. Round-6 policy
    (VERDICT r05 "Next round" #1): EVERY query without a green driver
    row in r01-r05 must either hold a slot or sit in the documented
    ``ROTATE_NEXT`` deferral queue (the 50-slot cap admits at most 50
    never-verified queries per round; round 6 has 56, so six lead the
    r07 contract instead). Nothing already verified may occupy a slot
    while a never-verified query waits outside both lists."""
    import json

    exported = list(entry_mod.queries().keys())
    assert len(exported) <= 50, f"{len(exported)} driver queries exceed the observed cap"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified = set()
    for rnd in ("r01", "r02", "r03", "r04", "r05"):
        path = os.path.join(repo, f"CORRECTNESS_{rnd}.json")
        if os.path.exists(path):
            with open(path) as fh:
                rows = json.load(fh)
            verified |= {
                k for k, v in rows.items()
                if v.get("rows_match") and v.get("schema_match") is not False
            }
    from mammoth_spark.registry import ROTATE_NEXT

    never = sorted(set(QUERIES) - verified)
    missing = [n for n in never if n not in exported and n not in ROTATE_NEXT]
    assert not missing, (
        f"never-driver-verified queries left out of both the contract "
        f"and the r07 queue: {missing}"
    )
    # Deferral is only legitimate while the contract is full of
    # never-verified queries: no already-verified query may hold a slot
    # while a never-verified one waits in the queue.
    if any(n in never for n in ROTATE_NEXT):
        reverified = [n for n in exported if n in verified]
        assert not reverified, (
            f"re-verification slots {reverified} while never-verified "
            f"queries are deferred to r07"
        )
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
