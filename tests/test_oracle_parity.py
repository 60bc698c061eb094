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
    hash_match failure, and the single r10 red row (cdf_incremental_agg),
    traced to exactly this. The earlier version of this guard grepped the
    DB-API ``description`` for "HUGEINT", but DuckDB's DB-API reports the
    generic ``'NUMBER'`` for every numeric column, so it could never fire
    (VERDICT r10 "What's wrong" #2). Inspect the Arrow schema instead:
    ``fetch_arrow_table()`` surfaces HUGEINT as ``decimal128(38, 0)``,
    which IS what the driver hashes. No oracle may expose a decimal /
    int128 top-level column (repo convention: Spark sides are bigint /
    double; any intentional decimal parity would need an allowlist here)."""
    import pyarrow as pa

    con = _duck(SF_DIR)
    # LIMIT 0 binds the typed output schema without evaluating the data —
    # the guard reads types only, so don't run all 240 oracles twice
    schema = (
        con.execute(f"SELECT * FROM ({ORACLES[name]}) LIMIT 0")
        .fetch_arrow_table()
        .schema
    )
    bad = [
        (f.name, str(f.type))
        for f in schema
        if pa.types.is_decimal(f.type) or str(f.type) in ("int128", "hugeint")
    ]
    assert not bad, (
        f"{name}: decimal/int128 columns {bad} — the driver hashes the typed "
        "representation, so wrap as CAST(sum(...) AS BIGINT) (or AS DOUBLE)"
    )


def test_contract_is_ledger_cut():
    """Rotation policy, enforced (VERDICT r06 "Next round" #7): the
    exported driver contract must equal ``rotation.cut_contract``'s
    deterministic cut of the correctness ledger (never-verified queries
    first, then refactored flagships, then oldest-row-first), computed
    over rounds < CONTRACT_ROUND so the assertion stays stable after
    the driver writes this round's CORRECTNESS file. This replaces the
    r06 never-verified-first check: it additionally bounds row age (the
    oldest rows always fill the re-verification slots) and forces a
    rotation edit whenever a new query is registered."""
    from mammoth_spark.rotation import CONTRACT_SIZE, cut_contract

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exported = list(entry_mod.queries().keys())
    assert len(exported) <= CONTRACT_SIZE, (
        f"{len(exported)} driver queries exceed the observed 50-row cap"
    )
    expected = cut_contract(sorted(QUERIES), repo)
    assert exported == expected, (
        "DRIVER_EXPORT is stale — regenerate with "
        "`python tools/rotation_ledger.py --cut` (check rotation.CONTRACT_ROUND "
        f"and rotation.FLAGSHIPS): first diff at "
        f"{next(((i, a, b) for i, (a, b) in enumerate(zip(exported, expected)) if a != b), 'length')}"
    )
    for name in LOCAL_ONLY:
        assert name in QUERIES and name not in exported


def test_contract_bounds_row_age():
    """Freshness invariant the cut is designed to maintain (rotation.py:
    every row ages at most ceil(N/50)+1 contracts): no query's last green
    driver row may be older than that bound unless the query holds a slot
    in the current contract (i.e. is being re-verified now). The bound is
    computed from the LIVE registry — the r13 version hard-coded 5 from
    the 202-query era, which is unsatisfiable at 263 queries (a full
    sweep alone takes ceil(263/50) = 6 contracts before any flagship
    re-verification slot is spent)."""
    import math

    from mammoth_spark.rotation import CONTRACT_ROUND, last_green_rounds

    bound = math.ceil(len(QUERIES) / 50) + 1
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exported = set(entry_mod.queries().keys())
    last = last_green_rounds(repo, upto_round=CONTRACT_ROUND)
    stale = [
        (n, r) for n, r in sorted(last.items())
        if n in QUERIES and r < CONTRACT_ROUND - bound and n not in exported
    ]
    assert not stale, (
        f"driver rows older than {bound} rounds and not being re-verified: {stale}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_runs(spark):
    for name, q in QUERIES.items():
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name
