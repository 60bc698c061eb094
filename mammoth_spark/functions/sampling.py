"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB corpus is split into train/val/test and down-sampled per stratum
ONCE, but the assignment must be reproducible forever after (re-runs,
backfills, auditing "which split was this doc in?"). So assignment is a
pure function of the row's stable id — a hash bucket — never `rand()`,
never `df.sample` (both depend on partitioning and run order; see the
reference's determinism discipline, e.g. sync/service/sync_service.go's
snapshot-pinned export at :159-221, where repeatability is the contract).

Every expression here is a narrow per-row projection (zero shuffles); the
hash is md5 so the oracle can reproduce it bit-for-bit in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HASH_BUCKETS = 1000


def hash_bucket(col: Column, n_buckets: int = HASH_BUCKETS, salt: str = "") -> Column:
    """Uniform bucket 0..n_buckets-1 from the first 8 md5 hex chars of
    ``salt || col``. 32 bits of hash for <= 10^6 buckets keeps the modulo
    bias below 2^-12; `conv` parses hex JVM-side (no UDF)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_buckets).alias(
        "bucket"
    )


def hash_bucket_sql(expr: str, n_buckets: int = HASH_BUCKETS, salt: str = "") -> str:
    """The DuckDB mirror of :func:`hash_bucket` (no hex cast there, so an
    explicit nibble-positional parse of the same 8 chars)."""
    h = f"md5('{salt}' || CAST({expr} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({terms}) % {n_buckets})"


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add ``bucket`` and ``split`` columns: buckets [0,w1) -> first split,
    [w1,w1+w2) -> second, ... Weights are out of HASH_BUCKETS. The salt
    namespaces this split from any other hash use of the same id."""
    weights = weights or {"train": 900, "val": 50, "test": 50}
    assert sum(weights.values()) == HASH_BUCKETS
    b = hash_bucket(F.col(id_col), HASH_BUCKETS, salt)
    expr: Column | None = None
    acc = 0
    for name, w in weights.items():
        acc += w
        cond = F.col("bucket") < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("bucket", b).withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: a row survives
    iff its hash bucket < fraction*HASH_BUCKETS for its stratum. The
    fraction map compiles to a CASE expression — evaluated per row with no
    join, no shuffle, no driver-side rate lookup — which is how quota
    sampling (e.g. downweight boilerplate-heavy sources, upweight rare
    languages) stays a pure scan at corpus scale."""
    b = hash_bucket(F.col(id_col), HASH_BUCKETS, salt)
    cut: Column = F.lit(int(default_fraction * HASH_BUCKETS))
    expr = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        lim = F.lit(int(round(frac * HASH_BUCKETS)))
        expr = F.when(cond, lim) if expr is None else expr.when(cond, lim)
    cut = expr.otherwise(cut) if expr is not None else cut
    return df.withColumn("bucket", b).filter(F.col("bucket") < cut)
