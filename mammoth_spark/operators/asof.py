"""As-of (point-in-time) join — the shuffle-once union + window pattern.

The reference implements no joins at all (SURVEY §2 Table B: the only
join-like operation is MERGE's PK equality match,
reference target/snowflake/snowflake_target.go:536-602), but a training-
data pipeline needs point-in-time enrichment constantly: attribution
("which click preceded this purchase"), feature snapshots ("account state
as of event time"), slowly-changing-dimension lookups.

A naive as-of is an inequality join (left.time >= right.time) — a
cartesian blow-up per key that no engine optimizes well. The scalable
shape is instead:

    union both sides tagged  ->  ONE shuffle on the join key  ->
    sort within key by (time, side)  ->  last(right payload, ignorenulls)
    carried forward  ->  keep left rows

One exchange, one sort, zero broadcast, and per-row window state of a
single struct — the plan survives any scale-up because it is exactly a
sort-merge pass. Right rows sort before left rows at equal timestamps, so
the match is inclusive (right.time <= left.time), the same contract as
DuckDB's ``ASOF JOIN ... ON l.t >= r.t``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _struct_type(df: DataFrame, cols: list[str]):
    return df.select(F.struct(*[F.col(c) for c in cols]).alias("s")).schema["s"].dataType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    payload_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    the same ``by`` key and ``right_on`` <= ``left_on`` (inclusive as-of).
    Left rows with no prior right row keep NULL payload (left join).

    Tie-break contract: among right rows with EQUAL (by, right_on), the
    greatest payload struct (lexicographic by ``payload_cols`` order)
    wins — a Spark-side determinism guarantee that DuckDB's ASOF JOIN
    does not specify for right-side ties. Oracle-paired callers must
    therefore guarantee unique (by, right_on) on the right side (every
    current registry pairing does: seq / event_id is unique per key);
    with duplicate right timestamps the brute-force-equivalence test
    still passes while the DuckDB comparison may not (ADVICE r03).
    """
    left_cols = [c for c in left.columns]
    l_type = _struct_type(left, left_cols)
    r_type = _struct_type(right, payload_cols)

    l_part = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("_atime"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_part = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("_atime"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_r"),
    )
    # the trailing _r key is the right-side tie-break: two right rows at
    # the same (key, time) would otherwise carry whichever one the sort
    # happened to emit last — partitioning-dependent output. With it the
    # contract is deterministic: greatest payload struct (lexicographic
    # by payload_cols order) wins among equal-time right rows. Left rows
    # (_r NULL) are unaffected — they never feed the carried state.
    w = (
        Window.partitionBy(*by)
        .orderBy("_atime", "_side", F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_part.unionByName(r_part).withColumn(
        "_carried", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left_cols] + [
        F.col(f"_carried.{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    return merged.filter(F.col("_side") == 1).select(*out_cols)
