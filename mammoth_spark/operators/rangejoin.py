"""Range (interval) join — the bin-bucketed equi-join rewrite.

The reference implements no joins at all (SURVEY §2 Table B), but a
training-data / event pipeline constantly needs "fact timestamp falls
inside a dimension interval" enrichment: campaign attribution, validity
windows of slowly-changing dimensions, maintenance/blackout exclusion.

A naive range join is a pure theta join — Spark can only execute it as
BroadcastNestedLoopJoin (O(|facts| x |dims|) comparisons, and only while
one side fits in memory) or a cartesian product. Neither survives a large
interval table. The scalable rewrite buckets time into fixed-width bins:

    facts:  _bin = floor(ts / W)                       (one bin per row)
    dims:   explode one row per bin the interval [start, end) overlaps
    join:   equi-join on _bin (+ any extra equi keys), then re-check the
            exact predicate  start <= ts < end

Each (fact, dim) match surfaces exactly once — the fact's single bin is
by construction among the interval's exploded bins — so no distinct step
is needed. The equi-join shuffles on the fine-grained bin key (hash/SMJ,
AQE-eligible, broadcastable when dims are small), and the dim-side
replication factor is interval_length/W + 1, directly tunable via W.
This is the same rewrite Databricks' range-join optimization and
Flink's interval join perform internally; Spark OSS has no native rule,
so the engine provides it as an operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    facts: DataFrame,
    dims: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    equi_keys: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every dim interval with
    ``start <= ts < end`` (half-open) — as a binned equi-join.

    All three bound columns must be integral epoch-like numerics (the
    engine keeps event time as epoch-nanos longs end to end; see
    model.read_table). ``bin_width`` is in the same unit; pick it near
    the typical interval length so each interval explodes to ~2 bins.
    ``equi_keys`` are additional exact-match columns present on both
    sides (e.g. a tenant or type key) that join ahead of the range
    predicate. Only inner/left_semi make sense here; outer variants
    would need unmatched-row recovery and are rejected.
    """
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(f"range_join_binned supports inner/left_semi, got {how!r}")
    if "_bin" in facts.columns or "_bin" in dims.columns:
        raise ValueError("'_bin' column name is reserved by range_join_binned")

    w = F.lit(int(bin_width))
    fb = facts.withColumn("_bin", F.floor(F.col(ts_col) / w).cast("bigint"))
    # Half-open interval: the last covered bin is floor((end-1)/W).
    db = dims.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("bigint"),
                F.floor((F.col(end_col) - F.lit(1)) / w).cast("bigint"),
            )
        ),
    )
    on = ["_bin", *equi_keys]
    exact = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    if how in ("left_semi", "semi"):
        # Semi needs the range predicate inside the join condition; express
        # it as inner + drop dim columns + distinct on fact identity is
        # wrong in general (duplicates facts matching 2+ intervals), so
        # join with the full condition directly.
        cond = exact
        for k in on:
            cond = cond & (fb[k] == db[k])
        return fb.join(db, cond, "left_semi").drop("_bin")
    return fb.join(db, on, "inner").filter(exact).drop("_bin")
