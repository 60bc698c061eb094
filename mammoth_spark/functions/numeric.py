"""Cross-engine-stable float rounding.

Spark's round() goes through BigDecimal HALF_UP on the decimal rendering;
DuckDB rounds the binary double — at exact .5e-6 boundaries they disagree
(observed: 0.7512625 -> 0.751262 vs 0.751263). floor(x * 1e6) / 1e6 is a
pure function of the binary double, so two engines computing the same
double always agree. All oracle-compared float outputs use this.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000


def round6(col: Column) -> Column:
    """Deterministic 6-decimal truncation: floor(x * 1e6) / 1e6."""
    return F.floor(col * SCALE) / SCALE


SQL_ROUND6 = "floor({x} * 1000000) / 1000000"


def sql_round6(x: str) -> str:
    return SQL_ROUND6.format(x=x)
