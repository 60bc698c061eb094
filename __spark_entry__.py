"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship CDC apply query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline operators); ``oracle_sql()`` provides the
DuckDB-equivalent SQL for each (tables region nation customer supplier
part orders lineitem events documents embeddings are pre-registered).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mammoth_spark.queries import QUERIES  # noqa: E402
from mammoth_spark.registry import driver_oracles, driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: CDC compact + merge-apply on /root/testdata/sf0.001."""
    return QUERIES["cdc_apply"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Exactly 50 entries, highest-information first: the round-1 driver
    # recorded only the first 50 registered queries (see registry.py).
    return driver_queries()


def oracle_sql() -> dict[str, str]:
    return driver_oracles()
