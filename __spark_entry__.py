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

# transformWithState's state-server workers resolve ``google.protobuf``
# and ``mammoth_spark`` from the PYTHONPATH the JVM was launched with
# (they ignore session addPyFile — see mammoth_spark/protobuf_shim.py).
# Calling ensure_protobuf() at import time is idempotent env-plumbing:
# if the driver imports this module before creating its SparkSession,
# the exported streaming_tws_totals runs; if the driver's JVM pre-exists
# this import, that one entry records an error and the other 49 are
# unaffected (each queries() entry is evaluated independently).
from mammoth_spark.protobuf_shim import ensure_protobuf  # noqa: E402

ensure_protobuf()

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
