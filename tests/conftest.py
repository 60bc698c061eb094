import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Export the protobuf shim path BEFORE any SparkSession exists: the JVM
# (and the Python workers it spawns) inherit PYTHONPATH at launch time,
# and transformWithState's worker-side protocol needs google.protobuf.
from mammoth_spark.protobuf_shim import ensure_protobuf  # noqa: E402

ensure_protobuf()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mammoth_spark.plans import tuned_builder

    s = (
        tuned_builder("mammoth_spark_tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
