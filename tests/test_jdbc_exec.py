"""Execute the partitioned JDBC snapshot path against a real database.

Spark ships embedded Apache Derby on its classpath (it backs the Hive
metastore), so `jdbc:derby:<dir>;create=true` gives a genuine JDBC
round-trip — write through Spark's JDBC sink, read back through
``read_snapshot_jdbc`` — without any external service or extra jars.
This closes the round-1 gap: the option map was unit-tested but the
read path never executed against a live driver."""

import os

import pytest

from mammoth_spark.sources.jdbc import read_snapshot_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture
def derby_url(tmp_path):
    # Derby writes derby.log to user.dir; point it into tmp
    os.environ.setdefault("DERBY_OPTS", "")
    return f"jdbc:derby:{tmp_path}/snapdb;create=true"


def test_partitioned_jdbc_read_executes(spark, tmp_path, derby_url):
    src = spark.range(0, 1000).selectExpr(
        "id AS pk", "CAST(id % 7 AS INT) AS bucket", "concat('row-', id) AS payload"
    )
    src.write.format("jdbc").option("url", derby_url).option("dbtable", "snap").option(
        "driver", DERBY_DRIVER
    ).mode("overwrite").save()

    back = read_snapshot_jdbc(
        spark,
        derby_url,
        table="snap",
        partition_column="pk",
        lower_bound=0,
        upper_bound=999,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    # the partitioned read must actually fan out into >= 2 range slices
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    got = {r["pk"]: r["payload"] for r in back.collect()}
    assert got[0] == "row-0" and got[999] == "row-999"
    # every partition contributes rows (ranges are non-overlapping, dense pk)
    per_part = back.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert len(per_part) == 4 and all(n > 0 for n in per_part)


def test_jdbc_predicate_pushdown_executes(spark, derby_url):
    # the filter must reach the database as a WHERE clause (PushedFilters
    # in the JDBC scan), not a post-scan Spark filter over the full table
    src = spark.range(0, 100).selectExpr("id AS pk", "CAST(id % 2 AS INT) AS par")
    src.write.format("jdbc").option("url", derby_url).option("dbtable", "filt").option(
        "driver", DERBY_DRIVER
    ).mode("overwrite").save()
    back = read_snapshot_jdbc(
        spark, derby_url, "filt", "pk", 0, 99, num_partitions=2, driver=DERBY_DRIVER
    ).filter("par = 1")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "par" in plan.split("PushedFilters")[1][:120]
    assert back.count() == 50
