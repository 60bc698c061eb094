"""Adaptive Query Execution behavior: the runtime re-planning the 100 TB
story leans on is demonstrated here against the REAL executed plans —
AQE only reveals its decisions after execution (isFinalPlan=true), which
is why these properties live in their own tests rather than the static
assertions of test_plans.py."""

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    saved = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in saved.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _final_plan(df):
    df.collect()  # AQE finalizes only on execution of THIS handle
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partition(spark):
    # one key owns half the left side: with thresholds scaled to fixture
    # bytes, AQE must mark the sort-merge join skew=true and split the
    # hot partition's reads — the runtime answer to the same problem
    # plans/layout.salted_join solves statically (salting rewrites the
    # QUERY; AQE rewrites the SCHEDULE — both appear in this repo
    # deliberately, and this test pins that the runtime path engages)
    with _confs(
        spark,
        **{
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "65536",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "16384",
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2",
            "spark__sql__shuffle__partitions": "8",
        },
    ):
        left = spark.range(400_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        plan = _final_plan(left.join(right, "k"))
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan
    assert "skewed" in plan.split("AQEShuffleRead")[1][:40]


def test_aqe_coalesces_small_shuffle_partitions(spark):
    # 32 configured shuffle partitions over a tiny aggregate: the final
    # plan must read a COALESCED shuffle — at scale this is what keeps
    # reducer counts proportional to data, not to a static config
    with _confs(spark, spark__sql__shuffle__partitions="32"):
        df = (
            spark.range(10_000)
            .select((F.col("id") % 7).alias("k"))
            .groupBy("k")
            .count()
        )
        plan = _final_plan(df)
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead coalesced" in plan
