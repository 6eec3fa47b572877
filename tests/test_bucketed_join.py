"""Bucketed tables: the co-located join. Writing both sides bucketed on the
join key lets the join read pre-partitioned data — NO exchange on either
side of the SortMergeJoin. At 100 TB this is THE technique for repeated
fact-fact joins (extracted ⋈ dedup-verdicts, extracted ⋈ quality-scores):
pay the partitioning once at write time, never again at read time."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    # session-default warehouse; tables dropped (incl. data) in teardown
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 5000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    spark.sql("DROP TABLE IF EXISTS bj_a")
    spark.sql("DROP TABLE IF EXISTS bj_b")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("bj_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("bj_b")
    yield spark.table("bj_a"), spark.table("bj_b")
    spark.sql("DROP TABLE IF EXISTS bj_a")
    spark.sql("DROP TABLE IF EXISTS bj_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # disable broadcast so the join strategy question is real
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ta.join(tb, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the whole point: bucket layout satisfies the join's distribution —
        # zero shuffles in the plan
        assert "Exchange" not in plan, plan
        assert j.count() == 2500
        got = j.agg(F.sum("va"), F.sum("vb")).first()
        assert got[0] == sum(2 * k for k in range(0, 5000, 2))
        assert got[1] == sum(3 * k for k in range(0, 5000, 2))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    # aggregation on the bucket key also rides the layout: no exchange
    plan = (ta.groupBy("k").agg(F.sum("va"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
