"""Bucketed-layout co-located join: the physical design SCALE.md
prescribes for the big⋈big shapes (records ⋈ pulses on pulse_number
at 100 TB). Writing both sides bucketed+sorted on the join key lets
Spark plan the join with ZERO exchanges — each task merges its
matching bucket pair straight off disk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("y")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    left.write.format("parquet").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    right.write.format("parquet").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")
    try:
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout co-locates both sides
        assert joined.count() == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_unbucketed_join_shuffles_both_sides(spark, no_broadcast):
    """Control: the same join without bucketing pays two exchanges —
    the cost the layout above removes."""
    left = spark.range(0, 10_000).select(F.col("id").alias("k"))
    right = spark.range(0, 10_000).select(F.col("id").alias("k"))
    plan = left.join(right, "k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") >= 2
