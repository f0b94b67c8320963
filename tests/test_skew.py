"""Salted join / salted collect_set: result equivalence with the
unsalted formulations (the correctness contract that lets the planner
swap them in under skew)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from block_explorer_spark.operators.skew import salted_collect_set, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 1 is hot (80 rows), keys 2-9 have 2 rows each
    left = spark.createDataFrame(
        [(1, i) for i in range(80)] + [(k, i) for k in range(2, 10) for i in range(2)],
        ["k", "lv"],
    )
    right = spark.createDataFrame([(k, k * 100) for k in range(0, 8)], ["k", "rv"])
    return left, right


def test_salted_inner_join_equivalence(skewed):
    left, right = skewed
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = salted_join(left, right, "k").select("k", "lv", "rv")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_left_join_equivalence(skewed):
    left, right = skewed
    plain = left.join(right, "k", "left").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", how="left").select("k", "lv", "rv")
    assert sorted(plain.collect(), key=str) == sorted(salted.collect(), key=str)


def test_salted_join_rejects_right_outer(skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def _max_output_partition_rows(df) -> int:
    """Largest post-shuffle output partition — the reduce-side unit a
    single task materializes (wall-time at test scale is all noise;
    partition size is the deterministic quantity skew mitigation
    actually changes)."""
    rows = (
        df.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return max(r["c"] for r in rows)


@pytest.fixture()
def _shuffle_join_confs(spark):
    """Force a real shuffle join at test scale: no broadcast, no AQE
    coalescing/skew-rewrites, enough reducers for the salt to spread."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "32",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def test_salted_join_spreads_hot_key_measured(_shuffle_join_confs):
    """Measured-ratio pin (round-3 VERDICT #8): on a zipfian key
    distribution the salted plan's largest reduce partition is >=4x
    smaller than the unsalted one, and bounded, with identical rows."""
    spark = _shuffle_join_confs
    n = 40_000
    # key 0 holds 50% of rows; the rest spread over 199 cold keys
    left = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(199)) + 1)
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 200).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 100).alias("rv")
    )

    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salt=16)
    assert plain.count() == salted.count() == n

    max_plain = _max_output_partition_rows(plain)
    max_salted = _max_output_partition_rows(salted)
    # unsalted: the hot key's ~20k rows collide on ONE reducer
    assert max_plain >= 0.45 * n
    # salted: no task's partition exceeds n/8, and the spread is >=4x
    assert max_salted <= n / 8, f"salted max partition {max_salted} too large"
    ratio = max_plain / max_salted
    assert ratio >= 4, f"salting spread only {ratio:.1f}x ({max_plain}->{max_salted})"


def test_aqe_skew_join_split_kicks_in(spark):
    """AQE's own skew-join rewrite fires on the same zipfian shape when
    thresholds are scaled to the fixture (the 100 TB defaults, scaled
    down): the final adaptive plan marks the join skew=true."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 40_000
        left = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.hash("id"), F.lit(199)) + 1)
            .alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(0, 200).select(
            F.col("id").cast("int").alias("k"), (F.col("id") * 100).alias("rv")
        )
        joined = left.join(right.hint("merge"), "k")
        # collect() executes THIS DataFrame's queryExecution (count()
        # would compile a separate plan and leave this one unexecuted)
        assert len(joined.collect()) == n
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_salted_collect_set_equivalence(skewed):
    left, _ = skewed
    plain = {
        r["k"]: sorted(r["values"])
        for r in left.groupBy("k").agg(F.collect_set("lv").alias("values")).collect()
    }
    salted = {
        r["k"]: sorted(r["values"]) for r in salted_collect_set(left, "k", "lv").collect()
    }
    assert plain == salted
