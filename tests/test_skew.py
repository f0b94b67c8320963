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
