"""Range-join semantics: containment inclusivity, multiplicity,
bucket-boundary correctness, left-join NULL padding."""

from __future__ import annotations

import pytest

from block_explorer_spark.operators.ranges import range_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 25), (4, 99)], ["pid", "ts"]
    )
    intervals = spark.createDataFrame(
        [(100, 0, 10), (200, 10, 20), (300, 24, 26)], ["iid", "lo", "hi"]
    )
    return points, intervals


def test_inner_containment_inclusive(frames):
    points, intervals = frames
    out = range_join(points, intervals, "ts", "lo", "hi", bucket=7)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # ts=10 is in BOTH [0,10] and [10,20] (inclusive ends)
    assert got == [(1, 100), (2, 100), (2, 200), (3, 300)]


def test_bucket_size_does_not_change_results(frames):
    points, intervals = frames
    a = sorted((r["pid"], r["iid"]) for r in range_join(points, intervals, "ts", "lo", "hi", 3).collect())
    b = sorted((r["pid"], r["iid"]) for r in range_join(points, intervals, "ts", "lo", "hi", 50).collect())
    assert a == b


def test_left_join_pads_unmatched(frames):
    points, intervals = frames
    out = range_join(points, intervals, "ts", "lo", "hi", bucket=7, how="left")
    rows = {r["pid"]: r for r in out.collect() if r["iid"] is None}
    assert set(rows) == {4}  # ts=99 matches nothing
    assert rows[4]["lo"] is None and rows[4]["hi"] is None
    # matched rows unchanged vs inner
    inner_n = range_join(points, intervals, "ts", "lo", "hi", bucket=7).count()
    assert out.count() == inner_n + 1


def test_invalid_how(frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        range_join(points, intervals, "ts", "lo", "hi", 7, how="full")
