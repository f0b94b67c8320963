"""As-of join semantics: backward/forward, ties, no-match NULLs,
per-key isolation. Cross-engine parity with DuckDB's native ASOF JOIN
is pinned by the q36 oracle check; these fixtures pin the edge rules."""

from __future__ import annotations

import pytest

from block_explorer_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "l1"),
            (1, 200, "l2"),
            (1, 50, "l0"),   # before any right row
            (2, 150, "l3"),  # other key
        ],
        ["k", "ts", "lval"],
    )
    right = spark.createDataFrame(
        [
            (1, 100, 1.0),   # tie with l1
            (1, 180, 2.0),
            (2, 160, 9.0),   # after l3
        ],
        ["k", "ts", "rval"],
    )
    return left, right


def test_backward_matches_latest_at_or_before(frames):
    left, right = frames
    out = {r["lval"]: r for r in asof_join(left, right, on="k").collect()}
    assert out["l1"]["rval_right"] == 1.0  # tie matches
    assert out["l1"]["ts_right"] == 100
    assert out["l2"]["rval_right"] == 2.0  # latest of {100, 180}
    assert out["l0"]["rval_right"] is None  # nothing at/before 50
    assert out["l3"]["rval_right"] is None  # key 2's right row is later


def test_forward_matches_earliest_at_or_after(frames):
    left, right = frames
    out = {r["lval"]: r for r in asof_join(left, right, on="k", direction="forward").collect()}
    assert out["l1"]["rval_right"] == 1.0   # tie matches forward too
    assert out["l0"]["rval_right"] == 1.0   # earliest right (100)
    assert out["l2"]["rval_right"] is None  # nothing at/after 200
    assert out["l3"]["rval_right"] == 9.0


def test_left_rows_and_columns_preserved(frames):
    left, right = frames
    out = asof_join(left, right, on="k")
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns)


def test_invalid_direction(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", direction="nearest")
