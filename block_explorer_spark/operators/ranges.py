"""Range (point-in-interval) join — bucketized equi-join formulation.

Spark has no native range join; the naive `a.ts BETWEEN b.lo AND b.hi`
theta join plans as BroadcastNestedLoopJoin (O(N·M) — dead at scale).
The standard fix: quantize time into buckets, explode each interval
across every bucket it overlaps, equi-join points to intervals on the
bucket (hash join, one shuffle each side), then filter the exact
containment predicate. Cost ~ points + sum(interval_span/bucket), and
the bucket size trades replication factor against join selectivity —
pick it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    lo <= point <= hi (inclusive both ends).

    `bucket` is the quantization width in the columns' own units.
    Intervals explode across floor(lo/bucket)..floor(hi/bucket); points
    map to floor(point/bucket); the equi-join on the bucket prunes to
    near-candidates and the exact predicate filters the rest.
    how='left' keeps pointless points with NULL interval columns.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"range_join supports inner/left joins, got {how!r}")
    pt = points.withColumn("__b", F.floor(F.col(point_col) / bucket))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket), F.floor(F.col(hi_col) / bucket)
            )
        ),
    )
    contained = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    if how == "inner":
        return pt.join(iv, on="__b").filter(contained).drop("__b")
    # left: inner-match first, then add back unmatched points
    matched = pt.join(iv, on="__b").filter(contained).drop("__b")
    iv_cols = [c for c in intervals.columns]
    unmatched = pt.drop("__b").join(
        matched.select(*points.columns), on=list(points.columns), how="left_anti"
    )
    for c in iv_cols:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return matched.unionByName(unmatched)
