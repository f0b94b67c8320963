"""Skew mitigation: salted joins and salted heavy aggregations.

AQE's skew-join splitting (enabled in session.py) handles most
runtime skew by splitting oversized partitions, but two shapes still
need explicit salting at 100 TB:

  * a shuffle join where ONE key holds a large fraction of both sides
    (AQE can split the partition, but every split still collides on
    the same reduce key);
  * non-algebraic aggregations (collect_list/set) over a hot key,
    where map-side partial aggregation can't shrink the hot group.

salted_join replicates the small(er) side SALT times and scatters the
big side uniformly across the salt space — same rows out, skew spread
across SALT reducers, at the cost of replicating the right side.
salted_collect_set does two-phase set collection (per-salt partial
sets, then merged) so no single task materializes the hot group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `on` with the left side scattered over `salt`
    buckets and the right side replicated once per bucket.

    Output equals left.join(right, on, how) exactly (row multiplicity
    included); use when the join key is skewed and the right side is
    too big to broadcast but small enough to replicate `salt` times.
    Supported how: inner / left (the replicated side must be the
    lookup side for outer semantics to hold).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    lt = left.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    rt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lt.join(rt, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_collect_set(
    df: DataFrame, key: str, value: str, salt: int = 16, out_col: str = "values"
) -> DataFrame:
    """collect_set(value) per key, two-phase: per-(key, salt) partial
    sets first, then flatten+distinct at the key level. No single task
    ever holds a hot key's full row stream — only its (smaller) set.
    """
    partial = (
        df.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.array_distinct(F.flatten(F.collect_list("__part"))).alias(out_col))
    )
