"""One-pass table profiling (data-quality monitoring).

The ANALYZE-style statistics a pipeline health check reads: per
column — null count, distinct count, min/max — computed in a SINGLE
aggregate pass over the table (every statistic is a map-side-partial
aggregate, so the whole profile costs one scan + one 1-row shuffle,
regardless of column count). The long-format unpivot happens on the
1-row result, not the data.

At 100 TB: one scan is the floor for any profile; the trap to avoid
is one job per column (N scans) or a driver loop. COUNT(DISTINCT x)
for many columns expands to an expand-node plan; for wide tables
swap in approx_count_distinct (same code path, `exact=False`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Long-format profile: (column, n_null, n_distinct, min_repr,
    max_repr) — min/max rendered as strings so heterogeneous column
    types stack into one result."""
    cols = columns if columns is not None else df.columns
    aggs = []
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(
            (F.countDistinct(c) if exact else F.approx_count_distinct(c)).alias(
                f"__dist_{c}"
            )
        )
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    row = df.agg(*aggs)
    stacked = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_repr"),
                F.col(f"__max_{c}").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(stacked).alias("s")).select("s.*")
