"""Adjacent-row sequence operators (SURVEY §2.5 W2).

The reference walks a sorted pulse page imperatively and patches
prev/next links with -1 sentinels where the chain breaks
(etl/storage/storage.go:326-357). Declaratively that is lag/lead over
an ordered window plus F.when sentinel logic — one shuffle-free pass
when the input is a single page, and a range-partitioned window sort
at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

#: API sentinel for "neighbor unknown/missing" (api/mappers.go:68-73).
MISSING = -1


def chain_repair(
    df: DataFrame,
    key: str = "pulse_number",
    prev_link: str = "prev_pulse_number",
    next_link: str = "next_pulse_number",
    window: WindowSpec | None = None,
) -> DataFrame:
    """W2: repair prev/next links against the adjacent rows.

    The reference's walk is keyed on PREV links only
    (storage.go:344-350): for each adjacent pair (lower, higher) in
    key order, if higher.prev == lower.key the chain holds and
    lower.next is OVERWRITTEN with higher.key (the stored next may
    name a pulse that never happened — irregular cadence); otherwise
    both sides of the broken edge go to MISSING. Declaratively:
    prev := MISSING unless it matches the lag key; next := the lead
    key iff the lead row's prev link points back here, else MISSING.
    First/last rows get MISSING here — callers that need true edge
    links consult the full table (see plans.queries.get_pulses) or
    prefetch one row each side.

    reference: etl/storage/storage.go:326-357 (vectorized walk),
    360-379 (single-row variant).
    """
    w = window if window is not None else Window.orderBy(key)
    lag_key = F.lag(key).over(w)
    lead_key = F.lead(key).over(w)
    lead_prev = F.lead(prev_link).over(w)
    return df.withColumn(
        prev_link,
        F.when(lag_key.isNull() | (lag_key != F.col(prev_link)), F.lit(MISSING)).otherwise(
            F.col(prev_link)
        ),
    ).withColumn(
        next_link,
        F.when(lead_prev.isNotNull() & (lead_prev == F.col(key)), lead_key).otherwise(
            F.lit(MISSING)
        ),
    )


def gap_flags(df: DataFrame, key: str, step: int, window: WindowSpec | None = None) -> DataFrame:
    """Mark rows whose predecessor in key order is not exactly `step` behind.

    Generalization of the reference's sequentiality check (D5): a row is
    sequential iff every earlier key is present with a fixed stride.
    Adds `has_gap` (bool) and `prev_key` columns.
    """
    w = window if window is not None else Window.orderBy(key)
    prev_key = F.lag(key).over(w)
    return df.withColumn("prev_key", prev_key).withColumn(
        "has_gap", prev_key.isNotNull() & (prev_key != F.col(key) - step)
    )
