"""Aggregations (SURVEY §2.4, A2-A6) — derived, not mutated.

The reference mutates denormalized counters inside the load
transaction (etl/storage/storage.go:56-60). In Spark, counters are
aggregate views recomputed from the fact tables: map-side partial
aggregation makes the groupBy cheap, and the result is always
consistent with the data (no drift on partial failure/replay).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pulse_counters(jet_drops: DataFrame) -> DataFrame:
    """A2: per-pulse (jet_drop_amount, record_amount) from jet_drops.

    Replaces incremental `+= 1 / += len(records)` counter updates.
    """
    return jet_drops.groupBy("pulse_number").agg(
        F.count(F.lit(1)).alias("jet_drop_amount"),
        F.sum("record_amount").cast("long").alias("record_amount"),
    )


def drop_record_counts(records: DataFrame) -> DataFrame:
    """A3: records per (jet_id, pulse_number) = per jet drop."""
    return records.groupBy("jet_id", "pulse_number").agg(
        F.count(F.lit(1)).cast("int").alias("record_amount")
    )


def max_where(df: DataFrame, col: str, pred: Column | None = None):
    """A4 shape: MAX(col) over an optional filter; None on empty set.

    e.g. latest sequential pulse: max_where(pulses, "pulse_number",
    F.col("is_sequential")). reference: etl/storage/storage.go:430-443
    """
    if pred is not None:
        df = df.filter(pred)
    row = df.agg(F.max(col).alias("v")).collect()[0]
    return row["v"]


def min_where(df: DataFrame, col: str, pred: Column | None = None):
    """A5 shape: MIN(col) over an optional filter; None on empty set.

    e.g. next saved pulse after P. reference: etl/storage/storage.go:446-463
    """
    if pred is not None:
        df = df.filter(pred)
    row = df.agg(F.min(col).alias("v")).collect()[0]
    return row["v"]
