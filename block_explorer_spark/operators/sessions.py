"""Event sessionization — the batch analog of session windows.

A session = consecutive events of one user with gaps <= `gap`.
Classic two-window formulation: lag() flags session starts, a running
sum over the flags numbers sessions. One shuffle on user_id; both
windows share that partitioning so Catalyst plans a single exchange.
(Streaming variant: F.session_window in streaming/pipeline.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(df: DataFrame, ts_col: str):
    """Microsecond epoch expression for a timestamp, timestamp_ntz, or
    long-nanos column (the engine reads TIMESTAMP(NANOS) parquet as
    long — see session.py). The NTZ branch is naive-datetime math:
    session-timezone independent, identical to DuckDB's epoch_us()."""
    from pyspark.sql import types as T

    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.LongType):
        return F.floor(F.col(ts_col) / 1000)
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Add a `session_id` column: <user>-scoped session ordinal."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    mic = _micros(df, ts_col)
    prev_mic = F.lag(mic).over(w)
    is_start = F.when(
        prev_mic.isNull() | (mic - prev_mic > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return df.withColumn("session_id", F.sum(is_start).over(w))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session count + event count + max session length."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    per_session = s.groupBy(user_col, "session_id").agg(F.count(F.lit(1)).alias("session_events"))
    return per_session.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.sum("session_events").alias("n_events"),
        F.max("session_events").alias("max_session_events"),
    )
