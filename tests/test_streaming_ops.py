"""Streaming operator tests: sliding windows, stream-stream interval
join, watermark-bounded dedup — each driven through a file source in
micro-batches with a memory sink (same harness as
test_stateful_streaming)."""

from __future__ import annotations

import datetime as dt
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from block_explorer_spark.streaming import stateful as S

EV_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


def _write(spark, path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_sliding_window_counts(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write(
        spark,
        src,
        [
            (_ts(0, 30), "click", 1, 1.0),
            (_ts(4, 0), "click", 2, 1.0),
            (_ts(7, 0), "click", 3, 1.0),
            # late-horizon closer: pushes the watermark past all windows above
            (_ts(40, 0), "click", 9, 1.0),
        ],
    )
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    out = S.sliding_window_counts(stream, window="10 minutes", slide="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sliding")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r["window_start"].hour, r["window_start"].minute): r["n_events"]
            for r in spark.sql("SELECT * FROM sliding").collect()
            if (r["window_start"].hour, r["window_start"].minute) < (12, 20)
        }
        # events at 12:00:30, 12:04, 12:07 → window [11:55,12:05): 2,
        # [12:00,12:10): 3, [12:05,12:15): 1
        assert rows[(11, 55)] == 2
        assert rows[(12, 0)] == 3
        assert rows[(12, 5)] == 1
    finally:
        q.stop()


def test_interval_join_stream_attribution(spark, tmp_path):
    clicks_p, buys_p = str(tmp_path / "clicks"), str(tmp_path / "buys")
    ckpt = str(tmp_path / "ckpt")
    C = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("l_ts", T.TimestampType())]
    )
    B = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("r_ts", T.TimestampType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(1)), (3, _ts(2))], C
    ).coalesce(1).write.mode("append").parquet(clicks_p)
    spark.createDataFrame(
        [
            (1, _ts(5), 10.0),  # within 10 min of user 1's click -> joins
            (2, _ts(20), 20.0),  # 19 min later -> outside window
            (4, _ts(3), 30.0),  # no matching click
        ],
        B,
    ).coalesce(1).write.mode("append").parquet(buys_p)

    clicks = spark.readStream.schema(C).parquet(clicks_p)
    buys = spark.readStream.schema(B).parquet(buys_p)
    joined = S.interval_join_stream(clicks, buys, "user_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT user_id, amount FROM attrib").collect()
        assert [(r["user_id"], r["amount"]) for r in rows] == [(1, 10.0)]
    finally:
        q.stop()


def test_dedup_stream_replayed_batch(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    # batch 1: two events
    _write(spark, src, [(_ts(0), "click", 1, 1.0), (_ts(1), "click", 2, 1.0)])
    stream = spark.readStream.schema(EV_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    out = S.dedup_stream(stream, ["user_id", "ts"], watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM dedup").count() == 2
        # batch 2 replays user 1's event (at-least-once source) + one new
        time.sleep(1.1)
        _write(spark, src, [(_ts(0), "click", 1, 1.0), (_ts(2), "click", 3, 1.0)])
        q.processAllAvailable()
        got = sorted(r["user_id"] for r in spark.sql("SELECT * FROM dedup").collect())
        assert got == [1, 2, 3]  # replay suppressed, new event kept
    finally:
        q.stop()


@pytest.mark.slow
def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Unmatched clicks emit null-padded ONLY after the watermark
    proves no future purchase can match (the 'never converted'
    attribution shape)."""
    clicks_p, buys_p = str(tmp_path / "clicks"), str(tmp_path / "buys")
    ckpt = str(tmp_path / "ckpt")
    C = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("l_ts", T.TimestampType())]
    )
    B = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("r_ts", T.TimestampType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    # user 1 converts; user 2 never does
    spark.createDataFrame([(1, _ts(0)), (2, _ts(0))], C).coalesce(1).write.mode(
        "append"
    ).parquet(clicks_p)
    spark.createDataFrame([(1, _ts(5), 10.0)], B).coalesce(1).write.mode("append").parquet(buys_p)

    clicks = spark.readStream.schema(C).parquet(clicks_p)
    buys = spark.readStream.schema(B).parquet(buys_p)
    joined = S.interval_join_stream(clicks, buys, "user_id", how="left_outer")
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_outer")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["user_id"]: r["amount"] for r in spark.sql("SELECT * FROM attrib_outer").collect()}
        assert got.get(1) == 10.0  # matched pair emits promptly
        assert 2 not in got  # negative can't emit yet: future match still possible

        # push both watermarks far past user 2's join window
        time.sleep(1.1)
        spark.createDataFrame([(9, dt.datetime(2024, 1, 1, 14, 0))], C).coalesce(1).write.mode(
            "append"
        ).parquet(clicks_p)
        spark.createDataFrame(
            [(9, dt.datetime(2024, 1, 1, 14, 1), 1.0)], B
        ).coalesce(1).write.mode("append").parquet(buys_p)
        q.processAllAvailable()
        q.processAllAvailable()  # state-cleanup emission lands a batch later
        got = {r["user_id"]: r["amount"] for r in spark.sql("SELECT * FROM attrib_outer").collect()}
        assert got.get(2, "missing") is None  # null-padded negative emitted
    finally:
        q.stop()
