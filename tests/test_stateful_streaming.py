"""Stateful streaming: per-pulse completeness register + native
session windows.

The completeness test drives two micro-batches through a file source
(maxFilesPerTrigger=1): batch 1 delivers half the jet tree (no
emission), batch 2 closes the trie (exactly one emission) — the
incremental-state behavior the reference's jetDropRegister implements
with a mutexed map (etl/controller/controller.go:124-132).
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from block_explorer_spark.streaming import stateful as S

DROPS_SCHEMA = T.StructType(
    [
        T.StructField("pulse_number", T.LongType(), False),
        T.StructField("jet_id", T.StringType(), False),
    ]
)


def _write_batch(spark, path: str, rows: list[tuple[int, str]]) -> None:
    spark.createDataFrame(rows, DROPS_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_completeness_tracker_incremental(spark, tmp_path):
    src = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: pulse 10 gets jets {0, 10} — trie NOT covered (11 missing)
    _write_batch(spark, src, [(10, "0"), (10, "10")])

    stream = spark.readStream.schema(DROPS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    out = S.completeness_tracker(stream, timeout_ms=None)
    q = (
        out.writeStream.format("memory")
        .queryName("completeness")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM completeness").count() == 0

        # batch 2: jet 11 arrives -> {0,10,11} covers the trie; pulse 11
        # starts but stays incomplete
        time.sleep(1.1)  # distinct file mtime so batches stay ordered
        _write_batch(spark, src, [(10, "11"), (11, "0")])
        q.processAllAvailable()
        rows = {r["pulse_number"]: r for r in spark.sql("SELECT * FROM completeness").collect()}
        assert set(rows) == {10}
        assert rows[10]["is_complete"] is True
        assert rows[10]["n_jet_drops"] == 3

        # batch 3: more drops for pulse 10 must NOT re-emit (emitted flag)
        time.sleep(1.1)
        _write_batch(spark, src, [(10, "0")])
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM completeness WHERE pulse_number = 10").count() == 1
    finally:
        q.stop()


def test_completeness_tracker_root_jet(spark, tmp_path):
    src = str(tmp_path / "drops2")
    ckpt = str(tmp_path / "ckpt2")
    # the root jet alone covers everything
    _write_batch(spark, src, [(20, "")])
    stream = spark.readStream.schema(DROPS_SCHEMA).parquet(src)
    q = (
        S.completeness_tracker(stream, timeout_ms=None)
        .writeStream.format("memory")
        .queryName("completeness_root")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM completeness_root").collect()
        assert len(rows) == 1
        assert rows[0]["pulse_number"] == 20 and rows[0]["is_complete"] is True
    finally:
        q.stop()


def test_sessionize_stream_matches_batch_gap_logic(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt3")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    base = "2024-01-01 10:{m:02d}:00"
    rows = [
        # user 1: two sessions split by a >30 min gap
        (1, base.format(m=0)),
        (1, base.format(m=10)),
        (1, base.format(m=55)),
        # user 2: one session
        (2, base.format(m=5)),
    ]
    df = spark.createDataFrame(
        [(u, t) for u, t in rows], ["user_id", "ts_str"]
    ).select("user_id", F.to_timestamp("ts_str").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        S.sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT user_id, session_events FROM sessions ORDER BY user_id, window_start"
        ).collect()
        assert [(r["user_id"], r["session_events"]) for r in got] == [(1, 2), (1, 1), (2, 1)]
    finally:
        q.stop()


def test_windowed_counts_late_data(spark, tmp_path):
    """Append-mode tumbling windows: each window emits once when the
    watermark passes it; events older than the watermark are dropped."""
    src = str(tmp_path / "wevents")
    ckpt = str(tmp_path / "ckpt4")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )

    def write(rows):
        df = spark.createDataFrame(
            [(k, t, v) for k, t, v in rows], ["event_type", "ts_str", "value"]
        ).select("event_type", F.to_timestamp("ts_str").alias("ts"), "value")
        df.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtime keeps file-source batch order

    # batch 1: two events in the 10:00 window
    write([("click", "2024-01-01 10:00:05", 1.0), ("click", "2024-01-01 10:00:25", 2.0)])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        S.windowed_counts(stream, window="1 minute", watermark="2 minutes")
        .writeStream.format("memory")
        .queryName("windowed")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: event at 10:10 -> watermark moves to 10:08, sealing
        # and emitting the 10:00 window
        write([("click", "2024-01-01 10:10:00", 5.0)])
        q.processAllAvailable()
        rows = {
            str(r["window_start"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM windowed").collect()
        }
        assert rows.get("2024-01-01 10:00:00") == (2, 3.0)

        # batch 3: a LATE event for the sealed 10:00 window (behind the
        # 10:08 watermark) must be dropped, not re-emitted
        write([("click", "2024-01-01 10:00:40", 100.0)])
        # batch 4: advance watermark past the 10:10 window to flush it
        write([("click", "2024-01-01 10:20:00", 7.0)])
        q.processAllAvailable()
        rows = {
            str(r["window_start"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM windowed").collect()
        }
        # 10:00 window unchanged (late event dropped), emitted exactly once
        assert rows["2024-01-01 10:00:00"] == (2, 3.0)
        assert rows["2024-01-01 10:10:00"] == (1, 5.0)
    finally:
        q.stop()
