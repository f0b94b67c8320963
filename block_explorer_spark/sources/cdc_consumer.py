"""Canonical change-feed consumer: an incremental per-document
token-stats mirror driven by `corpus_store.changes_since`.

Round 6 built the CDC feeds and pinned them row-level; this module is
the missing half — a real downstream job that PROVES the feed's
contract end to end (round-7 item 6):

  - cost ∝ delta: each `sync` reads only the commits in
    (checkpoint, head], never the corpus (scripts/store_bench.py
    --cdc-mirror measures it flat as the corpus grows);
  - convergence: after any mix of ingest / delete_where /
    substr_sweep rounds, the mirror equals the batch recompute over
    the current snapshot (pinned by test_pipeline_e2e);
  - loud retention failure: when `truncate_change_log` or
    `manifest.vacuum` retires the consumer's checkpoint, `sync`
    surfaces the manifest layer's retention error instead of silently
    skipping rows — the consumer must `resync` from a snapshot read.

The mirror state is versioned: each sync writes a NEW state directory
and then atomically renames the checkpoint json (since_version +
state pointer in one file). A crash between the two leaves the old
checkpoint pointing at the old state, and the replayed sync rebuilds
the same new state — exactly-once at the mirror without coordination,
the Structured-Streaming offsets-in-commit-log recipe in miniature.

Spark-first shape: applying a delta is one anti-join (retire changed
doc_ids) + one union (insert/update rows) — no row-at-a-time state,
no driver loop over documents.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from block_explorer_spark.sources import corpus_store as cs
from block_explorer_spark.sources import manifest as Mf

STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _ckpt_path(state_dir: str) -> str:
    return os.path.join(state_dir, "checkpoint.json")


def _read_ckpt(state_dir: str) -> dict:
    try:
        with open(_ckpt_path(state_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"since_version": 0, "state": None}


def _doc_stats(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def read_mirror(spark: SparkSession, state_dir: str) -> DataFrame:
    ck = _read_ckpt(state_dir)
    if not ck["state"]:
        return spark.createDataFrame([], STATS_SCHEMA)
    return spark.read.schema(STATS_SCHEMA).parquet(
        os.path.join(state_dir, ck["state"])
    )


def _publish(
    spark: SparkSession, state_dir: str, stats: DataFrame, version: int,
    prev: dict,
) -> None:
    """Write the new state dir, then swap the checkpoint atomically
    (os.replace). Old state dirs are removed AFTER the swap — a crash
    anywhere leaves a checkpoint whose state dir exists."""
    new_state = f"state_v{version}"
    out = os.path.join(state_dir, new_state)
    shutil.rmtree(out, ignore_errors=True)  # crashed prior attempt
    stats.write.parquet(out)
    tmp = _ckpt_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"since_version": version, "state": new_state}, f)
    os.replace(tmp, _ckpt_path(state_dir))
    if prev["state"] and prev["state"] != new_state:
        shutil.rmtree(os.path.join(state_dir, prev["state"]), ignore_errors=True)


def sync(spark: SparkSession, corpus_base: str, state_dir: str) -> dict:
    """One incremental catch-up. Returns {"n_changes", "version"}.

    Raises the manifest layer's retention RuntimeError when the feed
    no longer reaches back to the checkpoint (vacuumed /truncated) —
    call `resync` to rebuild from the current snapshot."""
    os.makedirs(state_dir, exist_ok=True)
    ck = _read_ckpt(state_dir)
    head = Mf.current_version(corpus_base)
    if head == ck["since_version"]:
        return {"n_changes": 0, "version": head}
    feed = cs.changes_since(
        spark, corpus_base, ck["since_version"], until_version=head
    ).localCheckpoint()  # the retention check fires here, loudly
    n_changes = feed.count()
    if not n_changes:
        # versions moved but no row-level change (maintenance commits)
        _publish(spark, state_dir, read_mirror(spark, state_dir), head, ck)
        return {"n_changes": 0, "version": head}
    # last op per doc wins across the window (insert then delete in
    # range -> gone; delete then re-insert -> present)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("version").desc())
    last = (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = _doc_stats(last.filter(F.col("op") != "delete"))
    changed_ids = last.select("doc_id")
    merged = (
        read_mirror(spark, state_dir)
        .join(changed_ids, "doc_id", "left_anti")
        .unionByName(upserts)
    )
    _publish(spark, state_dir, merged, head, ck)
    return {"n_changes": n_changes, "version": head}


def resync(spark: SparkSession, corpus_base: str, state_dir: str) -> dict:
    """Full rebuild from the current snapshot — the recovery move when
    `sync` raises the retention error. One corpus scan, then the
    checkpoint resumes incrementally from the rebuilt version."""
    os.makedirs(state_dir, exist_ok=True)
    ck = _read_ckpt(state_dir)
    head = Mf.current_version(corpus_base)
    stats = _doc_stats(cs.read_corpus(spark, corpus_base))
    _publish(spark, state_dir, stats, head, ck)
    return {"n_docs": read_mirror(spark, state_dir).count(), "version": head}
