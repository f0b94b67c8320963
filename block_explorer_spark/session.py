"""SparkSession construction with scale-aware defaults.

The reference achieves parallelism with fixed worker pools (200 loader
workers, 100 backfill retrievers — configuration/configuration.go:50-126).
In Spark, parallelism is task-level; what we tune instead is shuffle
partitioning, AQE, and broadcast thresholds so the same plans hold from
local[32] test runs up to a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen to keep identical logical plans efficient both at
#: local test scale and at cluster scale:
#:  - AQE on: runtime coalescing of shuffle partitions, skew-join
#:    splitting, and dynamic broadcast-join demotion/promotion mean we
#:    do not hand-tune per-SF partition counts.
#:  - Arrow on: every pandas UDF / applyInPandas crosses the JVM<->Python
#:    boundary in columnar batches instead of pickled rows.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # The driver's events table stores TIMESTAMP(NANOS) which Spark's
    # vectorized parquet reader rejects; read as long (ns since epoch)
    # and convert at the column level where needed.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": "32",
    # Pre-coalesce shuffle width: AQE picks the FINAL partition count
    # by target size, so small gate/bench shuffles still collapse to a
    # handful of partitions, while the 5M-doc banding/CC shuffles start
    # from 256 instead of 32 — the round-4 x1000 cells spilled 106/74 GB
    # precisely because 1/32 of a corpus-wide shuffle had to fit in one
    # task's memory (re-measured in SCALE_CURVE.json after this change).
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def builder(app_name: str = "block-explorer-spark", **overrides: str) -> SparkSession.Builder:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    b = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_BASE_CONF)
    conf.update({k: str(v) for k, v in overrides.items()})
    for k, v in conf.items():
        b = b.config(k, v)
    return b


def get_spark(app_name: str = "block-explorer-spark", **overrides: str) -> SparkSession:
    """Return (or create) a session with the engine's tuned defaults."""
    return builder(app_name, **overrides).getOrCreate()
