"""Partitioned-parquet storage layout + idempotent upsert protocol.

The reference gets idempotency from PostgreSQL PK upserts inside one
transaction (S4/S5: etl/storage/storage.go:28-94). Plain parquet has
no MERGE, so the engine uses a partition-overwrite protocol:

  * every table is partitioned by `pulse_bucket` = pulse_number // N
    (N=1000 pulses ≈ 2.7h of chain ≈ one healthy parquet partition at
    production record rates; tune per deployment);
  * an upsert of rows touching buckets B rewrites exactly those bucket
    directories as merge(old rows not in batch, batch rows), keyed on
    the table's PK — `INSERT ... ON CONFLICT DO UPDATE` semantics with
    bucket granularity, via dynamic partition overwrite (only touched
    partitions replaced, never the table);
  * counters/flags are never mutated in place — they are derived
    (operators/aggregates.py) or recomputed into the pulses table by
    the control plane, so a crash between two table writes self-heals
    on the next idempotent pass (same keys → same rows).

At cluster scale each bucket rewrite is one task-parallel job over
the incoming batch's buckets; unrelated partitions are untouched, so
concurrent backfills of disjoint pulse ranges don't conflict.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import AnalysisException

from block_explorer_spark import schemas

PULSE_BUCKET_SIZE = 1000

#: PK (upsert identity) per table — reference: migrations/migrations.go:11-89.
TABLE_KEYS = {
    "pulses": ["pulse_number"],
    "jet_drops": ["pulse_number", "jet_id"],
    "records": ["reference"],
}

TABLE_SCHEMAS = {
    "pulses": schemas.PULSES,
    "jet_drops": schemas.JET_DROPS,
    "records": schemas.RECORDS,
}


def with_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "pulse_bucket", (F.col("pulse_number") / PULSE_BUCKET_SIZE).cast("long")
    )


def table_path(base: str, name: str) -> str:
    return os.path.join(base, name)


def read_table(
    spark: SparkSession,
    base: str,
    name: str,
    pulse_gte: int | None = None,
    pulse_lte: int | None = None,
    ignore_corrupt: bool = False,
) -> DataFrame:
    """Schema-pinned read; drops the physical bucket column.

    Pulse bounds, when given, are applied to BOTH `pulse_number` and
    the `pulse_bucket` partition column *before* the bucket column is
    dropped. The bucket predicate is what turns a pulse range into
    directory-level partition pruning (`PartitionFilters` in the plan)
    — a filter on `pulse_number` alone only skips row groups after
    every bucket directory has already been listed, which at 100 TB is
    the difference between touching one bucket and listing them all.
    Catalyst cannot derive bucket = pulse_number // N on its own
    (plain parquet has no generated-column metadata), so the read
    layer owns the equivalence. (Pinned by
    test_plan_quality::test_pulse_bounds_prune_partitions.)

    The read passes the pinned schema EXPLICITLY rather than letting
    Spark sample footers: under schema evolution (a newer engine adds
    a column to TABLE_SCHEMAS) buckets written before the upgrade
    simply null-fill the new column per file — deterministic,
    whichever file the footer sampler would have picked — and the
    inference listing is skipped entirely (at 100 TB, footer sampling
    is an extra S3 round per read). Pinned by
    test_write_path::test_schema_evolution_old_buckets_null_fill.

    ignore_corrupt=True opts this read into skipping undecodable files
    (the operational sweep mode after partial hardware loss); the
    default surfaces corruption loudly.
    """
    from pyspark.sql import types as T

    path = table_path(base, name)
    cols = [f.name for f in TABLE_SCHEMAS[name].fields]
    full = T.StructType(
        list(TABLE_SCHEMAS[name].fields) + [T.StructField("pulse_bucket", T.LongType())]
    )
    try:
        reader = spark.read.schema(full)
        if ignore_corrupt:
            reader = reader.option("ignoreCorruptFiles", "true")
        df = reader.parquet(path)  # absent path raises eagerly
    except AnalysisException:
        # Table not materialized yet (e.g. every drop of the first
        # batch failed validation, or a fresh warehouse): an absent
        # table IS an empty table — schemas are pinned, so serve the
        # typed empty relation instead of failing the read. The
        # reference gets this for free from CREATE TABLE migrations.
        return spark.createDataFrame([], TABLE_SCHEMAS[name])
    if pulse_gte is not None:
        df = df.filter(
            (F.col("pulse_bucket") >= pulse_gte // PULSE_BUCKET_SIZE)
            & (F.col("pulse_number") >= pulse_gte)
        )
    if pulse_lte is not None:
        df = df.filter(
            (F.col("pulse_bucket") <= pulse_lte // PULSE_BUCKET_SIZE)
            & (F.col("pulse_number") <= pulse_lte)
        )
    return df.select(*cols)


def init_table(spark: SparkSession, base: str, name: str) -> None:
    """Create an empty partitioned table if absent."""
    path = table_path(base, name)
    if os.path.exists(path):
        return
    empty = spark.createDataFrame([], TABLE_SCHEMAS[name])
    with_bucket(empty).write.partitionBy("pulse_bucket").mode("append").parquet(path)


def upsert(
    spark: SparkSession,
    base: str,
    name: str,
    batch: DataFrame,
    *,
    key_bucket_affinity: bool = True,
) -> None:
    """MERGE `batch` into the table keyed on TABLE_KEYS[name].

    whenMatched → replace with batch row (reference's ON CONFLICT DO
    UPDATE); whenNotMatched → insert. Implemented as: read only the
    buckets the batch touches, anti-join out rows whose key appears in
    the batch, union the batch, dynamic-partition-overwrite those
    buckets. Re-running the same batch is a no-op by construction.

    Key→bucket affinity: by default PK uniqueness is enforced within
    the buckets the batch touches, under the invariant that a key never
    changes its pulse_number (and hence bucket). The invariant holds
    for the reference's data — insolar record/jet-drop identity embeds
    the pulse number (record IDs carry their pulse in the leading
    bytes; jet_drops/pulses key ON pulse_number itself), so a
    re-delivered key always lands in its original bucket. Pass
    ``key_bucket_affinity=False`` when ingesting from a source that
    cannot guarantee this: the collision check then widens to a
    column-pruned key scan of the whole table and stale copies of
    batch keys in *other* buckets are rewritten out, matching the
    reference's global ON CONFLICT semantics (storage.go:28-94) at the
    cost of an O(table keys) scan per merge.
    """
    keys = TABLE_KEYS[name]
    path = table_path(base, name)
    batch = with_bucket(batch.dropDuplicates(keys))

    if not os.path.exists(path):
        batch.write.partitionBy("pulse_bucket").mode("append").parquet(path)
        return

    try:
        # Schema probe: a directory that exists but holds no parquet
        # (an earlier batch wrote 0 rows — e.g. every drop failed
        # validation) is an empty table; append is the whole merge.
        spark.read.parquet(path).schema
    except AnalysisException:
        batch.write.partitionBy("pulse_bucket").mode("append").parquet(path)
        return

    batch_keys = batch.select(*keys).distinct()
    buckets = [r.pulse_bucket for r in batch.select("pulse_bucket").distinct().collect()]

    if not key_bucket_affinity:
        # Column-pruned key scan over the full table: any bucket that
        # already holds one of the batch's keys joins the rewrite set,
        # so its stale copy is anti-joined away below.
        stale_buckets = [
            r.pulse_bucket
            for r in spark.read.parquet(path)
            .select(*keys, "pulse_bucket")
            .join(F.broadcast(batch_keys), on=keys, how="left_semi")
            .select("pulse_bucket")
            .distinct()
            .collect()
        ]
        buckets = sorted(set(buckets) | set(stale_buckets))

    existing = spark.read.parquet(path).filter(F.col("pulse_bucket").isin(buckets))

    # Fast path — the steady-state ingest case: if no batch key already
    # exists in the touched buckets (a column-pruned key scan + semi
    # join), plain append suffices and the old bucket data is never
    # rewritten. Cost O(batch), not O(bucket) — at 100 TB a bucket is
    # GB-scale while a micro-batch is KB-scale, so rewriting the bucket
    # per batch would dominate ingest. Replays/updates (key collision)
    # fall through to the merge-rewrite, preserving upsert semantics.
    collisions = (
        existing.select(*keys)
        .join(F.broadcast(batch_keys), on=keys, how="left_semi")
        .limit(1)
        .count()
    )
    if collisions == 0:
        batch.write.partitionBy("pulse_bucket").mode("append").parquet(path)
        return

    kept = existing.join(F.broadcast(batch_keys), on=keys, how="left_anti")
    merged = kept.select(*batch.columns).unionByName(batch)

    # Materialize the merge to a staging directory BEFORE overwriting:
    # the dynamic-partition-overwrite below must never lazily re-read
    # the very directories it is replacing (a crash mid-rewrite would
    # otherwise permanently lose the pre-existing rows of the touched
    # buckets). With staging, a crash before the final overwrite leaves
    # the table untouched; the remaining non-atomic window is Spark's
    # own per-partition commit protocol, and replaying the batch heals
    # it (same keys → same rows). The reference gets full atomicity
    # from a single Postgres txn (storage.go:28-94); bucket rewrites
    # here are idempotent-but-not-atomic, by design.
    staging = os.path.join(base, f".staging-{name}-{uuid.uuid4().hex}")
    try:
        merged.write.partitionBy("pulse_bucket").mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        (
            staged.write.partitionBy("pulse_bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )
        # Dynamic overwrite only replaces buckets present in the output:
        # a rewrite-set bucket whose every row was superseded (possible
        # only in the affinity=False path) would otherwise keep its
        # stale directory.
        written = {r.pulse_bucket for r in staged.select("pulse_bucket").distinct().collect()}
        for b in set(buckets) - written:
            shutil.rmtree(os.path.join(path, f"pulse_bucket={b}"), ignore_errors=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def save_jet_drop_data(
    spark: SparkSession,
    base: str,
    jet_drops: DataFrame,
    records: DataFrame,
) -> None:
    """S4: persist a batch of canonical jet drops + their records.

    Two idempotent MERGEs (drops keyed (pulse, jet), records keyed
    reference). The reference wraps these plus counter bumps in one
    Postgres txn (etl/storage/storage.go:28-82); here counters are
    derived so partial failure between the two writes self-heals on
    retry — same keys produce the same final state.
    """
    upsert(spark, base, "jet_drops", jet_drops)
    upsert(spark, base, "records", records)


def save_pulse(spark: SparkSession, base: str, pulses: DataFrame) -> None:
    """S5: upsert pulses keyed pulse_number."""
    upsert(spark, base, "pulses", pulses)


def set_pulse_flags(
    spark: SparkSession,
    base: str,
    pulse_numbers: list[int],
    complete: bool | None = None,
    sequential: bool | None = None,
) -> None:
    """S6: CompletePulse / SequencePulse — flag flips as a bucket merge.

    reference: etl/storage/storage.go:97-136 (single-row UPDATEs).
    """
    if not pulse_numbers:
        return
    current = read_table(
        spark, base, "pulses", pulse_gte=min(pulse_numbers), pulse_lte=max(pulse_numbers)
    ).filter(F.col("pulse_number").isin(pulse_numbers))
    if complete is not None:
        current = current.withColumn("is_complete", F.lit(complete))
    if sequential is not None:
        current = current.withColumn("is_sequential", F.lit(sequential))
    upsert(spark, base, "pulses", current)


def refresh_pulse_counters(spark: SparkSession, base: str) -> None:
    """A2 materialization: recompute per-pulse counters from jet_drops
    and merge into pulses (keeps read-side latency low without mutable
    increments; always consistent with the fact table)."""
    from block_explorer_spark.operators.aggregates import pulse_counters

    drops = read_table(spark, base, "jet_drops")
    pulses = read_table(spark, base, "pulses")
    counters = pulse_counters(drops)
    updated = (
        pulses.drop("jet_drop_amount", "record_amount")
        .join(counters, "pulse_number", "left_outer")
        .fillna(0, subset=["jet_drop_amount", "record_amount"])
        .select(*[f.name for f in schemas.PULSES.fields])
    )
    upsert(spark, base, "pulses", updated)


def delete_where(spark: SparkSession, base: str, name: str, predicate) -> int:
    """Targeted delete: remove rows matching `predicate`, rewriting
    ONLY the buckets that contain matches. Returns rows deleted.

    The retention / right-to-be-forgotten sweep a long-lived corpus
    warehouse needs: at 100 TB a delete must not touch the 99.9% of
    bucket directories with no matching rows. Same staging discipline
    as upsert (idempotent-but-not-atomic: replaying the same delete
    is a no-op); a bucket whose every row matches is removed outright.
    """
    path = table_path(base, name)
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return 0
    hit_buckets = [
        r.pulse_bucket
        for r in df.filter(predicate).select("pulse_bucket").distinct().collect()
    ]
    if not hit_buckets:
        return 0
    touched = df.filter(F.col("pulse_bucket").isin(hit_buckets))
    # Keep rows where the predicate is NOT TRUE. A bare ~predicate drops
    # NULL-predicate rows too (three-valued logic: ~NULL is NULL, and
    # filter discards NULL) — e.g. an equality test on a nullable column
    # would silently delete every NULL row in a hit bucket. Delete must
    # remove exactly the rows the match pass (filter(predicate)) saw.
    kept = touched.filter(~F.coalesce(predicate, F.lit(False)))
    n_deleted = touched.count() - kept.count()

    staging = os.path.join(base, f".staging-{name}-{uuid.uuid4().hex}")
    try:
        kept.write.partitionBy("pulse_bucket").mode("overwrite").parquet(staging)
        try:
            staged = spark.read.parquet(staging)
            written = {
                r.pulse_bucket for r in staged.select("pulse_bucket").distinct().collect()
            }
            (
                staged.write.partitionBy("pulse_bucket")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(path)
            )
        except AnalysisException:
            written = set()  # every row of every hit bucket deleted
        for b in set(hit_buckets) - written:
            shutil.rmtree(os.path.join(path, f"pulse_bucket={b}"), ignore_errors=True)
        # rmtree bypasses Spark's write path: evict the stale file
        # listing or a later read of this table FileNotFounds
        spark.catalog.refreshByPath(path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return n_deleted


def _bucket_files(path: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    if not os.path.isdir(path):
        return out
    for entry in os.listdir(path):
        if entry.startswith("pulse_bucket="):
            d = os.path.join(path, entry)
            out[entry] = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet") and not f.startswith(".")
            )
    return out


def compact_table(
    spark: SparkSession, base: str, name: str, max_files_per_bucket: int = 4
) -> dict:
    """Compact bucket directories that accumulated more than
    `max_files_per_bucket` part-files (per-micro-batch appends — the
    O(batch) upsert fast path — leave one file per batch; a day of
    10 s batches is ~8600 files per hot bucket, and file-open overhead
    then dominates scans). Rewrites ONLY the offending buckets, one
    task (= one output file) per bucket via repartition on the bucket
    column. Returns {buckets_compacted, files_before, files_after}.
    """
    path = table_path(base, name)
    per_bucket = _bucket_files(path)
    needy = {d: fs for d, fs in per_bucket.items() if len(fs) > max_files_per_bucket}
    if not needy:
        return {"buckets_compacted": 0, "files_before": 0, "files_after": 0}
    bucket_ids = [int(d.split("=", 1)[1]) for d in needy]
    files_before = sum(len(fs) for fs in needy.values())

    df = spark.read.parquet(path).filter(F.col("pulse_bucket").isin(bucket_ids))
    staging = os.path.join(base, f".staging-{name}-{uuid.uuid4().hex}")
    try:
        (
            df.repartition("pulse_bucket")
            .write.partitionBy("pulse_bucket")
            .mode("overwrite")
            .parquet(staging)
        )
        staged = spark.read.parquet(staging)
        (
            staged.write.partitionBy("pulse_bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    after = _bucket_files(path)
    files_after = sum(len(after.get(d, [])) for d in needy)
    return {
        "buckets_compacted": len(needy),
        "files_before": files_before,
        "files_after": files_after,
    }
