"""Streaming ingest + control plane + exporter tail.

Maps the reference's channel pipeline (gRPC source → transformer →
200-worker processor → Postgres; §1.3) onto Structured Streaming:

  raw-records file source (stand-in for the gRPC exporter stream)
    → foreachBatch: D2 decode + J6 chain sort + S4/S5 MERGE
    → control pass: D4 completeness, D5 sequential, counters

foreachBatch is the right sink shape because each micro-batch needs
the multi-table idempotent MERGE protocol (sources/parquet.py), which
no built-in sink provides. Backpressure = maxFilesPerTrigger
(reference: bounded channels of 500, gRPC batches of 100 —
configuration/configuration.go:63-73); exactly-once = MERGE keys +
checkpointed source offsets, mirroring the reference's PK-upsert
idempotency (test/integration/db_integration_test.go:106-211).

The same `ingest_batch` drives the non-streaming micro-batch loop
(backfills / reload ranges, D6) — one code path for both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from block_explorer_spark import schemas
from block_explorer_spark.plans import controller as C
from block_explorer_spark.plans import transformer as Tr
from block_explorer_spark.sources import parquet as pq


def pulses_from_raw(raw: DataFrame) -> DataFrame:
    """Derive pulse rows for a raw batch.

    The gRPC source delivers pulse metadata alongside records — a
    FullPulse with REAL prev/next chain links
    (etl/extractor/platform_pulse.go:43-57) — and those links are what
    the reference stores (SavePulse). The raw schema carries them as
    nullable columns; when a stand-in source omits them, fall back to
    the nominal step-10 cadence. Irregular cadences (skipped
    consensus rounds) therefore ingest with correct links instead of
    mislabeled nominal ones; chain repair (W2/J2) still covers
    neighbors that never arrive.

    New pulses start incomplete/non-sequential; the control plane
    flips the flags (reference does the same on SavePulse).
    """
    step = 10
    return (
        raw.groupBy("pulse_number")
        .agg(
            F.max("timestamp").alias("timestamp"),
            F.max("prev_pulse_number").alias("__real_prev"),
            F.max("next_pulse_number").alias("__real_next"),
        )
        .withColumn(
            "prev_pulse_number", F.coalesce(F.col("__real_prev"), F.col("pulse_number") - step)
        )
        .withColumn(
            "next_pulse_number", F.coalesce(F.col("__real_next"), F.col("pulse_number") + step)
        )
        .drop("__real_prev", "__real_next")
        .withColumn("is_complete", F.lit(False))
        .withColumn("is_sequential", F.lit(False))
        .withColumn("jet_drop_amount", F.lit(0).cast("long"))
        .withColumn("record_amount", F.lit(0).cast("long"))
        .select(*[f.name for f in schemas.PULSES.fields])
    )


def ingest_batch(spark: SparkSession, base: str, raw: DataFrame) -> None:
    """One micro-batch: transform + persist (idempotent, replay-safe).

    Raw records dedup EXACT duplicates: an at-least-once source can
    deliver the same record twice within one batch (the reference's
    importer stream does — db_integration_test.go:106-211, C5498), and
    a byte-identical duplicate entering the chain sort would read as a
    fork and wrongly fail the whole drop. Upsert's PK merge only covers
    cross-batch replays; in-batch dedup has to happen pre-sort. Dedup
    is over ALL columns, not just the reference: two rows sharing a
    reference but differing in payload are a genuine in-batch fork and
    must reach fork validation, not be collapsed to an arbitrary winner
    (the reference's C5498 replay is byte-identical only). r11: the
    dedup rides the chain sort's own (pulse, jet) grouping shuffle
    (dedupe=True) instead of paying a standalone full-batch exchange —
    exact duplicates share every column, so they always share a group.
    """
    raw = raw.cache()
    records = None
    try:
        records = Tr.transform_pulse_data(raw, dedupe=True).cache()
        # Materialize the transform once, then run the pulse + record
        # MERGEs as concurrent Spark jobs (the scheduler interleaves
        # them; the reference loads through a 200-worker pool,
        # configuration/configuration.go:126). Safe because each write
        # targets a different table and each MERGE is idempotent —
        # partial failure self-heals on replay exactly as in the
        # sequential order.
        # ONE job materializes both caches AND yields per-pulse row
        # counts for raw and transformed records (each union branch
        # must scan every cached row, so this populates both caches
        # exactly as count() would, without extra jobs). The counts feed
        # upsert_many's batch_stats: the per-table bucket lists + row
        # counts it would otherwise spend one planning job PER TABLE
        # rediscovering (r11 ingest profile: 3 of the ~12 fixed jobs
        # per micro-batch), and the pulse bounds that let the merge
        # zone-prune its collision checks to zero file reads in the
        # steady all-new-pulses state.
        #   raw pulses ⊇ records pulses (chain validation drops whole
        # jet drops): the PULSES batch derives from raw, so its hint
        # uses the raw-side set; records/jet_drops derive from the
        # transformed records, so theirs use the records-side set.
        #   The two sides aggregate through ONE union (not a join):
        # a join of two aggregates runs ~8 AQE stage-jobs on a
        # micro-batch (measured: ~0.8 s of a 2.0 s commit); the union
        # form is a single aggregation query. The same aggregate also
        # carries the raw side's pulse metadata (max timestamp + real
        # prev/next chain links), so the 1-row-per-pulse PULSES batch
        # is built driver-side from the collected rows instead of
        # running pulses_from_raw as a second aggregation query over
        # raw at staging time (one whole exchange + its AQE jobs gone;
        # the batch is bounded by the micro-batch's pulse count, a few
        # rows, so the local relation is free).
        nul = F.lit(None).cast("long")
        per_pulse = (
            raw.select(
                "pulse_number", F.lit(0).alias("__is_rec"), "timestamp",
                "prev_pulse_number", "next_pulse_number",
            )
            .unionByName(
                records.select(
                    "pulse_number", F.lit(1).alias("__is_rec"),
                    nul.alias("timestamp"),
                    nul.alias("prev_pulse_number"),
                    nul.alias("next_pulse_number"),
                )
            )
            .groupBy("pulse_number")
            .agg(
                F.count(F.lit(1)).alias("n_all"),
                F.sum("__is_rec").alias("n_rec"),
                F.max("timestamp").alias("ts"),
                F.max("prev_pulse_number").alias("prev"),
                F.max("next_pulse_number").alias("next"),
            )
            .collect()
        )
        raw_pulses = [
            r["pulse_number"] for r in per_pulse if r["n_all"] > r["n_rec"]
        ]
        touched = [r["pulse_number"] for r in per_pulse if r["n_rec"]]
        n_records = sum(r["n_rec"] for r in per_pulse)
        # same derivation as pulses_from_raw (step-10 fallback for
        # sources that lack real chain links), driver-side
        step = 10
        pulses = spark.createDataFrame(
            [
                {
                    "pulse_number": r["pulse_number"],
                    "prev_pulse_number": (
                        r["prev"] if r["prev"] is not None
                        else r["pulse_number"] - step
                    ),
                    "next_pulse_number": (
                        r["next"] if r["next"] is not None
                        else r["pulse_number"] + step
                    ),
                    "is_complete": False,
                    "is_sequential": False,
                    "timestamp": r["ts"],
                    "jet_drop_amount": 0,
                    "record_amount": 0,
                }
                for r in per_pulse
                if r["n_all"] > r["n_rec"]
            ],
            schemas.PULSES,
        )
        drops = Tr.jet_drops_from_records(records, pulses)
        # Counter-correctness probe BEFORE the merges: if any touched
        # (pulse, jet) drop already exists — a pulse whose records
        # arrive split across micro-batches — batch-local counts would
        # overwrite the true totals (upsert is replace-on-key). The
        # reference increments counters inside its load txn
        # (storage.go:56-60); the idempotent analog recomputes counts
        # from the post-merge fact table. The probe reads only the
        # PRE-EXISTING jet_drops table, so it does not depend on this
        # batch's merges — and in steady state (all-new pulses, probe
        # empty) the jet_drops merge keeps its batch-local counts and
        # runs CONCURRENTLY with the other two, as before.
        prior = 0
        if touched and os.path.exists(pq.table_path(base, "jet_drops")):
            try:
                prior = (
                    pq.read_table(
                        spark, base, "jet_drops",
                        pulse_gte=min(touched), pulse_lte=max(touched),
                    )
                    .filter(F.col("pulse_number").isin(touched))
                    .limit(1)
                    .count()
                )
            except Exception:
                prior = 0  # unreadable/empty dir: first batch ever
        # Round 6: ONE manifest commit for the whole load — pulses,
        # records and (steady state) jet_drops publish atomically,
        # matching the reference's single load txn (storage.go:28-82).
        # upsert_many stages the per-table writes in parallel threads
        # internally, so this keeps the previous concurrency.
        batches = {"pulses": pulses, "records": records}
        stats = {
            "pulses": pq.BatchStats(raw_pulses, len(raw_pulses)),
            "records": pq.BatchStats(touched, n_records),
        }
        if not prior:
            batches["jet_drops"] = drops
            # one row per (pulse, jet): bounded above by the record
            # count — the bound is only consumed by the records-table
            # sidecar gate, so an upper bound is safe for jet_drops
            stats["jet_drops"] = pq.BatchStats(touched, n_records)
        pq.upsert_many(spark, base, batches, batch_stats=stats)
        if prior:
            # Split-pulse path only: recompute counts from the merged
            # fact table (bucket-pruned to the touched pulses), then
            # merge jet_drops after the records merge has landed.
            post = pq.read_table(
                spark, base, "records",
                pulse_gte=min(touched), pulse_lte=max(touched),
            ).filter(F.col("pulse_number").isin(touched))
            drops = Tr.jet_drops_from_records(post, pulses)
            pq.upsert(spark, base, "jet_drops", drops)
    finally:
        raw.unpersist()
        if records is not None:
            records.unpersist()


def run_control_pass(spark: SparkSession, base: str) -> dict:
    """D4 + D5 + counter refresh as one idempotent batch sweep.

    Returns what changed: {"completed": [...], "sequential": [...],
    "gaps": [...]} — gaps feed the reload loop (D6).

    r11: the three pulse-table updates (complete flags, sequential
    flags, counters) fuse into ONE upsert commit. The decisions are
    unchanged — the sequential advancer sees the complete flips
    through an in-memory overlay of the same rows the old
    flip-commit-reread produced — and the final table state is
    byte-identical, but the pass pays one manifest commit + staging
    cycle instead of three (and readers never see a partially swept
    intermediate state, which is strictly safer)."""
    from block_explorer_spark.operators.aggregates import pulse_counters

    pulses = pq.read_table(spark, base, "pulses")
    drops = pq.read_table(spark, base, "jet_drops")
    completed = C.newly_complete_pulses(pulses, drops)
    if completed:
        pulses = pulses.withColumn(
            "is_complete",
            F.when(
                F.col("pulse_number").isin(completed), F.lit(True)
            ).otherwise(F.col("is_complete")),
        )
    sequential = C.advance_sequential(pulses)
    if sequential:
        pulses = pulses.withColumn(
            "is_sequential",
            F.when(
                F.col("pulse_number").isin(sequential), F.lit(True)
            ).otherwise(F.col("is_sequential")),
        )
    # counter refresh over the same frame (refresh_pulse_counters'
    # derivation, fused into the single commit)
    counters = pulse_counters(drops)
    updated = (
        pulses.drop("jet_drop_amount", "record_amount")
        .join(counters, "pulse_number", "left_outer")
        .fillna(0, subset=["jet_drop_amount", "record_amount"])
        .select(*[f.name for f in schemas.PULSES.fields])
    )
    pq.upsert(spark, base, "pulses", updated)
    gaps = C.find_gaps(pq.read_table(spark, base, "pulses"))
    return {"completed": completed, "sequential": sequential, "gaps": gaps}


def _spool_dir(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "group_spool")


def flush_pending(spark: SparkSession, base: str, checkpoint_dir: str) -> int:
    """Ingest whatever the group-commit spool holds (one MERGE + ONE
    manifest swap for the whole group) and clear it. Returns raw rows
    flushed. Idempotent and crash-safe at every point: a crash before
    the clear leaves the spool intact and the next flush re-runs the
    idempotent MERGE; a crash mid-ingest self-heals the same way."""
    import shutil

    spool = _spool_dir(checkpoint_dir)
    if not os.path.isdir(spool):
        return 0
    try:
        raw = spark.read.schema(schemas.RAW_RECORDS).parquet(spool)
        n = raw.count()
    except Exception:
        n = 0  # spool dir exists but holds no readable parquet
    if n:
        ingest_batch(spark, base, raw)
        run_control_pass(spark, base)
    shutil.rmtree(spool, ignore_errors=True)
    return n


def start_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    control_every_n_batches: int = 1,
    group_commit: int = 1,
) -> StreamingQuery:
    """readStream over a raw-records parquet directory → foreachBatch.

    Source offsets are checkpointed; a replayed micro-batch re-MERGEs
    the same keys (no duplicates). The control pass runs inline every
    N batches — cheap because it reads only incomplete pulses.

    `group_commit=K` (round 7): amortize the manifest CAS cost (~0.3 s
    per commit, flat in batch size) across K micro-batches. Each batch
    appends its raw rows to a spool beside the checkpoint (one plain
    parquet append — no CAS); every K-th batch the spool is ingested
    as ONE MERGE + ONE manifest swap. Durability story, window by
    window:
      - crash after spool append, before the offset commit → Spark
        replays the batch, the spool holds its rows twice, and
        ingest_batch's exact-duplicate dropDuplicates collapses them;
      - crash after the offset commit, before the group flush → the
        rows are no longer Spark's to replay but the spool still
        holds them; the next start_ingest_stream (or an explicit
        flush_pending) ingests them — nothing is lost;
      - crash mid-flush → spool intact (cleared only after the
        idempotent MERGE commits), replay converges.
    The trade is VISIBILITY latency (up to K micro-batches), never
    durability — the reference makes the same trade batching records
    into its load txn (etl/processor/processor.go worker pool).
    """
    raw_stream = (
        spark.readStream.schema(schemas.RAW_RECORDS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    if group_commit > 1:
        # self-heal: a previous run's unflushed group lands first
        flush_pending(spark, base, checkpoint_dir)
    pending = {"n": 0}

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if group_commit > 1:
            batch.write.mode("append").parquet(_spool_dir(checkpoint_dir))
            pending["n"] += 1
            if pending["n"] >= group_commit:
                flush_pending(spark, base, checkpoint_dir)
                pending["n"] = 0
            return
        ingest_batch(spark, base, batch)
        if control_every_n_batches and batch_id % control_every_n_batches == 0:
            run_control_pass(spark, base)

    return (
        raw_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def exporter_next_pulses(
    spark: SparkSession,
    base: str,
    from_pulse: int,
    prototypes: list[bytes],
    limit: int = 100,
) -> DataFrame:
    """D7/S7: the exporter tail as a batch poll.

    Sequential pulses after `from_pulse` whose records match the
    prototype IN-list, with matched record counts — the long-poll loop
    (etl/exporter/pulse_exporter_server.go:20-51) calls this per tick;
    a streaming deployment wraps it in readStream on the pulses table.
    """
    # pulse_gte prunes bucket directories, not just row groups — the
    # records side is the 100 TB table, so the tail poll must never
    # list buckets at or before the cursor.
    pulses = pq.read_table(spark, base, "pulses", pulse_gte=from_pulse + 1).filter(
        F.col("is_sequential")
    )
    records = pq.read_table(spark, base, "records", pulse_gte=from_pulse + 1)
    if prototypes:
        records = records.filter(F.col("prototype_reference").isin(*prototypes))
    matched = (
        F.broadcast(pulses.select("pulse_number", "prev_pulse_number"))
        .join(records, "pulse_number")
        .groupBy("pulse_number", "prev_pulse_number")
        .agg(F.count(F.lit(1)).alias("record_amount"))
    )
    return matched.orderBy("pulse_number").limit(limit)
