from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F

from block_explorer_spark import schemas
from block_explorer_spark.sources import generators as gen
from block_explorer_spark.sources import parquet as pq
from block_explorer_spark.streaming import pipeline as P


def _raw_pulse_batch(seed: int, pn: int, jets: tuple[str, ...], recs_per_jet: int = 3):
    """Raw records for one pulse: an activate + amend chain per jet."""
    rng = random.Random(seed)
    rows = []
    for jet in jets:
        prev = None
        obj = bytes(rng.getrandbits(8) for _ in range(8))
        for i in range(recs_per_jet):
            ref = bytes(rng.getrandbits(8) for _ in range(8))
            rows.append(
                {
                    "reference": ref,
                    "kind": "activate" if i == 0 else "amend",
                    "object_reference": obj,
                    "prototype_reference": b"proto",
                    "payload": b"",
                    "prev_record_reference": prev,
                    "hash": b"h",
                    "raw_data": b"r",
                    "jet_id": jet,
                    "pulse_number": pn,
                    "timestamp": 1_600_000_000 + pn,
                    "position": i,
                }
            )
            prev = ref
    return rows


def test_ingest_batch_and_control(spark, tmp_path):
    base = str(tmp_path / "wh")
    rows = _raw_pulse_batch(1, 4_000_010, ("0", "1")) + _raw_pulse_batch(2, 4_000_020, ("0",))
    raw = spark.createDataFrame(rows, schemas.RAW_RECORDS)
    P.ingest_batch(spark, base, raw)

    pulses = pq.read_table(spark, base, "pulses")
    assert pulses.count() == 2
    assert pq.read_table(spark, base, "records").count() == 9
    assert pq.read_table(spark, base, "jet_drops").count() == 3

    out = P.run_control_pass(spark, base)
    # 4000010 has jets {0,1} = full trie cover; 4000020 only {0}
    assert out["completed"] == [4_000_010]
    assert out["sequential"] == [4_000_010]
    pulses = pq.read_table(spark, base, "pulses")
    row = pulses.filter(F.col("pulse_number") == 4_000_010).collect()[0]
    assert row.is_complete and row.is_sequential
    assert row.jet_drop_amount == 2 and row.record_amount == 6
    assert out["gaps"] == []


def test_ingest_replay_idempotent(spark, tmp_path):
    base = str(tmp_path / "wh")
    rows = _raw_pulse_batch(3, 4_000_010, ("0", "1"))
    raw = spark.createDataFrame(rows, schemas.RAW_RECORDS)
    P.ingest_batch(spark, base, raw)
    P.ingest_batch(spark, base, raw)  # replay the same micro-batch
    assert pq.read_table(spark, base, "records").count() == 6
    assert pq.read_table(spark, base, "jet_drops").count() == 2
    assert pq.read_table(spark, base, "pulses").count() == 1


def test_ingest_batch_fork_reaches_validation(spark, tmp_path):
    """In-batch dedup is exact-duplicate only: two rows sharing a
    reference but differing in payload are a genuine fork and must
    reach chain validation (which invalidates the drop), NOT be
    collapsed to an arbitrary winner. Byte-identical replays still
    dedup away (C5498 semantics)."""
    base = str(tmp_path / "wh")
    rows = _raw_pulse_batch(7, 4_000_010, ("0", "1"))
    # jet "0": duplicate its first record with a conflicting payload
    forked = dict(rows[0])
    forked["payload"] = b"conflicting-payload"
    # jet "1": byte-identical replay of its first record (rows[3])
    raw = spark.createDataFrame(rows + [forked, dict(rows[3])], schemas.RAW_RECORDS)
    P.ingest_batch(spark, base, raw)

    recs = pq.read_table(spark, base, "records")
    # jet 1 intact (exact dup removed), jet 0 dropped as invalid fork
    assert recs.filter(F.col("jet_id") == "1").count() == 3
    assert recs.filter(F.col("jet_id") == "0").count() == 0


def test_streaming_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    base = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # two "gRPC batches" as parquet files in the source dir
    b1 = spark.createDataFrame(_raw_pulse_batch(4, 4_000_010, ("0", "1")), schemas.RAW_RECORDS)
    b2 = spark.createDataFrame(_raw_pulse_batch(5, 4_000_020, ("0", "1")), schemas.RAW_RECORDS)
    b1.write.mode("append").parquet(src)
    b2.write.mode("append").parquet(src)

    q = P.start_ingest_stream(spark, src, base, ckpt, max_files_per_trigger=2)
    q.awaitTermination(120)

    pulses = pq.read_table(spark, base, "pulses")
    assert pulses.count() == 2
    assert pulses.filter(F.col("is_complete")).count() == 2
    assert pq.read_table(spark, base, "records").count() == 12

    # late file + restart from checkpoint: only the new file processed
    b3 = spark.createDataFrame(_raw_pulse_batch(6, 4_000_030, ("0", "1")), schemas.RAW_RECORDS)
    b3.write.mode("append").parquet(src)
    q2 = P.start_ingest_stream(spark, src, base, ckpt, max_files_per_trigger=2)
    q2.awaitTermination(120)
    assert pq.read_table(spark, base, "pulses").count() == 3
    assert pq.read_table(spark, base, "records").count() == 18


@pytest.mark.slow
def test_restart_resume_mid_batch_crash(spark, tmp_path, monkeypatch):
    """Exactly-once-at-the-table e2e: kill the stream AFTER a
    micro-batch persisted but BEFORE its offset committed (the
    at-least-once window of foreachBatch), restart from the
    checkpoint, and assert the replay neither loses nor duplicates
    records and completeness flags converge. The reference pins
    restart-derivable state in etl/controller/controller.go:55-78."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    b1 = spark.createDataFrame(_raw_pulse_batch(10, 4_000_010, ("0", "1")), schemas.RAW_RECORDS)
    b2 = spark.createDataFrame(_raw_pulse_batch(11, 4_000_020, ("0", "1")), schemas.RAW_RECORDS)
    b1.write.mode("append").parquet(src)
    b2.write.mode("append").parquet(src)

    real_ingest = P.ingest_batch
    state = {"calls": 0}

    def crash_after_persist(spark_, base_, raw_):
        real_ingest(spark_, base_, raw_)
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("injected crash after persist, before offset commit")

    monkeypatch.setattr(P, "ingest_batch", crash_after_persist)
    q = P.start_ingest_stream(spark, src, base, ckpt, max_files_per_trigger=1)
    with pytest.raises(Exception):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise RuntimeError(q.exception().desc)
    monkeypatch.setattr(P, "ingest_batch", real_ingest)

    # the crashed batch DID persist (so the restart really replays it)
    assert pq.read_table(spark, base, "records").count() > 0

    q2 = P.start_ingest_stream(spark, src, base, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert q2.exception() is None

    # no lost, no duplicated records; flags converged
    assert pq.read_table(spark, base, "records").count() == 12
    assert pq.read_table(spark, base, "jet_drops").count() == 4
    pulses = pq.read_table(spark, base, "pulses")
    assert pulses.count() == 2
    assert pulses.filter(F.col("is_complete")).count() == 2
    assert {r.record_amount for r in pulses.collect()} == {6}


def test_exporter_tail(spark, tmp_path):
    base = str(tmp_path / "wh")
    rows = _raw_pulse_batch(7, 4_000_010, ("0", "1"))
    proto_rows = _raw_pulse_batch(8, 4_000_020, ("0", "1"))
    raw = spark.createDataFrame(rows + proto_rows, schemas.RAW_RECORDS)
    P.ingest_batch(spark, base, raw)
    P.run_control_pass(spark, base)

    out = P.exporter_next_pulses(spark, base, from_pulse=0, prototypes=[b"proto"]).collect()
    assert [r.pulse_number for r in out] == [4_000_010, 4_000_020]
    assert all(r.record_amount == 6 for r in out)
    none = P.exporter_next_pulses(spark, base, from_pulse=0, prototypes=[b"nope"]).collect()
    assert none == []


def test_ingest_irregular_cadence_real_links(spark, tmp_path):
    """Raw batches carrying REAL prev/next pulse links (FullPulse,
    etl/extractor/platform_pulse.go:43-57) store those links; rows
    without them fall back to the nominal step-10 cadence.

    Mirrors the 'pulsar was down' gap shape of
    etl/storage/storage_test.go:1461-1514 at the ingest layer.
    """
    base = str(tmp_path / "wh")
    rows = _raw_pulse_batch(7, 4_000_010, ("0", "1"))
    # irregular: next real pulse is +7, not +10
    for r in rows:
        r["prev_pulse_number"] = 4_000_003
        r["next_pulse_number"] = 4_000_017
    rows += _raw_pulse_batch(8, 4_000_017, ("0",))  # links absent -> nominal
    raw = spark.createDataFrame(rows, schemas.RAW_RECORDS)
    P.ingest_batch(spark, base, raw)

    by_pn = {r.pulse_number: r for r in pq.read_table(spark, base, "pulses").collect()}
    assert by_pn[4_000_010].prev_pulse_number == 4_000_003
    assert by_pn[4_000_010].next_pulse_number == 4_000_017
    assert by_pn[4_000_017].prev_pulse_number == 4_000_007  # nominal fallback
    assert by_pn[4_000_017].next_pulse_number == 4_000_027


# ------------------------------------------------ round 7: group commit


def _write_src_batches(spark, src, pns):
    for i, pn in enumerate(pns):
        b = spark.createDataFrame(
            _raw_pulse_batch(20 + i, pn, ("0", "1")), schemas.RAW_RECORDS
        )
        # one FILE per logical batch: maxFilesPerTrigger=1 then maps
        # micro-batches 1:1 onto these, making group arithmetic exact
        b.coalesce(1).write.mode("append").parquet(src)


def test_group_commit_fewer_swaps_same_state(spark, tmp_path):
    """group_commit=2 over 4 micro-batches lands the same final table
    state as per-batch commits while writing strictly fewer manifest
    versions (the amortized-CAS point of round-7 item 4)."""
    from block_explorer_spark.sources import manifest as Mf

    pns = [4_000_010, 4_000_020, 4_000_030, 4_000_040]
    for tag, k in (("solo", 1), ("grouped", 2)):
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src)
        _write_src_batches(spark, src, pns)
        q = P.start_ingest_stream(
            spark, src, str(tmp_path / f"wh_{tag}"),
            str(tmp_path / f"ckpt_{tag}"),
            max_files_per_trigger=1, group_commit=k,
        )
        q.awaitTermination(180)
        assert q.exception() is None
    for tag in ("solo", "grouped"):
        base = str(tmp_path / f"wh_{tag}")
        assert pq.read_table(spark, base, "records").count() == 24
        pulses = pq.read_table(spark, base, "pulses")
        assert pulses.count() == 4
        assert pulses.filter(F.col("is_complete")).count() == 4
    v_solo = Mf.read(str(tmp_path / "wh_solo"))["version"]
    v_grp = Mf.read(str(tmp_path / "wh_grouped"))["version"]
    assert v_grp < v_solo


def test_group_commit_leftover_survives_restart(spark, tmp_path):
    """The crash-after-offset-commit window: with group_commit=2 and
    THREE micro-batches, the stream ends holding one unflushed batch
    whose offsets Spark already committed (it will never replay). The
    spool still has it: the next stream start (or flush_pending)
    ingests it — nothing lost, flush idempotent."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_src_batches(spark, src, [4_000_010, 4_000_020, 4_000_030])
    q = P.start_ingest_stream(
        spark, src, base, ckpt, max_files_per_trigger=1, group_commit=2
    )
    q.awaitTermination(180)
    assert q.exception() is None
    # two batches flushed as one group; the third sits in the spool
    assert pq.read_table(spark, base, "records").count() == 12
    assert os.path.isdir(os.path.join(ckpt, "group_spool"))

    assert P.flush_pending(spark, base, ckpt) > 0
    assert pq.read_table(spark, base, "records").count() == 18
    pulses = pq.read_table(spark, base, "pulses")
    assert pulses.count() == 3
    assert pulses.filter(F.col("is_complete")).count() == 3
    assert P.flush_pending(spark, base, ckpt) == 0  # spool cleared


def test_group_spool_replayed_batch_dedups(spark, tmp_path):
    """The crash-before-offset-commit window: the batch lands in the
    spool twice (append, crash, Spark replays, append again). The
    flush's exact-duplicate dedup collapses the copies — same rows as
    a single delivery."""
    base = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    b = spark.createDataFrame(
        _raw_pulse_batch(9, 4_000_050, ("0", "1")), schemas.RAW_RECORDS
    )
    spool = os.path.join(ckpt, "group_spool")
    b.write.mode("append").parquet(spool)
    b.write.mode("append").parquet(spool)  # the replayed delivery
    assert P.flush_pending(spark, base, ckpt) == 12  # raw rows, pre-dedup
    assert pq.read_table(spark, base, "records").count() == 6
    assert pq.read_table(spark, base, "pulses").count() == 1


@pytest.mark.slow
def test_streaming_ingest_lands_clustered_lifeline_layout(spark, tmp_path):
    """Round-8 item: the ingest stream's micro-batches land records
    with the (pulse_bucket, obj_key) layout + object-index sidecar
    ALREADY applied (it is the staging path, not a post-pass), so a
    lifeline read is pruned and correct MID-STREAM; a periodic
    compact + sidecar maintain folds the accumulation without
    changing any answer."""
    from block_explorer_spark.sources import manifest as Mf

    src = str(tmp_path / "src")
    base = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    batches = [
        _raw_pulse_batch(40 + i, 4_000_000 + 1000 * i, ("0", "1"),
                         recs_per_jet=4)
        for i in range(6)
    ]
    for rows in batches[:4]:
        spark.createDataFrame(rows, schemas.RAW_RECORDS).write.mode(
            "append"
        ).parquet(src)
    q = P.start_ingest_stream(spark, src, base, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    m = Mf.read(base)
    assert m["meta"]["layout"]["objidx"] == "full"
    assert m["families"].get(pq.OBJIDX), "sidecar commits with the stream"

    # mid-stream lifeline: object from batch 2 (jet "1"), activate is
    # dropped from obj linkage? no — amends chain on the same obj
    target_obj = batches[2][4]["object_reference"]  # jet "1" chain
    want = sum(1 for r in batches[2] if r["object_reference"] == target_obj)
    out = pq.read_records_for_object(spark, base, target_obj)
    assert out.count() == want
    assert len(set(out.inputFiles())) <= 2  # routed to its own bucket

    # two more micro-batches land, then the OPTIMIZE cadence folds
    for rows in batches[4:]:
        spark.createDataFrame(rows, schemas.RAW_RECORDS).write.mode(
            "append"
        ).parquet(src)
    q2 = P.start_ingest_stream(spark, src, base, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(180)
    pq.compact_table(spark, base, "records", max_files_per_bucket=1)
    pq.maintain_object_index(spark, base, min_files=2)

    out2 = pq.read_records_for_object(spark, base, target_obj)
    assert out2.count() == want
    assert len(set(out2.inputFiles())) <= 2
    # an object from a post-compact batch is found through the sidecar
    late_obj = batches[5][0]["object_reference"]
    late_want = sum(1 for r in batches[5]
                    if r["object_reference"] == late_obj)
    assert pq.read_records_for_object(spark, base, late_obj).count() == late_want
