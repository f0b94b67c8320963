"""Extractor-side record-stream wire protocol: codec goldens, the
heavymock-analog TCP server, the portion/resume client loop, the
retry taxonomy, and wire->parquet e2e ingest feeding the GBE query
surface (platform_impl.go:225-326 semantics)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from block_explorer_spark import schemas
from block_explorer_spark.plans import queries as Q
from block_explorer_spark.sources import parquet as pq
from block_explorer_spark.streaming import extractor_wire as XW


def _raw_pulse(seed: int, pn: int, jets=("0", "1"), recs_per_jet: int = 3):
    """Raw rows for one pulse: an activate + amend chain per jet."""
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


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_get_records_golden_bytes():
    """Hand-computed proto3 bytes: fields 20/21/22 varint keys are
    0xA0 01 / 0xA8 01 / 0xB0 01; 65537 varint = 81 80 04."""
    msg = XW.GetRecords(pulse_number=65537, record_number=3, count=100)
    assert msg.encode() == bytes.fromhex("a001818004a80103b00164")
    assert XW.GetRecords.decode(msg.encode()) == msg
    # proto3 zero-value omission: the all-defaults request is empty
    assert XW.GetRecords().encode() == b""
    assert XW.GetRecords.decode(b"") == XW.GetRecords()


def test_get_records_unknown_field_skipped():
    extra = XW.GetRecords(pulse_number=7).encode() + bytes.fromhex("7a03616263")
    assert XW.GetRecords.decode(extra).pulse_number == 7


def test_raw_record_roundtrip_null_vs_empty():
    row = _raw_pulse(1, 65537, jets=("0",), recs_per_jet=2)[0]
    assert row["prev_record_reference"] is None and row["payload"] == b""
    out = XW.decode_raw_record(XW.encode_raw_record(row))
    assert out["prev_record_reference"] is None  # NULL survives
    assert out["payload"] == b""  # empty bytes stay empty, not NULL
    assert out["reference"] == row["reference"]
    assert out["pulse_number"] == 65537
    assert out["prev_pulse_number"] is None  # unknown link
    linked = dict(row, prev_pulse_number=0, next_pulse_number=65547)
    out2 = XW.decode_raw_record(XW.encode_raw_record(linked))
    assert out2["prev_pulse_number"] == 0  # presence beats zero-omission
    assert out2["next_pulse_number"] == 65547


def test_envelope_should_iterate_from_presence():
    row = _raw_pulse(2, 65537, jets=("0",), recs_per_jet=1)[0]
    plain = XW.RecordEnvelope(record_number=4, record=row)
    assert XW.RecordEnvelope.decode(plain.encode()).should_iterate_from is None
    marked = XW.RecordEnvelope(record_number=4, record=row, should_iterate_from=0)
    assert XW.RecordEnvelope.decode(marked.encode()).should_iterate_from == 0


# ---------------------------------------------------------------------------
# server + client loop
# ---------------------------------------------------------------------------


def test_portion_loop_and_iterate_from():
    """250 records at batch 100 -> 3 Export calls, each resuming at
    RecordNumber=len(received); marker carries the next tape pulse."""
    pn, nxt = 65537, 65637
    tape = {pn: _raw_pulse(3, pn, jets=("0",), recs_per_jet=250), nxt: _raw_pulse(4, nxt)}
    with XW.HeavyRecordServer(tape) as srv:
        rows, itf = XW.retrieve_pulse_records(srv.address, pn, batch_size=100)
        assert len(rows) == 250
        assert [r["reference"] for r in rows] == [
            r["reference"] for r in tape[pn]
        ]  # order preserved, no loss, no dup
        assert itf == nxt
        assert srv.export_calls == 3


def test_rate_limit_and_not_found_retry():
    pn = 65537
    tape = {pn: _raw_pulse(5, pn)}
    with XW.HeavyRecordServer(tape) as srv:
        srv.fail_plan = [
            (XW.STATUS_RESOURCE_EXHAUSTED, XW.RATE_LIMIT_MSG),
            (XW.STATUS_NOT_FOUND, XW.NOT_FINAL_PULSE_MSG),
        ]
        rows, itf = XW.retrieve_pulse_records(srv.address, pn, backoff=0.01)
        assert len(rows) == 6
        assert itf == pn + 10  # synthetic next pulse (heavymock analog)
        assert srv.export_calls == 3  # two failed + one clean


def test_mid_stream_rate_limit_resumes_without_loss():
    """A stream cut after 4 records re-requests with RecordNumber=4;
    the reassembled pulse matches the tape exactly (the reference's
    'reopen a stream because the clientStream finished' path)."""
    pn = 65537
    tape = {pn: _raw_pulse(6, pn, jets=("0", "1", "10"), recs_per_jet=3)}
    with XW.HeavyRecordServer(tape) as srv:
        srv.fail_after = 4
        rows, _ = XW.retrieve_pulse_records(srv.address, pn, backoff=0.01)
        assert [r["reference"] for r in rows] == [r["reference"] for r in tape[pn]]
        assert srv.export_calls == 2


def test_version_error_propagates(monkeypatch):
    """Version mismatch shuts the explorer down in the reference
    (shutdownBE, platform_impl.go:153-156); here the client loop
    raises instead of retrying forever."""
    pn = 65537
    with XW.HeavyRecordServer({pn: _raw_pulse(7, pn)}) as srv:
        envs, status = XW._export_once(
            srv.address, XW.GetRecords(pulse_number=pn), 5.0, heavy_version="1"
        )
        assert envs == [] and "deprecated" in status.message
        monkeypatch.setattr(XW, "PLATFORM_API_VERSION", "999")
        with pytest.raises(XW.WireStatusError, match="deprecated"):
            XW.retrieve_pulse_records(srv.address, pn, backoff=0.01)
        monkeypatch.setattr(XW, "PLATFORM_API_VERSION", "2")
        rows, _ = XW.retrieve_pulse_records(srv.address, pn, backoff=0.01)
        assert len(rows) == 6  # correct version still works


# ---------------------------------------------------------------------------
# e2e: wire -> ingest -> GBE query surface
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_wire_ingest_feeds_query_surface(spark, tmp_path):
    base = str(tmp_path / "wh")
    p1, p2, p3 = 4_000_010, 4_000_020, 4_000_030
    tape = {
        p1: _raw_pulse(11, p1, jets=("0", "1")),
        p2: _raw_pulse(12, p2, jets=("0", "1")),
        p3: _raw_pulse(13, p3, jets=("0",)),
    }
    with XW.HeavyRecordServer(tape) as srv:
        n = XW.wire_ingest(spark, base, srv.address, [p1, p2, p3], batch_size=4, backoff=0.01)
    assert n == 3

    pulses = pq.read_table(spark, base, "pulses")
    records = pq.read_table(spark, base, "records")
    assert pulses.count() == 3
    assert records.count() == 15  # 6 + 6 + 3 (p3 has one jet)
    assert pq.read_table(spark, base, "jet_drops").count() == 5
    # control pass ran: full-trie pulses are complete+sequential
    flags = {r.pulse_number: (r.is_complete, r.is_sequential) for r in pulses.collect()}
    assert flags[p1] == (True, True) and flags[p2] == (True, True)
    assert flags[p3] == (False, False)  # jet "0" alone: trie not covered

    # q01 surface: keyset-paged lifeline over the ingested records
    obj = tape[p1][0]["object_reference"]
    page, total = Q.get_lifeline(records, obj, ascending=True, limit=10)
    got = page.collect()
    assert total == len(got) == 3
    assert [r.pulse_number for r in got] == [p1, p1, p1]

    # q03 surface: pulses page with W2 chain repair — stored nominal
    # links repaired against actually-present neighbors
    page, total = Q.get_pulses(pulses, ascending=True, limit=10)
    rows = {r.pulse_number: r for r in page.collect()}
    assert total == 3
    assert rows[p2].prev_pulse_number == p1
    assert rows[p2].next_pulse_number == p3
    assert rows[p1].next_pulse_number == p2
