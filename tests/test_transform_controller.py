from __future__ import annotations

import random

from pyspark.sql import functions as F

from block_explorer_spark import schemas
from block_explorer_spark.plans import controller as C
from block_explorer_spark.plans import transformer as Tr
from block_explorer_spark.sources import generators as gen


def _raw(ref, kind, obj=b"obj", prev=None, proto=b"proto", pos=0, jet="0", pn=100):
    return {
        "reference": ref,
        "kind": kind,
        "object_reference": obj,
        "prototype_reference": proto,
        "payload": b"p",
        "prev_record_reference": prev,
        "hash": b"h",
        "raw_data": b"r",
        "jet_id": jet,
        "pulse_number": pn,
        "timestamp": 1,
        "position": pos,
    }


def test_decode_kind_mapping(spark):
    rows = [
        _raw(b"a", "activate", pos=0),
        _raw(b"b", "amend", prev=b"a", pos=1),
        _raw(b"c", "deactivate", prev=b"b", pos=2),
        _raw(b"d", "result", pos=3),
        _raw(b"e", "incoming_request", pos=4),
        _raw(b"f", "outgoing_request", pos=5),
        _raw(b"g", "unsupported_kind", pos=6),
    ]
    df = spark.createDataFrame(rows, schemas.RAW_RECORDS)
    out = {bytes(r.reference): r for r in Tr.decode_records(df).collect()}
    assert len(out) == 6  # unsupported skipped
    assert out[b"a"].type == "state" and out[b"a"].prev_record_reference is None
    assert out[b"b"].type == "state" and bytes(out[b"b"].prev_record_reference) == b"a"
    assert out[b"c"].type == "state" and out[b"c"].prototype_reference is None
    assert out[b"d"].type == "result"
    assert out[b"e"].type == "request" and out[b"f"].type == "request"


def test_transform_assigns_chain_order(spark):
    # records arrive out of chain order; amend chain a->b->c
    rows = [
        _raw(b"c", "amend", prev=b"b", pos=0),
        _raw(b"req", "incoming_request", obj=b"other", pos=1),
        _raw(b"a", "activate", pos=2),
        _raw(b"b", "amend", prev=b"a", pos=3),
    ]
    df = spark.createDataFrame(rows, schemas.RAW_RECORDS)
    out = Tr.transform_pulse_data(df).orderBy("order").collect()
    assert [bytes(r.reference) for r in out] == [b"a", b"req", b"b", b"c"]
    assert [r.order for r in out] == [1, 2, 3, 4]


def test_transform_drops_broken_chain_drop(spark):
    good = [_raw(b"a", "activate", jet="0", pos=0)]
    bad = [
        _raw(b"x", "activate", obj=b"o2", jet="1", pos=0),
        _raw(b"z", "amend", obj=b"o2", prev=b"missing", jet="1", pos=1),
    ]
    df = spark.createDataFrame(good + bad, schemas.RAW_RECORDS)
    out = Tr.transform_pulse_data(df)
    assert [r.jet_id for r in out.collect()] == ["0"]


def test_jet_drops_from_records(spark):
    rows = [
        _raw(b"a", "activate", jet="0", pn=100, pos=0),
        _raw(b"b", "amend", prev=b"a", jet="0", pn=100, pos=1),
        _raw(b"c", "activate", obj=b"o2", jet="1", pn=100, pos=0),
    ]
    recs = Tr.transform_pulse_data(spark.createDataFrame(rows, schemas.RAW_RECORDS))
    pulses = spark.createDataFrame(gen.make_pulses(start=100, count=1), schemas.PULSES)
    drops = Tr.jet_drops_from_records(recs, pulses)
    got = {r.jet_id: r.record_amount for r in drops.collect()}
    assert got == {"0": 2, "1": 1}


def test_check_completeness_trie(spark):
    pulses = gen.make_pulses(start=1000, count=2, complete=False)
    pdf = spark.createDataFrame(pulses, schemas.PULSES)
    rng = random.Random(1)
    drops = [
        gen.make_jet_drop(rng, 1000, "0"),
        gen.make_jet_drop(rng, 1000, "1"),  # full cover
        gen.make_jet_drop(rng, 1010, "0"),  # half cover
    ]
    ddf = spark.createDataFrame(drops, schemas.JET_DROPS)
    got = {r.pulse_number: r.is_covered for r in C.check_completeness(pdf, ddf).collect()}
    assert got == {1000: True, 1010: False}
    assert C.newly_complete_pulses(pdf, ddf) == [1000]


def test_advance_sequential_stops_at_gap(spark):
    pulses = gen.make_pulses(start=1000, count=6, gaps=(3,), complete=True, sequential=False)
    pulses[0]["is_sequential"] = True  # frontier at 1000
    pdf = spark.createDataFrame(pulses, schemas.PULSES)
    assert C.advance_sequential(pdf) == [1010, 1020]  # halts: 1030 missing


def test_advance_sequential_stops_at_incomplete(spark):
    pulses = gen.make_pulses(start=1000, count=4, complete=True, sequential=False)
    pulses[0]["is_sequential"] = True
    pulses[2]["is_complete"] = False  # 1020 incomplete
    pdf = spark.createDataFrame(pulses, schemas.PULSES)
    assert C.advance_sequential(pdf) == [1010]


def test_find_gaps_and_reload_pool(spark):
    pulses = gen.make_pulses(start=1000, count=6, gaps=(2, 3))
    pdf = spark.createDataFrame(pulses, schemas.PULSES)
    gaps = C.find_gaps(pdf)
    assert gaps == [(1010, 1040)]
    pool = C.ReloadPool(ttl_seconds=100)
    assert pool.should_reload((1010, 1040), now=0.0)
    assert not pool.should_reload((1010, 1040), now=50.0)
    assert pool.should_reload((1010, 1040), now=150.0)


def test_decode_payload_only_for_memory_and_result(spark):
    """transferToCanonicalRecord stores payload only for activate/amend
    (Memory) and result (Payload); deactivate and request kinds persist
    no payload — etl/transformer/transformer.go:231-277."""
    rows = [
        _raw(b"a", "activate", pos=0),
        _raw(b"b", "amend", prev=b"a", pos=1),
        _raw(b"c", "deactivate", prev=b"b", pos=2),
        _raw(b"d", "result", pos=3),
        _raw(b"e", "incoming_request", pos=4),
        _raw(b"f", "outgoing_request", pos=5),
    ]
    df = spark.createDataFrame(rows, schemas.RAW_RECORDS)
    out = {bytes(r.reference): r for r in Tr.decode_records(df).collect()}
    assert bytes(out[b"a"].payload) == b"p"
    assert bytes(out[b"b"].payload) == b"p"
    assert out[b"c"].payload is None
    assert bytes(out[b"d"].payload) == b"p"
    assert out[b"e"].payload is None
    assert out[b"f"].payload is None
