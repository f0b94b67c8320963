"""Protobuf wire codec + framed GetNextPulse stream server.

Covers the reference's pulse_exporter.proto message encoding
byte-for-byte (golden vectors computed by hand from the proto3 wire
spec) and the server loop semantics of
etl/exporter/pulse_exporter_server.go:20-51 — initial cursor, resume,
prototype filtering, long-poll on caught-up.
"""

from __future__ import annotations

import random
import threading

import pytest

from block_explorer_spark import schemas
from block_explorer_spark.streaming import exporter_wire as W
from block_explorer_spark.streaming import pipeline as P


# ---------------------------------------------------------------------------
# varint / scalar primitives
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n,enc",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),
        (65537, b"\x81\x80\x04"),
        ((1 << 63) - 1, b"\xff\xff\xff\xff\xff\xff\xff\xff\x7f"),
    ],
)
def test_uvarint_golden(n, enc):
    assert W.encode_uvarint(n) == enc
    assert W.decode_uvarint(enc, 0) == (n, len(enc))


def test_uvarint_rejects_truncation_and_runaway():
    with pytest.raises(ValueError):
        W.decode_uvarint(b"\x80\x80", 0)  # continuation bit, no end
    with pytest.raises(ValueError):
        W.decode_uvarint(b"\x80" * 11, 0)  # > 10 bytes


def test_negative_int64_is_ten_bytes_twos_complement():
    # proto3 int64 (not sint64): -1 = 0xFFFF...FF as unsigned varint
    enc = W._encode_int64(-1)
    assert enc == b"\xff" * 9 + b"\x01"
    u, _ = W.decode_uvarint(enc, 0)
    assert W._decode_int64(u) == -1


# ---------------------------------------------------------------------------
# message golden vectors
# ---------------------------------------------------------------------------


def test_request_golden_bytes():
    req = W.GetNextPulseRequest(pulse_number_from=65537, prototypes=[b"ab", b"c"])
    wire = req.encode()
    assert wire == bytes.fromhex("0881800412026162120163")
    back = W.GetNextPulseRequest.decode(wire)
    assert back == req


def test_response_golden_bytes():
    resp = W.GetNextPulseResponse(
        pulse_number=4_000_010, prev_pulse_number=4_000_000, record_amount=6
    )
    wire = resp.encode()
    assert wire == bytes.fromhex("088a92f401108092f4011806")
    assert W.GetNextPulseResponse.decode(wire) == resp


def test_proto3_zero_values_omitted_and_defaulted():
    assert W.GetNextPulseRequest().encode() == b""
    assert W.GetNextPulseRequest.decode(b"") == W.GetNextPulseRequest()
    # partial: only RecordAmount set -> one field on the wire
    resp = W.GetNextPulseResponse(record_amount=6)
    assert resp.encode() == b"\x18\x06"
    assert W.GetNextPulseResponse.decode(b"\x18\x06") == resp


def test_decoder_skips_unknown_fields():
    base = W.GetNextPulseResponse(pulse_number=7, record_amount=3).encode()
    # field 7 varint(99), field 9 length-delimited "xyz": both unknown
    extra = b"\x38\x63" + b"\x4a\x03xyz"
    msg = W.GetNextPulseResponse.decode(base + extra)
    assert (msg.pulse_number, msg.record_amount) == (7, 3)


def test_truncated_unknown_fields_raise():
    """A corrupt frame whose UNKNOWN field overruns the buffer must
    raise like the known-field paths do, not parse as a valid message
    (ADVICE r10: _skip_field overrun)."""
    import pytest

    base = W.GetNextPulseResponse(pulse_number=7).encode()
    cases = [
        b"\x4a\x63xyz",  # field 9 LEN claims 99 bytes, has 3
        b"\x39\x01\x02",  # field 7 I64 needs 8 bytes, has 2
        b"\x3d\x01",  # field 7 I32 needs 4 bytes, has 1
    ]
    for extra in cases:
        with pytest.raises(ValueError, match="truncated"):
            W.GetNextPulseResponse.decode(base + extra)


# ---------------------------------------------------------------------------
# gRPC framing
# ---------------------------------------------------------------------------


def test_frame_roundtrip_and_eof(tmp_path):
    import io

    payload = b"hello-pulse"
    framed = W.frame_message(payload)
    assert framed[:1] == b"\x00" and len(framed) == 5 + len(payload)
    stream = io.BytesIO(framed + W.frame_message(b""))
    assert W.read_frame(stream) == payload
    assert W.read_frame(stream) == b""
    assert W.read_frame(stream) is None  # clean EOF
    with pytest.raises(ValueError):
        W.read_frame(io.BytesIO(b"\x01" + b"\x00\x00\x00\x00"))  # compressed
    with pytest.raises(ValueError):
        W.read_frame(io.BytesIO(b"\x00\x00\x00"))  # truncated header


# ---------------------------------------------------------------------------
# end-to-end server
# ---------------------------------------------------------------------------


def _raw_pulse_batch(seed: int, pn: int, jets: tuple[str, ...], recs_per_jet: int = 3):
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


def test_pulse_wire_server_streams_resumes_and_longpolls(spark, tmp_path):
    base = str(tmp_path / "wh")
    rows = _raw_pulse_batch(7, 4_000_010, ("0", "1")) + _raw_pulse_batch(
        8, 4_000_020, ("0", "1")
    )
    P.ingest_batch(spark, base, spark.createDataFrame(rows, schemas.RAW_RECORDS))
    P.run_control_pass(spark, base)

    with W.PulseWireServer(spark, base, pulse_period=0.2) as srv:
        host, port = srv.address

        # initial stream from pulse 0: both complete pulses, in order,
        # with prototype-filtered record counts (6 records each)
        got = W.stream_pulses(host, port, 0, [b"proto"], max_messages=2)
        assert [(m.pulse_number, m.record_amount) for m in got] == [
            (4_000_010, 6),
            (4_000_020, 6),
        ]
        # prev link travels the wire too
        assert got[1].prev_pulse_number == 4_000_010

        # resume: a reconnect with PulseNumberFrom = first pulse only
        # replays strictly-later pulses (the Go cursor contract)
        got = W.stream_pulses(host, port, 4_000_010, [b"proto"], max_messages=1)
        assert [m.pulse_number for m in got] == [4_000_020]

        # long-poll: a client past the head blocks until NEW data is
        # ingested and control-passed, then receives exactly it
        result: list = []

        def tail():
            result.extend(
                W.stream_pulses(host, port, 4_000_020, [b"proto"], max_messages=1)
            )

        t = threading.Thread(target=tail)
        t.start()
        P.ingest_batch(
            spark,
            base,
            spark.createDataFrame(
                _raw_pulse_batch(9, 4_000_030, ("0", "1")), schemas.RAW_RECORDS
            ),
        )
        P.run_control_pass(spark, base)
        t.join(timeout=60)
        assert not t.is_alive()
        assert [(m.pulse_number, m.prev_pulse_number) for m in result] == [
            (4_000_030, 4_000_020)
        ]

        # prototype filter: no matching records -> caught-up long-poll
        # (client sees nothing within a few pulse periods)
        none = []

        def tail_none():
            try:
                none.extend(
                    W.stream_pulses(
                        host, port, 0, [b"nope"], max_messages=1, timeout=1.0
                    )
                )
            except (TimeoutError, OSError):
                pass

        t2 = threading.Thread(target=tail_none)
        t2.start()
        t2.join(timeout=10)
        assert none == []
