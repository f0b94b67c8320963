"""Wire-level golden cases ported from the reference's handler tests.

Each test hits the running stdlib HTTP facade (block_explorer_spark/
rest.py) and asserts the exact JSON body / status the reference's echo
server produces; every case cites its api/handlers_test.go source
lines. This pins the endpoint contract — validation-failure
accumulation order, per-endpoint code/message quirks, envelope shapes
— at the same level the reference's own 2,635-line suite does.
"""

from __future__ import annotations

import json
import random
import urllib.error
import urllib.request

import pytest

from block_explorer_spark import schemas
from block_explorer_spark.functions.refs import base58_encode
from block_explorer_spark.rest import BlockExplorerApi, serve
from block_explorer_spark.sources import generators as gen

P0 = 4_000_000  # first seeded pulse; chain of 5 with step 10

OBJ_REF = bytes(range(32))  # seeded lifeline object
REC_REF = bytes(range(32, 64))  # its order-1 record reference
LOST_REF = bytes(range(64, 96))  # valid form, never stored


@pytest.fixture(scope="module")
def base_url(spark):
    rng = random.Random(13)
    pulses = gen.make_pulses(start=P0, count=5)
    drops = [
        gen.make_jet_drop(rng, P0 + 20, jet, timestamp=1_600_000_020)
        for jet in ("000", "001", "010")
    ] + [gen.make_jet_drop(rng, P0 + 30, "00", timestamp=1_600_000_030)]
    records = []
    # 3-state lifeline for OBJ_REF on the "000" drop (handlers_test
    # seeds via testutils.OrderedRecords, handlers_test.go:1322-1330)
    for order in range(3):
        r = gen.make_record(
            rng, P0 + 20, "000", order=order, rec_type="state",
            object_reference=OBJ_REF, timestamp=1_600_000_020,
        )
        records.append(r)
    records[1]["reference"] = REC_REF
    # noise records of other types on the same drop
    records.append(gen.make_record(rng, P0 + 20, "000", order=3, rec_type="request"))
    records.append(gen.make_record(rng, P0 + 20, "001", order=0, rec_type="result"))

    api_impl = BlockExplorerApi(
        spark.createDataFrame(pulses, schemas.PULSES).cache(),
        spark.createDataFrame(drops, schemas.JET_DROPS).cache(),
        spark.createDataFrame(records, schemas.RECORDS).cache(),
    )
    server = serve(api_impl)
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def get(base_url, path):
    """GET returning (status, parsed_body) without raising on 4xx."""
    try:
        with urllib.request.urlopen(base_url + path) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def bad_request(failures, code="Bad Request", message_field="message"):
    return {
        "code": code,
        message_field: "Invalid query or path parameters",
        "validation_failures": [
            {"property": p, "failure_reason": r} for p, r in failures
        ],
    }


VALID_REF = base58_encode(bytes(32))  # parses, matches nothing


# ---------------------------------------------------------------------------
# ObjectLifeline
# ---------------------------------------------------------------------------


def test_lifeline_limit_error(base_url):
    """handlers_test.go:229-251"""
    status, body = get(base_url, f"/api/v1/lifeline/{VALID_REF}/records?limit=200000000")
    assert status == 400
    assert body == bad_request([("limit", "should be in range [1, 1000]")])


def test_lifeline_offset_error(base_url):
    """handlers_test.go:253-274"""
    status, body = get(base_url, f"/api/v1/lifeline/{VALID_REF}/records?offset=-10")
    assert status == 400
    assert body == bad_request([("offset", "should not be negative")])


def test_lifeline_sort_error(base_url):
    """handlers_test.go:276-297"""
    status, body = get(
        base_url, f"/api/v1/lifeline/{VALID_REF}/records?sort_by=not_supported_sort"
    )
    assert status == 400
    assert body == bad_request([("sort_by", "should be 'index_desc' or 'index_asc'")])


def test_lifeline_reference_format_error(base_url):
    """handlers_test.go:315-337"""
    status, body = get(base_url, "/api/v1/lifeline/not_valid_reference/records")
    assert status == 400
    assert body == bad_request([("object_reference", "wrong format")])


def test_lifeline_reference_empty_error(base_url):
    """handlers_test.go:339-361 (path of blanks -> 'empty reference')"""
    status, body = get(base_url, "/api/v1/lifeline/%20%20/records")
    assert status == 400
    assert body == bad_request([("object_reference", "empty reference")])


def test_lifeline_from_index_error(base_url):
    """handlers_test.go:363-385"""
    status, body = get(
        base_url, f"/api/v1/lifeline/{VALID_REF}/records?from_index=not_valid_index"
    )
    assert status == 400
    assert body == bad_request([("from_index", "invalid")])


def test_lifeline_no_records(base_url):
    """handlers_test.go:299-313 — unknown ref is 200 with empty page"""
    status, body = get(base_url, f"/api/v1/lifeline/{VALID_REF}/records")
    assert status == 200
    assert body == {"total": 0, "result": []}


def test_lifeline_happy_path_desc_default(base_url):
    """handlers_test.go:81-114 — state records only, index desc default"""
    status, body = get(base_url, f"/api/v1/lifeline/{base58_encode(OBJ_REF)}/records")
    assert status == 200
    assert body["total"] == 3
    assert [r["index"] for r in body["result"]] == [
        f"{P0 + 20}:2",
        f"{P0 + 20}:1",
        f"{P0 + 20}:0",
    ]
    assert all(r["type"] == "state" for r in body["result"])


def test_lifeline_sort_asc(base_url):
    """handlers_test.go:193-227"""
    status, body = get(
        base_url, f"/api/v1/lifeline/{base58_encode(OBJ_REF)}/records?sort_by=index_asc"
    )
    assert status == 200
    assert [r["index"] for r in body["result"]] == [
        f"{P0 + 20}:0",
        f"{P0 + 20}:1",
        f"{P0 + 20}:2",
    ]


# ---------------------------------------------------------------------------
# Pulse / Pulses
# ---------------------------------------------------------------------------


def test_pulse_happy_path(base_url):
    """handlers_test.go:387-414 — interior pulse carries real links"""
    status, body = get(base_url, f"/api/v1/pulses/{P0 + 20}")
    assert status == 200
    assert body["pulse_number"] == P0 + 20
    assert body["prev_pulse_number"] == P0 + 10
    assert body["next_pulse_number"] == P0 + 30
    assert body["is_complete"] is True


def test_pulse_edge_links_omitted(base_url):
    """api/mappers.go:57-75 — -1 sentinels are omitted fields"""
    status, body = get(base_url, f"/api/v1/pulses/{P0}")
    assert status == 200
    assert "prev_pulse_number" not in body  # P0-10 never saved
    status, body = get(base_url, f"/api/v1/pulses/{P0 + 40}")
    assert status == 200
    assert "next_pulse_number" not in body


def test_pulse_not_exist(base_url):
    """handlers_test.go:445-452"""
    status, _ = get(base_url, f"/api/v1/pulses/{P0 + 5}")
    assert status == 404


def test_pulse_wrong_format(base_url):
    """handlers_test.go:454-460"""
    status, _ = get(base_url, "/api/v1/pulses/wrong_type")
    assert status == 400


def test_pulse_greater_than_max(base_url):
    """handlers_test.go:462-468 — int64 overflow is a binding error"""
    status, _ = get(base_url, "/api/v1/pulses/92233720368547758071")
    assert status == 400


def test_pulses_several_errors(base_url):
    """handlers_test.go:627-654 — all failures accumulate, in order"""
    status, body = get(
        base_url, "/api/v1/pulses?limit=200000000&offset=-10&from_pulse_number=0"
    )
    assert status == 400
    assert body == bad_request(
        [
            ("limit", "should be in range [1, 1000]"),
            ("offset", "should not be negative"),
            ("pulse", "invalid"),
        ]
    )


def test_pulses_from_pulse_number(base_url):
    """handlers_test.go:656-684 — from_pulse_number is a <= bound"""
    status, body = get(base_url, f"/api/v1/pulses?from_pulse_number={P0}")
    assert status == 200
    assert body["total"] == 1
    assert body["result"][0]["pulse_number"] == P0


def test_pulses_happy_desc_default(base_url):
    """handlers_test.go:470-498"""
    status, body = get(base_url, "/api/v1/pulses")
    assert status == 200
    assert body["total"] == 5
    assert [p["pulse_number"] for p in body["result"]] == [
        P0 + 40, P0 + 30, P0 + 20, P0 + 10, P0,
    ]


# ---------------------------------------------------------------------------
# Jet drops
# ---------------------------------------------------------------------------


def test_jet_drops_by_pulse_happy_asc(base_url):
    """handlers_test.go:944-989 — jet_id asc order by default"""
    status, body = get(base_url, f"/api/v1/pulses/{P0 + 20}/jet-drops")
    assert status == 200
    assert body["total"] == 3
    assert [d["jet_drop_id"] for d in body["result"]] == [
        f"000:{P0 + 20}",
        f"001:{P0 + 20}",
        f"010:{P0 + 20}",
    ]


def test_jet_drops_by_pulse_invalid_pulse(base_url):
    """handlers.go:404-431 — code rendered '400' on this endpoint"""
    status, body = get(base_url, "/api/v1/pulses/100/jet-drops")
    assert status == 400
    assert body == bad_request([("pulse", "invalid")], code="400")


def test_jet_drop_by_id_happy(base_url):
    """handlers_test.go:1385-1426"""
    status, body = get(base_url, f"/api/v1/jet-drops/000:{P0 + 20}")
    assert status == 200
    assert body["jet_drop_id"] == f"000:{P0 + 20}"
    assert body["jet_id"] == "000"
    assert body["pulse_number"] == P0 + 20


def test_jet_drop_by_id_invalid(base_url):
    """handlers.go:45-58 — '400' code, wrapped 'invalid: ...' reason"""
    status, body = get(base_url, "/api/v1/jet-drops/not_valid:value")
    assert status == 400
    assert body["code"] == "400"
    assert body["validation_failures"][0]["property"] == "jet drop id"
    assert body["validation_failures"][0]["failure_reason"].startswith("invalid")


def test_jet_drop_records_several_errors(base_url):
    """handlers_test.go:2603-2635 — five failures, reference order"""
    status, body = get(
        base_url,
        "/api/v1/jet-drops/not_valid:value/records"
        "?limit=200000000&offset=-10&type=not_valid_type&from_index=not_valid_index",
    )
    assert status == 400
    assert body == bad_request(
        [
            ("limit", "should be in range [1, 1000]"),
            ("offset", "should not be negative"),
            ("jet_drop_id", "invalid"),
            ("from_index", "invalid"),
            ("type", "should be 'request', 'state' or 'result'"),
        ]
    )


def test_jet_drop_records_type_filter(base_url):
    """handlers_test.go:2462-2601 (type filter branch)"""
    status, body = get(base_url, f"/api/v1/jet-drops/000:{P0 + 20}/records?type=state")
    assert status == 200
    assert body["total"] == 3
    assert all(r["type"] == "state" for r in body["result"])


def test_jets_invalid_jet_id(base_url):
    """handlers.go:749-781 — jetIDRegexp mismatch"""
    status, body = get(base_url, "/api/v1/jets/2abc/jet-drops")
    assert status == 400
    assert body == bad_request(
        [("jet-id path parameter", "parameter does not match with jetID valid value")]
    )


def test_jets_sort_error(base_url):
    """handlers.go:705-723"""
    status, body = get(base_url, "/api/v1/jets/000/jet-drops?sort_by=bogus")
    assert status == 400
    assert body == bad_request(
        [
            (
                "sort_by",
                "query parameter 'sort_by' should be "
                "'pulse_number_asc_jet_id_desc' or 'pulse_number_desc_jet_id_asc'",
            )
        ]
    )


def test_jets_hierarchy_page(base_url):
    """handlers_test.go:2200-2460 — jet + ancestors + descendants"""
    status, body = get(base_url, "/api/v1/jets/000/jet-drops")
    assert status == 200
    # "000" itself (P0+20) plus its ancestor "00" (P0+30)
    got = {d["jet_drop_id"] for d in body["result"]}
    assert got == {f"000:{P0 + 20}", f"00:{P0 + 30}"}
    assert body["total"] == 2


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------


def test_search_pulse(base_url):
    """handlers_test.go:1250-1264"""
    status, body = get(base_url, f"/api/v1/search?value={P0 + 20}")
    assert status == 200
    assert body == {"type": "pulse", "meta": {"pulse_number": P0 + 20}}


def test_search_pulse_wrong_value(base_url):
    """handlers_test.go:1266-1279 (MinTimePulse-1)"""
    status, body = get(base_url, "/api/v1/search?value=65535")
    assert status == 400
    assert body == bad_request(
        [("value", "not valid pulse number")], message_field="description"
    )


def test_search_jet_drop(base_url):
    """handlers_test.go:1281-1296 — no storage check, echoes the id"""
    status, body = get(base_url, "/api/v1/search?value=101010:4000999")
    assert status == 200
    assert body == {"type": "jet-drop", "meta": {"jet_drop_id": "101010:4000999"}}


def test_search_object(base_url):
    """handlers_test.go:1298-1312 — object ref answers as lifeline"""
    status, body = get(base_url, f"/api/v1/search?value={base58_encode(OBJ_REF)}")
    assert status == 200
    assert body == {
        "type": "lifeline",
        "meta": {"object_reference": base58_encode(OBJ_REF)},
    }


def test_search_record(base_url):
    """handlers_test.go:1314-1345 — record ref answers index + object"""
    status, body = get(base_url, f"/api/v1/search?value={base58_encode(REC_REF)}")
    assert status == 200
    assert body == {
        "type": "record",
        "meta": {
            "index": f"{P0 + 20}:1",
            "object_reference": base58_encode(OBJ_REF),
        },
    }


def test_search_record_not_exist(base_url):
    """handlers_test.go:1347-1360"""
    status, body = get(base_url, f"/api/v1/search?value={base58_encode(LOST_REF)}")
    assert status == 400
    assert body == bad_request(
        [("value", "record reference not found")], message_field="description"
    )


def test_search_no_value(base_url):
    """handlers_test.go:1362-1368"""
    status, _ = get(base_url, "/api/v1/search")
    assert status == 400


def test_search_invalid_value(base_url):
    """handlers_test.go:1370-1383"""
    status, body = get(base_url, "/api/v1/search?value=not_valid_value")
    assert status == 400
    assert body == bad_request(
        [("value", "is neither pulse number, jet drop id nor reference")],
        message_field="description",
    )


# ---------------------------------------------------------------------------
# Continuous serving metrics (round 4; reference parity:
# etl/storage/storage_metrics.go:1-125 — per-op Prometheus timers
# exported in normal operation, and load/run_configs scrape them)
# ---------------------------------------------------------------------------


def test_metrics_endpoints_observe_every_request(base_url):
    import urllib.request

    # traffic across two endpoints, including a 400 (validation
    # failures count as served requests, NOT handler errors)
    get(base_url, f"/api/v1/pulses/{P0}")
    get(base_url, f"/api/v1/pulses/{P0}")
    get(base_url, "/api/v1/search?value=not_valid_value")  # -> 400

    status, snap = get(base_url, "/metrics.json")
    assert status == 200
    eps = snap["endpoints"]
    assert eps["get_pulse"]["count"] >= 2
    assert eps["get_pulse"]["errors"] == 0
    assert eps["get_pulse"]["p50_ms"] > 0
    assert eps["get_pulse"]["max_ms"] >= eps["get_pulse"]["p50_ms"]
    assert eps["search"]["count"] >= 1
    assert eps["search"]["errors"] == 0  # 400 is not a server error
    # spark stage totals present (None allowed when the UI is off)
    assert "spark_stage_totals" in snap

    with urllib.request.urlopen(base_url + "/metrics", timeout=30) as resp:
        assert resp.status == 200
        text = resp.read().decode()
    assert "block_explorer_get_pulse_duration_seconds_count" in text
    assert 'block_explorer_get_pulse_duration_seconds{quantile="0.5"}' in text
    assert "block_explorer_search_errors_total 0" in text
