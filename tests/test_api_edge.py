"""API-edge validation + mapper tests.

Pins the reference's error taxonomy ((property, failure_reason) pairs,
api/handlers.go) and the JSON rendering rules (api/mappers.go):
base64 binaries, composite ids, -1 sentinels omitted, empty bytes as
NULL — the assertions handlers_test.go makes over HTTP, minus HTTP.
"""

from __future__ import annotations

import base64

import pytest

from block_explorer_spark import api
from block_explorer_spark.functions.refs import base58_encode


def test_limit_offset_defaults():
    limit, offset, failures = api.check_limit_offset(None, None)
    assert (limit, offset, failures) == (20, 0, [])


@pytest.mark.parametrize("bad", [0, -5, 1001])
def test_limit_out_of_range(bad):
    _, _, failures = api.check_limit_offset(bad, None)
    assert failures == [api.ValidationFailure("limit", "should be in range [1, 1000]")]


def test_offset_negative():
    _, _, failures = api.check_limit_offset(10, -1)
    assert failures == [api.ValidationFailure("offset", "should not be negative")]


def test_limit_boundaries_ok():
    assert api.check_limit_offset(1, 0)[2] == []
    assert api.check_limit_offset(1000, 0)[2] == []


def test_sort_by_index():
    assert api.check_sort_by_index(None) == (False, [])
    assert api.check_sort_by_index("index_asc") == (True, [])
    assert api.check_sort_by_index("index_desc") == (False, [])
    asc, failures = api.check_sort_by_index("bogus")
    assert failures[0].property == "sort_by"
    assert "index_desc" in failures[0].failure_reason


def test_sort_by_pulse():
    assert api.check_sort_by_pulse("pulse_number_asc,jet_id_desc") == (True, [])
    assert api.check_sort_by_pulse("pulse_number_desc,jet_id_asc") == (False, [])
    _, failures = api.check_sort_by_pulse("nope")
    assert failures[0].property == "sort_by"


def test_pulse_number_validity():
    assert not api.is_valid_pulse_number(65535)
    assert api.is_valid_pulse_number(65536)
    assert api.is_valid_pulse_number(4294967294)
    assert not api.is_valid_pulse_number(4294967295)
    assert api.check_pulse_number(1, "pulse") == [api.ValidationFailure("pulse", "invalid value")]


def test_check_reference_errors():
    with pytest.raises(api.ValidationError) as e:
        api.check_reference("   ")
    assert e.value.failures[0].failure_reason == "empty reference"
    with pytest.raises(api.ValidationError) as e:
        api.check_reference("not-base58-0OIl")
    assert e.value.failures[0].failure_reason == "wrong format"


def test_check_reference_roundtrip():
    raw = b"\x01\x02\x03\xff"
    assert api.check_reference(base58_encode(raw)) == raw
    # url-escaped input is unescaped first (X11)
    assert api.check_reference("%20" + base58_encode(raw) + "%20") == raw


def test_search_dispatch_pulse():
    assert api.search_dispatch("65537") == ("pulse", 65537)
    with pytest.raises(api.ValidationError) as e:
        api.search_dispatch("42")
    assert e.value.failures[0].failure_reason == "not valid pulse number"


def test_search_dispatch_jet_drop():
    kind, (jet, pn) = api.search_dispatch("0101:65537")
    assert kind == "jet-drop" and jet == "0101" and pn == 65537
    kind, (jet, pn) = api.search_dispatch("*:65537")
    assert kind == "jet-drop" and jet == "" and pn == 65537


def test_search_dispatch_reference_and_junk():
    raw = b"\x07" * 8
    kind, got = api.search_dispatch(base58_encode(raw))
    assert kind == "reference" and got == raw
    with pytest.raises(api.ValidationError) as e:
        api.search_dispatch("!!!not anything!!!")
    assert (
        e.value.failures[0].failure_reason
        == "is neither pulse number, jet drop id nor reference"
    )


def test_records_to_api_rendering(spark, flat_seed):
    _, _, records = flat_seed
    page = api.records_to_api(records).limit(5).collect()
    for row in page:
        # base64 round-trips
        if row["hash"] is not None:
            base64.b64decode(row["hash"])
        pn, order = row["index"].split(":")
        assert int(pn) == row["pulse_number"]
        assert row["jet_drop_id"].endswith(f":{row['pulse_number']}")
        # root jet renders "*" and never ""
        assert row["jet_id"] != ""


def test_render_refs_base58(spark, flat_seed):
    _, _, records = flat_seed
    page = [r.asDict() for r in api.records_to_api(records).limit(3).collect()]
    rendered = api.render_refs(page)
    for row in rendered:
        if row["reference"] is not None:
            assert isinstance(row["reference"], str)


def test_pulses_to_api_sentinels(spark):
    rows = [
        (65537, -1, 65547, True, True, 1, 2, 1000),
        (65547, 65537, -1, False, False, 3, 4, 1010),
    ]
    cols = [
        "pulse_number",
        "prev_pulse_number",
        "next_pulse_number",
        "is_complete",
        "is_sequential",
        "jet_drop_amount",
        "record_amount",
        "timestamp",
    ]
    df = spark.createDataFrame(rows, cols)
    got = {r["pulse_number"]: r for r in api.pulses_to_api(df).collect()}
    assert got[65537]["prev_pulse_number"] is None
    assert got[65537]["next_pulse_number"] == 65547
    assert got[65547]["next_pulse_number"] is None

def test_search_dispatch_strict_integer_syntax():
    """Python int() accepts underscore separators, unicode digits and
    surrounding whitespace that Go's strconv.Atoi rejects
    (api/handlers.go:458-469) — such values must fall through to
    jet-drop/reference parsing, not dispatch as pulse lookups."""
    for v in ("4_000_000", "٤٠٠٠٠٠٠", " 4000000"):
        with pytest.raises(api.ValidationError) as e:
            api.search_dispatch(v)
        assert (
            e.value.failures[0].failure_reason
            == "is neither pulse number, jet drop id nor reference"
        ), v
