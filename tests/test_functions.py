from __future__ import annotations

from pyspark.sql import functions as F

from block_explorer_spark.functions import encode, jets, refs


def test_jet_parents_siblings():
    assert jets.jet_parents("010") == ["", "0", "01", "010"]
    assert jets.jet_parents("") == [""]
    assert jets.jet_siblings("01") == ["01", "010", "011", "0"]
    assert jets.sibling_exprs("") == ["", "0", "1"]
    assert jets.invert_last_bit("010") == "011"
    assert jets.invert_last_bit("") == ""


def test_trie_covered():
    assert jets.trie_covered([""])
    assert jets.trie_covered(["0", "1"])
    assert jets.trie_covered(["0", "10", "11"])
    assert jets.trie_covered(["00", "01", "10", "110", "111"])
    assert not jets.trie_covered(["0"])
    assert not jets.trie_covered(["0", "10"])
    assert not jets.trie_covered([])
    assert not jets.trie_covered(["00", "01", "10", "110"])


def test_jet_drop_id_roundtrip():
    assert jets.parse_jet_drop_id("*:4000") == ("", 4000)
    assert jets.parse_jet_drop_id("0101:65537") == ("0101", 65537)
    assert jets.is_valid_jet_id("*") and jets.is_valid_jet_id("0101")
    assert not jets.is_valid_jet_id("012")
    assert not jets.is_valid_jet_id("")


def test_jet_cols(spark):
    df = spark.createDataFrame([("", 100), ("01", 200)], ["jet_id", "pulse_number"])
    got = df.select(
        jets.jet_drop_id_col().alias("jdid"),
        jets.jet_parents_col().alias("parents"),
        jets.jet_siblings_col().alias("sibs"),
    ).collect()
    assert got[0].jdid == "*:100"
    assert got[1].jdid == "01:200"
    assert got[1].parents == ["", "0", "01"]
    assert sorted(got[1].sibs) == ["0", "01", "010", "011"]
    assert sorted(got[0].sibs) == ["", "0", "1"]


def test_base58_roundtrip():
    for b in (b"", b"\x00\x00abc", b"hello world", bytes(range(32))):
        assert refs.base58_decode(refs.base58_encode(b)) == b


def test_null_if_empty_bytes(spark):
    df = spark.createDataFrame(
        [(b"",), (b"\x00\x00",), (b"\x01",), (None,)], "c: binary"
    )
    got = [r.v for r in df.select(refs.null_if_empty_bytes("c").alias("v")).collect()]
    assert got[0] is None and got[1] is None and got[3] is None
    assert bytes(got[2]) == b"\x01"


def test_record_index_and_pulse_validity(spark):
    df = spark.createDataFrame([(100, 5)], ["pulse_number", "order"])
    assert df.select(encode.record_index_col().alias("i")).collect()[0].i == "100:5"
    assert encode.parse_record_index("100:5") == (100, 5)
    assert encode.is_valid_pulse_number(65536)
    assert not encode.is_valid_pulse_number(65535)
    assert not encode.is_valid_pulse_number(4294967295)


def test_nanos_to_seconds(spark):
    df = spark.createDataFrame([(1_600_000_000_123_456_789,)], "ts_nanos: long")
    assert df.select(encode.nanos_to_seconds("ts_nanos").alias("s")).collect()[0].s == 1_600_000_000


def test_decode_platform_jet_id():
    assert jets.decode_platform_jet_id(b"\xa0", 4) == "1010"
    assert jets.decode_platform_jet_id(b"\xff\x00", 10) == "1111111100"


def test_nanos_to_seconds_exact_int64_division(spark):
    """ns epochs (~1.6e18) exceed double's 2^53 integer range: the old
    `(c / 1e9).cast(long)` rounded `…999999999` up one whole second.
    Must match the reference's int64 division
    (instrumentation/converter/converter.go:34-41)."""
    vals = [
        (1_600_000_000_000_000_000,),
        (1_600_000_000_999_999_999,),
        (9_000_000_001_999_999_999,),
    ]
    df = spark.createDataFrame(vals, "ts_nanos: long")
    got = [r.s for r in df.select(encode.nanos_to_seconds("ts_nanos").alias("s")).collect()]
    assert got == [1_600_000_000, 1_600_000_000, 9_000_000_001]
