from __future__ import annotations

from pyspark.sql import functions as F

from block_explorer_spark.operators import filters as Fl


def test_range_4way_combinations(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "pulse_number")
    assert Fl.apply_filters(df, Fl.range_4way("pulse_number", gt=10, lt=20)).count() == 9
    assert Fl.apply_filters(df, Fl.range_4way("pulse_number", gte=10, lte=20)).count() == 11
    assert Fl.apply_filters(df, Fl.range_4way("pulse_number")).count() == 100
    assert Fl.apply_filters(df, Fl.range_4way("pulse_number", gte=90)).count() == 10


def test_keyset_cursor_asc_desc(spark):
    rows = [(p, o) for p in (1, 2, 3) for o in (1, 2, 3)]
    df = spark.createDataFrame(rows, ["pulse_number", "order"])
    asc = df.filter(Fl.keyset_cursor("pulse_number", "order", 2, 2, ascending=True))
    assert asc.count() == 5  # (2,2),(2,3),(3,*)
    desc = df.filter(Fl.keyset_cursor("pulse_number", "order", 2, 2, ascending=False))
    assert desc.count() == 5  # (2,2),(2,1),(1,*)


def test_jet_hierarchy_matches_ancestors_and_descendants(spark):
    df = spark.createDataFrame(
        [("",), ("0",), ("01",), ("010",), ("011",), ("1",), ("10",)], ["jet_id"]
    )
    from block_explorer_spark.functions.jets import jet_parents

    pred = Fl.jet_hierarchy("01", jet_parents("01")[:-1])
    got = sorted(r.jet_id for r in df.filter(pred).collect())
    assert got == ["", "0", "01", "010", "011"]


def test_in_list_and_equality(spark, flat_seed):
    _, _, records = flat_seed
    types = ["state", "result"]
    got = records.filter(Fl.in_list("type", types))
    assert got.filter(~F.col("type").isin(types)).count() == 0
    one = records.limit(1).collect()[0]
    point = records.filter(
        Fl.equality(jet_id=one.jet_id, pulse_number=one.pulse_number)
    )
    assert point.count() >= 1
