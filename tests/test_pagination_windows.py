from __future__ import annotations

from block_explorer_spark.operators import pagination as Pg
from block_explorer_spark.operators import windows as W


def test_paginate_limit_offset(spark):
    df = spark.range(0, 50).withColumnRenamed("id", "k")
    page = Pg.paginate(df, [("k", True)], limit=10, offset=0).collect()
    assert [r.k for r in page] == list(range(10))
    page2 = Pg.paginate(df, [("k", True)], limit=10, offset=10).collect()
    assert [r.k for r in page2] == list(range(10, 20))
    desc = Pg.paginate(df, [("k", False)], limit=3, offset=2).collect()
    assert [r.k for r in desc] == [47, 46, 45]


def test_paginate_with_total(spark):
    df = spark.range(0, 25).withColumnRenamed("id", "k")
    page, total = Pg.paginate_with_total(df, [("k", True)], limit=7, offset=21)
    assert total == 25
    assert [r.k for r in page.collect()] == [21, 22, 23, 24]


def test_chain_repair_sentinels(spark):
    # pulses 10,20,40 (30 missing): 20.next->30 unsaved => -1; 40.prev->30 => -1
    rows = [
        (10, 0, 20),
        (20, 10, 30),
        (40, 30, 50),
    ]
    df = spark.createDataFrame(rows, ["pulse_number", "prev_pulse_number", "next_pulse_number"])
    got = {r.pulse_number: r for r in W.chain_repair(df).collect()}
    assert got[10].prev_pulse_number == -1  # no saved predecessor
    assert got[10].next_pulse_number == 20
    assert got[20].prev_pulse_number == 10
    assert got[20].next_pulse_number == -1  # 40 != stored link 30
    assert got[40].prev_pulse_number == -1
    assert got[40].next_pulse_number == -1  # last row


def test_gap_flags(spark):
    df = spark.createDataFrame([(10,), (20,), (40,), (50,)], ["pulse_number"])
    got = {r.pulse_number: r.has_gap for r in W.gap_flags(df, "pulse_number", 10).collect()}
    assert got == {10: False, 20: False, 40: True, 50: False}
