"""Source-format breadth: the engine's queries are format-agnostic —
the same DataFrame plan over parquet, CSV, JSON, and ORC sources
produces identical results when read with the pinned schema (never
schema inference in production paths: inference costs an extra full
pass at 100 TB and can silently widen types)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def sample(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(*[f.name for f in SCHEMA.fields])
        .limit(2000)
        .cache()
    )


def _agg(df):
    return (
        df.filter(F.col("l_returnflag") == "R")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .collect()[0]
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip_identical_results(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    writer = sample.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
        back = spark.read.schema(SCHEMA).option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
        back = spark.read.schema(SCHEMA).json(path)
    else:
        writer.orc(path)
        back = spark.read.orc(path)
    expected = _agg(sample)
    got = _agg(back)
    assert (got["n"], got["revenue"], got["qty"]) == (
        expected["n"],
        expected["revenue"],
        expected["qty"],
    )


def test_csv_without_schema_would_widen_types(spark, sample, tmp_path):
    """The reason production reads pin schemas: inferred CSV typing is
    not stable (longs can come back as ints/strings depending on
    content) — pinned-schema reads are identical by construction."""
    path = str(tmp_path / "csv2")
    sample.write.mode("overwrite").option("header", True).csv(path)
    pinned = spark.read.schema(SCHEMA).option("header", True).csv(path)
    assert [f.dataType for f in pinned.schema.fields] == [f.dataType for f in SCHEMA.fields]
