"""Table loaders over a scale-factor directory.

Every loader returns a lazily-planned DataFrame reading one parquet
table; filters/projections applied downstream reach the scan via
Catalyst pushdown (check with .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from block_explorer_spark import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in schemas.TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all driver tables as temp views for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def load_gbe_table(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Read a GBE core table (pulses/jet_drops/records) with its pinned schema."""
    schema = {
        "pulses": schemas.PULSES,
        "jet_drops": schemas.JET_DROPS,
        "records": schemas.RECORDS,
    }[name]
    return spark.read.schema(schema).parquet(os.path.join(path, name))
