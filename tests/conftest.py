from __future__ import annotations

import pytest

from pyspark.sql import SparkSession

from block_explorer_spark import schemas
from block_explorer_spark.session import builder
from block_explorer_spark.sources import generators as gen


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = (
        builder("bes-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="session")
def flat_seed(spark):
    pulses, drops, records = gen.make_flat_seed(seed=7)
    return (
        spark.createDataFrame(pulses, schemas.PULSES),
        spark.createDataFrame(drops, schemas.JET_DROPS),
        spark.createDataFrame(records, schemas.RECORDS),
    )
