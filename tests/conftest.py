from __future__ import annotations

import pytest

from lp_etl_plugins_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("lp_etl_plugins_spark-tests", cpus=8)
    spark.sparkContext.setLogLevel("WARN")
    yield spark
