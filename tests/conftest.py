import os

import pytest

os.environ.setdefault("TZ", "UTC")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from shaper_spark.session import get_spark, register_sf_tables

    spark = get_spark("shaper_spark_tests", cpus=4)
    register_sf_tables(spark, SF_DIR)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
