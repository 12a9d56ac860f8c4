from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

from tiny_md_hbase_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tiny-md-hbase-spark-tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
