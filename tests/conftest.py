from __future__ import annotations

import os

import pytest

from lion_parcel_etl_spark.session import get_spark

REFERENCE = "/root/reference"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lpe-tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "4",
    })
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
