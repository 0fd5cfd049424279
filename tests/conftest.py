from __future__ import annotations

import os

import pytest

from mapreduce_framework_simple_spark.session import get_session

# overridable for checkouts where the driver-generated fixtures live
# elsewhere; the isdir guard turns a missing corpus into ONE clear exit
# instead of hundreds of opaque AnalysisExceptions inside load_table
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

if not os.path.isdir(SF_DIR):
    pytest.exit(
        f"test fixture corpus not found at {SF_DIR}; generate the testdata "
        "or point SPARK_GRAFT_TEST_SF_DIR at an sf directory",
        returncode=4,
    )


@pytest.fixture(scope="session")
def spark():
    s = get_session("mfss-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
