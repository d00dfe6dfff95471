from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from file_db_spark.session import get_spark

    s = get_spark(
        app_name="file_db_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s


@pytest.fixture()
def sf_dir() -> str:
    return os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
