import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="cfes-tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
