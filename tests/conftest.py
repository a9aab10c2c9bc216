from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from env_event_stream_spark.session import get_spark
from env_event_stream_spark.tables import prepare_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    prepare_session(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
