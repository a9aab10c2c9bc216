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


def require_default_broadcast(spark):
    """Plan-shape pins assume size-based broadcast is available; under
    the `nobroadcast` invariance sweep (autoBroadcastJoinThreshold=-1)
    every broadcast leg legitimately becomes a shuffle, so the pinned
    shapes don't apply — skip rather than fail, and say why."""
    thr = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", ""))
    if thr.removesuffix("b").lstrip("-").isdigit() and int(thr.removesuffix("b")) <= 0:
        pytest.skip("size-based broadcast disabled (nobroadcast sweep) — "
                    "plan shapes pinned under the default config only")


def require_wholestage_codegen(spark):
    """Codegen-marker pins are vacuous under the `nocodegen` sweep."""
    if str(spark.conf.get("spark.sql.codegen.wholeStage", "true")).lower() == "false":
        pytest.skip("whole-stage codegen disabled (nocodegen sweep)")
