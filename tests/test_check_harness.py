"""The oracle-harness comparison must compare timestamp INSTANTS,
not client-local renderings (tools/check.py norm/rowset).

PySpark's collect() returns TimestampType as naive datetimes in the
client process's LOCAL timezone; TIMESTAMP_NTZ collects as wall-clock
naive; DuckDB naive TIMESTAMPs never shift. Under the tz invariance
sweep (TZ=America/New_York) a rendering-naive compare reported 24
false mismatches — and a blanket shift then broke the one NTZ column
(o_orderdate). These tests pin the schema-aware rule in a shifted-TZ
subprocess-free way (tzset within the test, restored after).
"""

from __future__ import annotations

import contextlib
import datetime as dt
import importlib.util
import os
import time

import pytest

# importlib on the file path, NOT sys.path mutation: 'check' is a
# generic name an installed package could claim, and a sys.path
# insert would shadow it for the REST of the pytest session
# (ADVICE r12)
_check_path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "check.py",
)
_spec = importlib.util.spec_from_file_location("_check_under_test", _check_path)
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
norm, rowset = _check.norm, _check.rowset


@contextlib.contextmanager
def _tz(name):
    """Set the process timezone for the duration, restoring after —
    the single save/restore path every TZ-sensitive test here uses."""
    if not hasattr(time, "tzset"):
        pytest.skip("tzset not available")
    old = os.environ.get("TZ")
    os.environ["TZ"] = name
    time.tzset()
    try:
        yield
    finally:
        if old is None:
            del os.environ["TZ"]
        else:
            os.environ["TZ"] = old
        time.tzset()


@pytest.fixture
def new_york_tz():
    with _tz("America/New_York"):
        yield


def test_instant_column_shifts_local_to_utc(new_york_tz):
    # Spark collects the instant 1996-10-11T00:00Z as 20:00 EDT naive
    local = dt.datetime(1996, 10, 10, 20, 0)  # EDT = UTC-4
    assert norm(local, local_dt=True) == dt.datetime(1996, 10, 11, 0, 0)


def test_ntz_column_is_not_shifted(new_york_tz):
    wall = dt.datetime(1996, 10, 11, 0, 0)
    assert norm(wall, local_dt=False) == wall


def test_aware_datetime_canonicalizes_to_utc_naive():
    aware = dt.datetime(2025, 6, 1, 8, 0, tzinfo=dt.timezone(dt.timedelta(hours=-4)))
    assert norm(aware) == dt.datetime(2025, 6, 1, 12, 0)


def test_rowset_applies_per_column_flags(new_york_tz):
    cols = ["b_instant", "a_ntz"]
    rows = [(dt.datetime(2025, 6, 1, 8, 0), dt.datetime(2025, 6, 1, 8, 0))]
    # columns are sorted by name before hashing (a_ntz first); only
    # the instant column shifts (EDT 08:00 -> 12:00Z)
    assert rowset(rows, cols, local_dt=[True, False]) == [
        (dt.datetime(2025, 6, 1, 8, 0), dt.datetime(2025, 6, 1, 12, 0))
    ]


def test_rowset_default_no_shift_matches_driver(new_york_tz):
    # DuckDB side (local_dt=None): naive values pass through untouched
    rows = [(dt.datetime(2025, 6, 1, 8, 0),)]
    assert rowset(rows, ["t"]) == [(dt.datetime(2025, 6, 1, 8, 0),)]


def test_utc_environment_shift_is_noop():
    with _tz("UTC"):
        v = dt.datetime(2025, 6, 1, 8, 0)
        assert norm(v, local_dt=True) == v
