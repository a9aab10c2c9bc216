"""SparkSession factory contract: the SPARK_GRAFT_EXTRA_CONF override
hook used by the catalog-wide invariance sweeps (non-UTC timezone,
tiny Arrow batches, AQE off, broadcast disabled).

Only the parsing is unit-tested: getOrCreate() honors configs solely
on first creation, so an in-process "does the config apply" test
would silently assert against the shared test session. The sweeps
themselves run check.py in a fresh interpreter.
"""

from __future__ import annotations

from env_event_stream_spark.session import extra_conf_pairs


def test_extra_conf_pairs_parses_k_v_list():
    assert extra_conf_pairs(
        "spark.sql.session.timeZone=America/New_York;"
        "spark.sql.execution.arrow.maxRecordsPerBatch=7"
    ) == [
        ("spark.sql.session.timeZone", "America/New_York"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "7"),
    ]


def test_extra_conf_pairs_tolerates_blanks_and_whitespace():
    assert extra_conf_pairs("") == []
    assert extra_conf_pairs(" ; ;") == []
    assert extra_conf_pairs(" a = b ; ") == [("a", "b")]


def test_extra_conf_pairs_value_may_contain_equals():
    # JVM-option-style values keep everything after the first '='
    assert extra_conf_pairs("spark.x=-Da=b") == [("spark.x", "-Da=b")]


def test_extra_conf_pairs_rejects_malformed_entries():
    # Spark accepts unknown conf keys silently, so a typo here would
    # run the DEFAULT config while the sweep reports green — raise
    import pytest

    for bad in ("spark.sql.ansi.enabled:false", "a=b,c=d;x", "=v", "k="):
        with pytest.raises(ValueError):
            extra_conf_pairs(bad)
