"""Unit pins for bench.py's steady-merge fallback contract.

ADVICE r14: the rotating-half steady merge iterated the re-time DICT,
so an entry skipped by the pass-2 wall budget (absent, never run)
silently lost its pass-1 fallback — only a re-time that ran and
returned None fell back. merge_steady now iterates the SELECTED
names; these tests pin all four (ran-ok / ran-failed / budget-skipped
/ unselected) cases on both the core and rotating sides so the
silent-loss mode cannot reappear.
"""

from __future__ import annotations

import importlib.util
import os

_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)
_spec = importlib.util.spec_from_file_location("_bench_under_test", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_core_side_fallbacks():
    core = [("a", 5.0), ("b", 4.0), ("c", 3.0)]
    # a re-timed ok, b re-time FAILED (None), c budget-skipped (absent)
    steady = bench.merge_steady(core, {"a": 1.5, "b": None}, [], {},
                                two_pass_count=3)
    assert steady == {"a": 1.5, "b": 4.0, "c": 3.0}


def test_core_two_pass_count_cut():
    core = [("a", 5.0), ("b", 4.0), ("c", 3.0)]
    steady = bench.merge_steady(core, {"a": 1.5}, [], {}, two_pass_count=2)
    assert steady == {"a": 1.5, "b": 4.0}  # c not selected -> no entry


def test_rotating_budget_skip_keeps_pass1():
    """The ADVICE r14 case: a rotating re-time the wall budget never
    STARTED must still carry its pass-1 timing into steady."""
    rot = [("r1", 6.0), ("r2", 5.0), ("r3", 4.0)]
    # r1 re-timed ok, r2 ran and failed, r3 budget-skipped
    steady = bench.merge_steady([], {}, rot, {"r1": 2.0, "r2": None})
    assert steady == {"r1": 2.0, "r2": 5.0, "r3": 4.0}


def test_rotating_zero_timing_is_kept():
    # a legitimate 0.0 re-time is a value, not a miss
    steady = bench.merge_steady([], {}, [("r", 1.0)], {"r": 0.0})
    assert steady == {"r": 0.0}


def test_core_and_rotating_compose():
    steady = bench.merge_steady(
        [("a", 5.0)], {}, [("r", 6.0)], {}, two_pass_count=1
    )
    assert steady == {"a": 5.0, "r": 6.0}
