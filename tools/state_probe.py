"""Streaming STATE-SIZE ladder probe (VERDICT r15 task 1).

The wall-time ladder (tools/scale_probe.py, SCALING.md §8) answers
"how does elapsed time grow with volume"; the 100 TB streaming
question is "how does checkpointed STATE grow". This probe runs the
chosen streaming catalog queries at 1x (BASE) and Nx (the
scale_probe-built copies) and reports the final micro-batch's state
metrics from streaming_queries.STATE_PROGRESS — numRowsTotal,
memoryUsedBytes, n_batches per state operator — so each state class's
claimed bound can be pinned with measured numbers:

- keyed fold            evt_live_fold_stream      O(aggregate keys = users)
- bucketed automaton    evt_stream_cep_funnel     rows O(64 buckets), bytes O(users)
- complete-mode grid    evt_stream_hw_forecast    O(types x days) — volume-invariant
- register grid         evt_stream_rolling_wau    O(days x 64 registers) — volume-invariant
- bounded k-min (heap)  evt_stream_kmv_users      O(types x k=128) — volume-invariant
- Misra-Gries counters  doc_stream_heavy_hitters  O(buckets x capacity) — volume-invariant

Usage: SPARK_GRAFT_PROBE_COPIES=8 python tools/state_probe.py [query ...]
Reuses scale_probe's build (key-domain shifts; the Nx copies multiply
users/docs but keep the day calendar, so grid/register/bounded rows
should stay FLAT while keyed-fold rows track the key count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from env_event_stream_spark.session import get_spark

DEFAULT_QUERIES = [
    "evt_live_fold_stream",
    "evt_stream_cep_funnel",
    "evt_stream_hw_forecast",
    "evt_stream_rolling_wau",
    "evt_stream_kmv_users",
    "doc_stream_heavy_hitters",
]


def run_rung(qs, names, spark, sf_dir: str) -> dict:
    import env_event_stream_spark.streaming_queries as SQ

    out = {}
    for n in names:
        SQ.STATE_PROGRESS.clear()
        t0 = time.time()
        qs[n](spark, sf_dir).count()
        wall = time.time() - t0
        spark.catalog.clearCache()
        # one catalog query may run several streams (e.g. a live
        # matview + an audit twin); record them all, keyed by prefix
        out[n] = {
            "wall_sec": round(wall, 2),
            "streams": {
                k: v for k, v in sorted(SQ.STATE_PROGRESS.items())
            },
        }
    return out


def main() -> None:
    import __spark_entry__ as entrymod
    from tools import scale_probe

    qs = entrymod.queries()
    names = sys.argv[1:] or DEFAULT_QUERIES
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("state-probe")
    scale_probe.build(spark)
    base = run_rung(qs, names, spark, scale_probe.BASE)
    scaled = run_rung(qs, names, spark, scale_probe.OUT)
    report = {
        "copies": scale_probe.COPIES,
        "base": base,
        "scaled": scaled,
    }
    print(json.dumps(report, indent=1))
    hdr = (
        f"{'query/stream':45s} {'rows 1x':>9s} "
        f"{'rows ' + str(scale_probe.COPIES) + 'x':>9s} "
        f"{'bytes 1x':>10s} {'bytes Nx':>10s}"
    )
    print(hdr)
    for n in names:
        b, sc = base[n]["streams"], scaled[n]["streams"]
        for prefix in sorted(set(b) | set(sc)):
            for i, (so_b, so_s) in enumerate(
                zip(
                    b.get(prefix, {}).get("stateOperators", []),
                    sc.get(prefix, {}).get("stateOperators", []),
                )
            ):
                print(
                    f"{n + '/' + prefix + '#' + str(i):45s} "
                    f"{so_b['numRowsTotal']:>9d} "
                    f"{so_s['numRowsTotal']:>9d} "
                    f"{so_b['memoryUsedBytes']:>10d} "
                    f"{so_s['memoryUsedBytes']:>10d}"
                )


if __name__ == "__main__":
    main()
