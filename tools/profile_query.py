"""Per-stage profiler for catalog queries (optimization round tooling).

Runs the named queries with the Spark UI enabled, then pulls the REST
API for per-stage executorRunTime / shuffle bytes so the expensive
stage of a slow query is identifiable without guessing (guide §1/§7.1
— "measure first", empirically, at stage granularity).

Usage:
  python tools/profile_query.py [--sf DIR] [--runs N] [--plan] q1 [q2 ...]

Prints, per query: wall per run, then the top stages of the LAST run
by executorRunTime with name, task count, I/O and shuffle volumes.
Nothing here is on any query path — measurement only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from env_event_stream_spark.session import get_spark  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plan", action="store_true",
                    help="also print explain(formatted) of each query")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_EXTRA_CONF", "spark.ui.enabled=true")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("profile")
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app_id = sc.applicationId

    # warm-up (JVM, parquet footers, Python workers) — same as bench.py
    qs["evt_type_counts"](spark, args.sf).count()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (b for b in it), "x int"
    ).count()

    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        if args.plan:
            df = qs[name](spark, args.sf)
            print(f"==== PLAN {name} ====")
            df.explain("formatted")
        walls = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            before = {s["stageId"] for s in _api(
                base, f"/applications/{app_id}/stages?status=complete")}
            sc.setJobDescription(f"profile:{name}:run{i}")
            t0 = time.time()
            qs[name](spark, args.sf).count()
            walls.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        stages = _api(base, f"/applications/{app_id}/stages?status=complete")
        new = [s for s in stages if s["stageId"] not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"==== {name}  walls={walls}  stages_last_run={len(new)} ====")
        tot_run = sum(s.get("executorRunTime", 0) for s in new)
        tot_cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e6
        print(f"  sum executorRunTime={tot_run/1000.0:.2f}s "
              f"cpuTime={tot_cpu/1000.0:.2f}s")
        for s in new[: args.top]:
            nm = s.get("name", "")[:70]
            print(
                f"  [{s['stageId']:4d}] run={s.get('executorRunTime', 0)/1000.0:6.2f}s"
                f" cpu={s.get('executorCpuTime', 0)/1e9:6.2f}s"
                f" tasks={s.get('numCompleteTasks', s.get('numTasks', 0)):3d}"
                f" in={s.get('inputBytes', 0)>>20}M"
                f" sr={s.get('shuffleReadBytes', 0)>>20}M"
                f" sw={s.get('shuffleWriteBytes', 0)>>20}M  {nm}"
            )


if __name__ == "__main__":
    main()
