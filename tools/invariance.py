"""Catalog-wide invariance sweeps, reproducibly.

Each preset re-runs the full DuckDB-oracle harness (tools/check.py) in
a FRESH interpreter under one deliberately hostile configuration. The
catalog's determinism claims — "identical results on any partition
count, any ANSI mode, any caller locale, any Arrow batch size, with or
without broadcast joins" — are only claims until a sweep has run; this
file is the sweep.

Usage:
    python tools/invariance.py <preset> [sf_dir] [query ...]
    python tools/invariance.py <preset> --pytest [pytest args ...]
    python tools/invariance.py --list

``--pytest`` runs the full behavioral suite instead of the oracle
catalog under the same preset env (the r12 "gate escalations" —
pytest at local[5], under TZ=America/New_York, arrow7, … — were
hand-typed exports; this packages them). Extra args pass through to
pytest (default: ``tests/ -q``). Plan-shape pins self-skip under the
configs that invalidate them (conftest.require_default_broadcast and
the codegen-marker pins), so a sweep reports behavioral failures
only.

Presets:
    small        local[5], 5 shuffle partitions (partition-count
                 invariance — the r11 gate, now one command)
    ansioff      spark.sql.ansi.enabled=false (Spark 4 flips the
                 default to true; results must not depend on it)
    tz           process-wide TZ=America/New_York — catches BOTH a
                 JVM session-timezone dependence that
                 tables.prepare_session failed to pin AND any
                 driver-side Python localtime use
                 (datetime.fromtimestamp et al). DuckDB runs in the
                 same shifted process, so an oracle with a hidden
                 locale dependence fails too instead of masking.
    arrow7       spark.sql.execution.arrow.maxRecordsPerBatch=7 —
                 every mapInPandas/applyInPandas sees many tiny
                 batches; an operator that aggregates within a batch
                 assuming "one batch per partition/group" breaks here
                 and nowhere else until 100 TB.
    nobroadcast  spark.sql.autoBroadcastJoinThreshold=-1 — size-based
                 broadcast off; results must survive every join
                 degrading to SMJ/BNLJ (explicit F.broadcast() hints
                 still honored — those are deliberate).
    nocodegen    spark.sql.codegen.wholeStage=false — interpreted
                 expression evaluation must agree with codegen.
    novecread    spark.sql.parquet.enableVectorizedReader=false —
                 the row-by-row parquet read path must agree with the
                 vectorized one (the TIMESTAMP(NANOS) events table
                 rides nanosAsLong, where reader paths have
                 historically diverged).
    composite    ALL seven hostile axes AT ONCE (NY timezone +
                 local[5]/5 shuffle partitions + ANSI off + Arrow
                 batch 7 + broadcast threshold -1 + codegen off +
                 row-by-row parquet reader). Config interactions are
                 their own failure class; the per-axis sweeps prove
                 each invariance in isolation, this one pins that
                 they compose. First run by hand at the r12 close
                 (NEXT.md); packaged here so it can't rot.
    driversim    a PLAIN SparkSession with STOCK defaults (ANSI on,
                 200 shuffle partitions, 10 MB broadcast, default
                 heap — none of get_spark's tuning): proves every
                 catalog callable self-pins its required confs via
                 tables.prepare_session regardless of who built the
                 session, which is exactly the driver's situation.
                 First run by hand as a 12-query probe at the r12
                 close; packaged here catalog-wide. SCALE SCOPE:
                 sf0.01 (the driver's own gate scale). At sf0.1 the
                 stock 1 GB heap OOMs mid-suite (32 concurrent local
                 tasks x sort buffers in one JVM — measured r13,
                 java.lang.OutOfMemoryError in the sorter spill
                 reader, then connection-refused for the rest): an
                 infrastructure sizing failure, not conf
                 sensitivity; a real deployment sizes the heap to
                 the data. Use `composite` for hostile-conf coverage
                 at sf0.1 — it runs under get_spark's tuned heap.

Inherited SPARK_GRAFT_EXTRA_CONF, TZ, SPARK_GRAFT_PLAIN_SESSION are
CLEARED before the preset applies (a stale export must not compose
into a differently labeled gate); SPARK_GRAFT_CPUS passes through —
it only sizes local parallelism, which the `small` gate itself
proves result-invariant — and is echoed in the banner when set.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRESETS: dict[str, dict[str, str]] = {
    "small": {"SPARK_GRAFT_CPUS": "5"},
    "ansioff": {
        "SPARK_GRAFT_EXTRA_CONF": "spark.sql.ansi.enabled=false",
    },
    "tz": {"TZ": "America/New_York"},
    "arrow7": {
        "SPARK_GRAFT_EXTRA_CONF": (
            "spark.sql.execution.arrow.maxRecordsPerBatch=7"
        ),
    },
    "nobroadcast": {
        "SPARK_GRAFT_EXTRA_CONF": "spark.sql.autoBroadcastJoinThreshold=-1",
    },
    "nocodegen": {
        "SPARK_GRAFT_EXTRA_CONF": "spark.sql.codegen.wholeStage=false",
    },
    "novecread": {
        # the row-by-row parquet read path must agree with the
        # vectorized one — this engine leans on nanosAsLong for the
        # TIMESTAMP(NANOS) events table, where reader paths have
        # historically diverged
        "SPARK_GRAFT_EXTRA_CONF": (
            "spark.sql.parquet.enableVectorizedReader=false"
        ),
    },
    # every hostile axis above AT ONCE — the per-axis sweeps prove
    # each invariance in isolation; this pins that they compose
    # (config interactions are their own failure class)
    "composite": {
        "TZ": "America/New_York",
        "SPARK_GRAFT_CPUS": "5",
        "SPARK_GRAFT_EXTRA_CONF": (
            "spark.sql.ansi.enabled=false"
            ";spark.sql.execution.arrow.maxRecordsPerBatch=7"
            ";spark.sql.autoBroadcastJoinThreshold=-1"
            ";spark.sql.codegen.wholeStage=false"
            ";spark.sql.parquet.enableVectorizedReader=false"
        ),
    },
    # stock-defaults session (see module docstring): get_spark builds
    # a bare master+appName SparkSession, no tuning, no EXTRA_CONF
    "driversim": {"SPARK_GRAFT_PLAIN_SESSION": "1"},
}


def main() -> int:
    argv = sys.argv[1:]
    if not argv or argv[0] in ("--list", "-l", "--help", "-h"):
        for name, env in PRESETS.items():
            print(f"{name}: {env}")
        return 0
    preset = argv[0]
    if preset not in PRESETS:
        print(f"unknown preset {preset!r}; one of {sorted(PRESETS)}")
        return 2
    env = dict(os.environ)
    for knob in ("SPARK_GRAFT_EXTRA_CONF", "TZ", "SPARK_GRAFT_PLAIN_SESSION"):
        if knob not in PRESETS[preset]:
            env.pop(knob, None)
    env.update(PRESETS[preset])
    if len(argv) > 1 and argv[1] == "--pytest":
        pytest_args = argv[2:] or ["tests/", "-q"]
        cmd = [sys.executable, "-m", "pytest", *pytest_args]
    else:
        cmd = [sys.executable, os.path.join(HERE, "tools", "check.py"), *argv[1:]]
    inherited = {
        k: env[k]
        for k in ("SPARK_GRAFT_CPUS",)
        if k in env and k not in PRESETS[preset]
    }
    print(
        f"invariance[{preset}] env={PRESETS[preset]}"
        + (f" inherited={inherited}" if inherited else "")
        + f" -> {' '.join(cmd)}"
    )
    return subprocess.run(cmd, cwd=HERE, env=env).returncode


if __name__ == "__main__":
    raise SystemExit(main())
