"""Local replica of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given scale factor, then compares:
- row count
- column names (sorted, as the driver sorts before hashing)
- exact multiset of values

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from env_event_stream_spark.session import get_spark
from env_event_stream_spark.tables import TABLE_NAMES


def norm(v, local_dt: bool = False):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        # Compare INSTANTS, not renderings. PySpark's collect()
        # returns TimestampType as a naive datetime in the CLIENT
        # PROCESS's local timezone (fromInternal -> fromtimestamp);
        # DuckDB's naive TIMESTAMP never shifts. Under the tz
        # invariance sweep (TZ=America/New_York) the two renderings
        # of the same instant differ by the UTC offset — a harness
        # artifact, not a computation divergence (probed 2026-08:
        # timestamp'12:00' collects as 08:00 naive from Spark, 12:00
        # from DuckDB). Normalize Spark-side naive datetimes
        # local->UTC-naive, and any tz-aware datetime ->UTC-naive on
        # either side. Under TZ=UTC (the driver's environment) this
        # is a no-op, so the gate still replicates the driver bit
        # for bit there. Known loss: the local->UTC step is
        # ambiguous for the one repeated wall-clock hour of a DST
        # fall-back (collect() already collapsed the two instants) —
        # a rare false compare under non-UTC TZ only; if it ever
        # bites, collect instants as unix_micros on the Spark side
        # (the test_analytics pattern) instead of normalizing here.
        if v.tzinfo is not None or local_dt:
            return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v
    return v


def rowset(rows, cols, local_dt=None):
    """local_dt: per-column booleans (Spark side) — True for columns
    whose Spark type is TimestampType (instants, collected in the
    client's local tz, must be shifted to UTC-naive); False for
    TIMESTAMP_NTZ (collected as wall-clock naive, must NOT be
    shifted — found the hard way on o_orderdate) and everything else.
    DuckDB side passes None (its naive timestamps never shift).
    Top-level columns only: no catalog query returns timestamps
    nested inside arrays/structs/maps (verified by a schema scan of
    all 276 queries, 2026-08)."""
    if local_dt is None:
        local_dt = [False] * len(cols)
    # sort by lowercased name (exact name as tie-break) so the column
    # alignment matches the case-INSENSITIVE tolerance of the name
    # gate below — a Spark 'Band' vs DuckDB 'band' must land in the
    # same position, not permute the value tuples (r14 review catch)
    order = sorted(range(len(cols)), key=lambda i: (cols[i].lower(), cols[i]))
    return sorted(
        [tuple(norm(r[i], local_dt[i]) for i in order) for r in rows],
        key=lambda t: tuple(repr(x) for x in t),
    )


def counts() -> int:
    """CI-ish drift gate: the counting claims in COVERAGE.md / NEXT.md
    must match the registered catalog (the judge and the builder both
    count from these docs; stale counts read as padding or gaps)."""
    import re

    from env_event_stream_spark.catalog import ORACLES, QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bad = []
    for fname in ("COVERAGE.md", "NEXT.md", "README.md"):
        path = os.path.join(here, fname)
        if not os.path.exists(path):
            continue
        text = open(path).read()
        for m in re.finditer(r"(\d+)\s+catalog\s+queries", text):
            if int(m.group(1)) != len(QUERIES):
                bad.append(
                    f"{fname}: says '{m.group(0)}', catalog has {len(QUERIES)}"
                )
        for m in re.finditer(
            r"(\d+)\s+(?:with\s+full\s+SQL\s+oracles|DuckDB-oracled)", text
        ):
            if int(m.group(1)) != len(ORACLES):
                bad.append(
                    f"{fname}: says '{m.group(0)}', ORACLES has {len(ORACLES)}"
                )
        # README's "N queries, N oracle-checked" sat OUTSIDE the gate
        # and silently drifted 265 -> 276 over three rounds (caught by
        # hand r12) — cover the phrasing
        for m in re.finditer(
            r"(\d+)\s+queries,\s+(\d+)\s+oracle-checked", text
        ):
            if int(m.group(1)) != len(QUERIES) or int(m.group(2)) != len(ORACLES):
                bad.append(
                    f"{fname}: says '{m.group(0)}', catalog has "
                    f"{len(QUERIES)}/{len(ORACLES)}"
                )
    # pytest-count claims must match the collected suite (README says
    # "N cases", NEXT.md says "N pytest cases")
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "--collect-only"],
            cwd=here, capture_output=True, text=True, timeout=120,
        ).stdout
        mm = re.search(r"(\d+) tests collected", out)
        n_tests = int(mm.group(1)) if mm else None
    except Exception:
        n_tests = None
    if n_tests is None:
        # a gate that cannot run must read as drift, never as green —
        # same rule the bench-headline gate below already follows
        bad.append(
            "pytest-count gate could not run (collection failed or "
            "timed out) — the 'N pytest cases' doc claims are UNCHECKED"
        )
    if n_tests is not None:
        for fname, pat in (
            # \s+ (not \n?) so a doc line-wrap between any of the
            # three tokens can't silently disable the gate (r14
            # review catch: "NNN pytest\ncases" matched nothing)
            ("NEXT.md", r"(\d+)\s+pytest\s+cases"),
            ("README.md", r"(\d+)\s+cases"),
        ):
            path = os.path.join(here, fname)
            if not os.path.exists(path):
                continue
            for m in re.finditer(pat, open(path).read()):
                if int(m.group(1)) != n_tests:
                    bad.append(
                        f"{fname}: claims {m.group(1)} tests, suite "
                        f"collects {n_tests}"
                    )
        print(f"pytest: {n_tests} collected")

    # bench headline-count claims ("for NN headline queries") must
    # match bench.py's HEADLINE list — the review pass caught this
    # drifting when the list grew
    try:
        import bench as _bench

        for m in re.finditer(r"(\d+)\s+headline\s+queries", open(
            os.path.join(here, "NEXT.md")
        ).read()):
            if int(m.group(1)) != len(_bench.HEADLINE):
                bad.append(
                    f"NEXT.md: says '{m.group(0)}', bench.py HEADLINE has "
                    f"{len(_bench.HEADLINE)}"
                )
        # every HEADLINE name must resolve to a registered query:
        # bench.py skips unknown names SILENTLY (a typo would shrink
        # the suite and read as a speedup in cross-round deltas)
        ghosts = [n for n in _bench.HEADLINE if n not in QUERIES]
        if ghosts:
            bad.append(f"bench.py HEADLINE names not in catalog: {ghosts}")
        dupes = sorted(
            {n for n in _bench.HEADLINE if _bench.HEADLINE.count(n) > 1}
        )
        if dupes:
            bad.append(f"bench.py HEADLINE duplicate names: {dupes}")
        # ROTATING must be a duplicate-free subset of HEADLINE: a
        # typo'd name would silently never be skipped (no rotation
        # saving) and never carry, defeating the protocol
        rot_ghosts = [
            n for n in _bench.ROTATING if n not in _bench.HEADLINE
        ]
        if rot_ghosts:
            bad.append(f"bench.py ROTATING names not in HEADLINE: {rot_ghosts}")
        rot_dupes = sorted(
            {n for n in _bench.ROTATING if _bench.ROTATING.count(n) > 1}
        )
        if rot_dupes:
            bad.append(f"bench.py ROTATING duplicate names: {rot_dupes}")
    except Exception as exc:  # a broken bench.py IS drift — never green
        bad.append(f"headline gate could not run: {exc!r}")

    cov_path = os.path.join(here, "COVERAGE.md")
    if os.path.exists(cov_path):
        # word-boundary tokens, not substring containment: emb_knn_ivf
        # must not count as mentioned just because emb_knn_ivf_trained is
        cov_tokens = set(re.findall(r"[A-Za-z0-9_]+", open(cov_path).read()))
        missing = [n for n in sorted(QUERIES) if n not in cov_tokens]
        if missing:
            bad.append(
                f"COVERAGE.md: {len(missing)} catalog queries unmentioned: "
                f"{missing}"
            )
    print(f"catalog: {len(QUERIES)} queries, {len(ORACLES)} oracled")
    if bad:
        print("\n".join("DRIFT " + b for b in bad))
        return 1
    print("counts in sync")
    return 0


def main() -> int:
    if "--counts" in sys.argv[1:]:
        return counts()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Lazy (trained-model) oracles resolve their training data via this
    # env var; it must match the sf under comparison or every trained
    # oracle trains on different rows than the engine (spurious reds).
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # A typo'd query name would match NOTHING, run zero comparisons
    # and still print "all green" — the worst failure mode a
    # verification tool can have (the extra_conf_pairs lesson).
    unknown = sorted(only - set(qs))
    if unknown:
        print(f"unknown query name(s): {unknown}")
        return 2

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        dt_spark = time.time() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (rows-only, no oracle) "
                  f"[{dt_spark:.1f}s]")
            if len(srows) == 0:
                print(f"     WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        ok = True
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duckdb={sorted(dcols)}")
            ok = False
        if ok:
            instant_col = [t == "timestamp" for _, t in sdf.dtypes]
            sset = rowset([tuple(r) for r in srows], scols, instant_col)
            dset = rowset(drows, dcols)
            if sset != dset:
                ok = False
                ndiff = sum(1 for a, b in zip(sset, dset) if a != b) + abs(
                    len(sset) - len(dset)
                )
                print(f"FAIL {name}: value mismatch ({ndiff} differing rows)")
                for a, b in zip(sset, dset):
                    if a != b:
                        print(f"  spark : {a}\n  duckdb: {b}")
                        break
        if ok:
            print(f"PASS {name}: rows={len(srows)} [{dt_spark:.1f}s]")
        else:
            failures.append(name)

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
