"""4x scale probe: union each sf0.1 table 4x with shifted keys (so key
cardinality scales with volume), then time queries warm at 1x vs 4x.
Writes the scaled copies under /tmp (never touches /root/testdata).

Usage: python tools/scale_probe.py <query> [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from env_event_stream_spark.session import get_spark
from env_event_stream_spark.tables import TABLE_NAMES, load_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/scale_probe_4x"

# per-table key columns to shift per copy so joins/groups see 4x keys
SHIFT_KEYS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],
    "region": [],
}


def build(spark) -> None:
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    for name in TABLE_NAMES:
        df = load_table(spark, BASE, name)
        keys = SHIFT_KEYS.get(name, [])
        maxes = {
            k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys
        }
        parts = []
        for copy in range(4):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(copy * maxes[k]))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{name}.parquet"))


def main() -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sys.argv[1:]
    spark = get_spark("scale-probe")
    build(spark)
    print(f"{'query':35s} {'1x':>7s} {'4x':>7s} ratio")
    for n in names:
        if n not in qs:
            print(f"{n:35s} (unknown)")
            continue
        qs[n](spark, BASE).count()  # warm
        t0 = time.time()
        qs[n](spark, BASE).count()
        t1 = time.time() - t0
        spark.catalog.clearCache()
        qs[n](spark, OUT).count()  # warm
        t0 = time.time()
        qs[n](spark, OUT).count()
        t4 = time.time() - t0
        spark.catalog.clearCache()
        print(f"{n:35s} {t1:7.2f} {t4:7.2f} {t4 / max(t1, 1e-9):5.1f}")


if __name__ == "__main__":
    main()
