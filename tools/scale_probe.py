"""Nx scale probe (default 4x, SPARK_GRAFT_PROBE_COPIES overrides):
union each sf0.1 FACT table Nx with key shifts
applied per KEY DOMAIN (both sides of every FK shift together, so
joins keep their structure and key cardinality scales with volume);
fixed dimension tables (nation, region) are written once, as TPC-H
scaling itself does. Writes the scaled copies under /tmp (never
touches /root/testdata). events.parquet is written as a single FILE
so the streaming queries' pathGlobFilter matches it.

Usage: python tools/scale_probe.py <query> [query ...]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from env_event_stream_spark.session import get_spark
from env_event_stream_spark.tables import TABLE_NAMES, load_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "4"))
OUT = f"/tmp/scale_probe_{COPIES}x"

# key domain -> (owning table, owning column): the shift stride is the
# owner's max+1, and EVERY column in the domain shifts by the same
# amount per copy — FK pairs stay aligned across copies.
DOMAINS = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    # vec_id IS a doc_id (retrieval_queries joins `vec_id AS doc_id`
    # to the documents table), so embeddings ride the docid domain —
    # a separate vecid domain had its own stride (embeddings max+1 =
    # 2000 vs documents' 5000) and broke the FK across copies,
    # skewing every documents-to-embeddings probe (r14 review catch)
    "docid": ("documents", "doc_id"),
}

# table -> {column: domain}; tables absent here (nation, region) are
# fixed dims, written once.
TABLE_KEYS = {
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "docid"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
}


def build(spark) -> None:
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    stride = {
        dom: load_table(spark, BASE, tbl).agg(F.max(col)).collect()[0][0] + 1
        for dom, (tbl, col) in DOMAINS.items()
    }
    for name in TABLE_NAMES:
        df = load_table(spark, BASE, name)
        keymap = TABLE_KEYS.get(name)
        dest = os.path.join(OUT, f"{name}.parquet")
        if not keymap:  # fixed dimension: one copy, FKs stay valid
            df.write.mode("overwrite").parquet(dest)
            continue
        parts = []
        for copy in range(COPIES):
            c = df
            for col, dom in keymap.items():
                c = c.withColumn(col, F.col(col) + F.lit(copy * stride[dom]))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if name == "events":
            # streaming queries glob for a leaf FILE named
            # events.parquet — write one part file and move it there
            tmp = dest + "_dir"
            out.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, dest)
            shutil.rmtree(tmp)
        else:
            out.write.mode("overwrite").parquet(dest)


def main() -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sys.argv[1:]
    spark = get_spark("scale-probe")
    build(spark)
    print(f"{'query':35s} {'1x':>7s} {str(COPIES)+'x':>7s} ratio")
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
