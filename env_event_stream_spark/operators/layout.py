"""Multi-dimensional data layout: Z-order (Morton) clustering for
write-time data skipping.

The 100 TB problem this solves: a table sorted by ONE column prunes
scans only for filters on that column — a filter on any other column
reads everything. Interleaving the bits of k columns into one Morton
key and range-partitioning + sorting the write by that key gives every
interleaved column PARTIAL locality (a point/range filter on any of
them touches ~N^((k-1)/k) of the files instead of all of them), which
is exactly what parquet row-group min/max stats and file-level pruning
engines (Delta OPTIMIZE ZORDER, Iceberg sort orders) exploit. Spark
has no built-in Z-order; this is the standalone operator.

The key is pure integer bit math (shift/mask/or), identical in any
engine — the catalog query's DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def zorder_key(cols: list[Column], *, bits: int = 16) -> Column:
    """Morton/Z-value: interleave the low ``bits`` bits of each
    (non-negative integral) column — column j contributes its bit b to
    output bit ``b * len(cols) + j``. ``bits * len(cols)`` must fit a
    signed 64-bit int. Values are clamped into [0, 2^bits-1] on BOTH
    sides (saturate at the curve ends): without the low clamp, an
    arithmetic shiftright on a negative value sign-extends to all-ones
    and scatters garbage bits across the key."""
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds signed-64 range")
    cap = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cb = F.greatest(
            F.lit(0).cast("bigint"),
            F.least(c.cast("bigint"), F.lit(cap).cast("bigint")),
        )
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(cb, b).bitwiseAND(F.lit(1)), b * n + j
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of
    ``cols``: range-partition on the Morton key (contiguous curve
    segment per file) and sort within each file so row-group min/max
    stats stay tight on EVERY interleaved column. One range-exchange
    shuffle — the same cost as any global sort-write, but the skipping
    benefit applies to k filter columns instead of 1."""
    z = zorder_key([F.col(c) for c in cols], bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
