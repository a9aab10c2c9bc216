"""Multimodal-pipeline catalog entries (SURVEY.md §2.11).

The media frame is synthesized deterministically from the `documents`
table (content = UTF-8 bytes of the text, kind = doc_id mod 3) so the
*binary* plumbing — BinaryType columns, typed metadata structs,
Arrow-batched mapInPandas decode, 1→N frame sampling — runs for real
AND stays oracle-checkable: the stub decode derives every output field
from sha256(content), which DuckDB computes identically.

Swapping the stub for PIL/ffmpeg (multimodal.decode_real) changes no
plan shape; only the per-batch Python body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from env_event_stream_spark import multimodal as MM
from env_event_stream_spark.queries import query
from env_event_stream_spark.tables import load_table

def _kind():
    """kind = doc_id % 3 → image / audio / video."""
    return (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )


_KIND_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_SCHEMA frame (binary content + typed meta)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        _kind().alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("txt").alias("format"),
            F.octet_length(F.encode(F.col("text"), "UTF-8"))
            .cast("long")
            .alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


@query(
    "mm_decode_features",
    f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             {_KIND_SQL} AS kind,
             encode(text) AS content, text
      FROM documents),
    d AS (
      SELECT media_id, kind,
             sha256(text) AS sha,
             CAST(octet_length(content) AS BIGINT) AS n_bytes,
             ('0x' || substr(sha256(text), 1, 8))::BIGINT AS h
      FROM m)
    SELECT media_id, kind,
           'txt' AS format,
           n_bytes,
           CAST(16 + h % 4096 AS INTEGER) AS width,
           CAST(16 + (h // 4096) % 4096 AS INTEGER) AS height,
           CASE WHEN kind IN ('audio', 'video')
                THEN round((h % 360000) / 1000.0, 3) END AS duration_s,
           sha AS sha256
    FROM d
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage over binary media columns:
    mapInPandas, Arrow batches in/out, constant memory — the stub
    derives width/height/duration from sha256(content) so the oracle
    can replay it. At 100 TB this stage is embarrassingly parallel
    (no shuffle, no driver)."""
    return MM.decode(_media_frame(spark, sf_dir))


@query(
    "mm_frame_sample",
    f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             {_KIND_SQL} AS kind,
             encode(text) AS content, text
      FROM documents),
    v AS (
      SELECT media_id, text, content,
             (('0x' || substr(sha256(text), 1, 8))::BIGINT % 360000)
               / 1000.0 AS duration
      FROM m WHERE kind = 'video'),
    f AS (SELECT media_id, text, duration, unnest(range(0, 10)) AS i
          FROM v)
    SELECT media_id,
           round(i * 1.0, 3) AS frame_ts,
           sha256(text || printf('%.1f', i * 1.0)) AS frame_sha
    FROM f WHERE i * 1.0 < least(duration, 10.0)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: 1→N row explosion inside
    mapInPandas (one row per sampled timestamp, stub caps at 10
    frames). The real decoder swaps in without changing schema or
    partitioning."""
    return MM.frame_sample(_media_frame(spark, sf_dir), every_s=1.0)


@query(
    "mm_resize",
    f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             {_KIND_SQL} AS kind, text
      FROM documents),
    d AS (
      SELECT media_id, text,
             ('0x' || substr(sha256(text), 1, 8))::BIGINT AS h
      FROM m WHERE kind = 'image'),
    dims AS (
      SELECT media_id, text,
             CAST(16 + h % 4096 AS BIGINT) AS w,
             CAST(16 + (h // 4096) % 4096 AS BIGINT) AS hh
      FROM d),
    fit AS (
      SELECT media_id, text, w, hh,
             greatest(w, hh) AS longest
      FROM dims)
    SELECT media_id,
           CAST(w AS INTEGER) AS src_w,
           CAST(hh AS INTEGER) AS src_h,
           CAST(greatest(CASE WHEN longest > 256
                         THEN w * 256 // longest ELSE w END, 1)
                AS INTEGER) AS dst_w,
           CAST(greatest(CASE WHEN longest > 256
                         THEN hh * 256 // longest ELSE hh END, 1)
                AS INTEGER) AS dst_h,
           sha256(text || printf('%dx%d',
             greatest(CASE WHEN longest > 256
                      THEN w * 256 // longest ELSE w END, 1),
             greatest(CASE WHEN longest > 256
                      THEN hh * 256 // longest ELSE hh END, 1)))
             AS resized_sha
    FROM fit
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize stage: aspect-preserving fit into a 256px box
    with INTEGER-only target math (src * 256 // longest) so the
    oracle replays it exactly; the stub stamps sha256(bytes +
    'WxH') where a real codec would emit resized bytes. Same
    mapInPandas shape as decode — no shuffle, no driver."""
    return MM.resize(_media_frame(spark, sf_dir), max_side=256)


@query(
    "mm_kind_stats",
    f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             {_KIND_SQL} AS kind,
             encode(text) AS content, text
      FROM documents),
    d AS (
      SELECT media_id, kind,
             CAST(octet_length(content) AS BIGINT) AS n_bytes,
             ('0x' || substr(sha256(text), 1, 8))::BIGINT AS h
      FROM m)
    SELECT kind,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(16 + h % 4096) AS INTEGER) AS min_width,
           CAST(max(16 + h % 4096) AS INTEGER) AS max_width
    FROM d GROUP BY kind
    """,
)
def mm_kind_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-decode aggregate over media metadata: decode (mapInPandas)
    → groupBy(kind) — the typical curation dashboard rollup."""
    dec = MM.decode(_media_frame(spark, sf_dir))
    return dec.groupBy("kind").agg(
        F.count("*").cast("bigint").alias("n_media"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
    )
