"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md §2.11).

Design (real and tested):
- media rows = ``(media_id, kind, content BINARY, meta STRUCT)`` —
  the schema, partitioning and Arrow batch plumbing are production
  code;
- transforms run as ``mapInPandas`` iterator UDFs: Arrow batches in,
  Arrow batches out, constant memory per batch — at 100 TB the decode
  stage is embarrassingly parallel and never collects;
- actual codec work is STUBBED (this container has no PIL/ffmpeg):
  ``decode_stub`` produces a deterministic fake (sha-derived
  dimensions); ``decode_real`` raises NotImplementedError behind an
  import-try so dropping in Pillow lights it up without touching the
  plumbing.

Loading real files at scale: ``spark.read.format("binaryFile")``
yields (path, modificationTime, length, content) — feed that straight
into ``with_media_schema``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_DDL = (
    "media_id bigint, kind string, format string, n_bytes bigint, "
    "width int, height int, duration_s double, sha256 string"
)

__all__ = [
    "MEDIA_SCHEMA",
    "DECODED_DDL",
    "with_media_schema",
    "decode",
    "resize",
    "frame_sample",
]

try:  # real decoders are optional deps, absent in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def with_media_schema(binary_files: DataFrame, kind: str) -> DataFrame:
    """Adapt a ``binaryFile`` scan to the media schema."""
    return binary_files.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.regexp_extract("path", r"\.(\w+)$", 1).alias("format"),
            F.col("length").alias("n_bytes"),
            F.col("path").alias("source"),
        ).alias("meta"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: dimensions derived from sha256 of
    the bytes. Replace with a real codec (see decode_real) — the
    surrounding plumbing (batching, schema, partitioning) is final.
    Column-wise pandas ops (no per-record dict building): the hash is
    per-row by nature but everything around it vectorizes."""
    import numpy as np

    content = pdf["content"].map(lambda b: b or b"")
    digest = content.map(lambda b: hashlib.sha256(b).hexdigest())
    h = digest.str[:8].map(lambda x: int(x, 16)).astype("int64")
    timed = pdf["kind"].isin(["audio", "video"])
    duration = pd.Series(
        np.where(timed, ((h % 360000) / 1000.0).round(3), np.nan),
        index=pdf.index,
    )
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "format": pdf["meta"].map(
                lambda m: (m or {}).get("format") if m is not None else None
            ),
            "n_bytes": content.map(len).astype("int64"),
            "width": (16 + h % 4096).astype("int32"),
            "height": (16 + (h // 4096) % 4096).astype("int32"),
            "duration_s": duration,
            "sha256": digest,
        }
    )


def decode_real(content: bytes, kind: str) -> dict:
    """The real-codec hook. Wire PIL/ffmpeg here when available."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "real media decode needs Pillow/ffmpeg; this environment "
            "ships neither — use the deterministic stub (decode())"
        )
    raise NotImplementedError("real decode intentionally left to deployment")


def decode(media: DataFrame) -> DataFrame:
    """Decode/feature-extract stage as mapInPandas: Arrow-batched,
    constant memory, no driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return media.mapInPandas(run, schema=DECODED_DDL)


def resize(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plumbing: aspect-preserving fit into a
    ``max_side`` bounding box. Target dims use INTEGER math only
    (dst = src * max_side // longest_side) so the plan is
    bit-reproducible in any engine; the stub stamps a sha of
    (bytes + target dims) where a real codec would emit resized
    bytes. Same mapInPandas shape as decode() — embarrassingly
    parallel, constant memory, zero shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dec = _decode_batch(pdf)
            content = pdf["content"].map(lambda b: b or b"")
            w = dec["width"].astype("int64")
            h = dec["height"].astype("int64")
            longest = w.where(w >= h, h)
            over = longest > max_side
            dst_w = w.where(~over, (w * max_side // longest)).clip(lower=1)
            dst_h = h.where(~over, (h * max_side // longest)).clip(lower=1)
            sha = [
                hashlib.sha256(c + f"{dw}x{dh}".encode()).hexdigest()
                for c, dw, dh in zip(content, dst_w, dst_h)
            ]
            yield pd.DataFrame(
                {
                    "media_id": dec["media_id"],
                    "src_w": w.astype("int32"),
                    "src_h": h.astype("int32"),
                    "dst_w": dst_w.astype("int32"),
                    "dst_h": dst_h.astype("int32"),
                    "resized_sha": sha,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        run,
        schema=(
            "media_id bigint, src_w int, src_h int,"
            " dst_w int, dst_h int, resized_sha string"
        ),
    )


def frame_sample(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled
    frame timestamp (stub emits sha-derived frame ids; a real
    implementation decodes the container). Demonstrates the 1→N
    mapInPandas row-explosion shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                content = rec["content"] or b""
                digest = hashlib.sha256(content).hexdigest()
                duration = (int(digest[:8], 16) % 360000) / 1000.0
                t = 0.0
                while t < min(duration, 10 * every_s):  # stub caps at 10 frames
                    rows.append(
                        {
                            "media_id": rec["media_id"],
                            "frame_ts": round(t, 3),
                            "frame_sha": hashlib.sha256(
                                content + str(t).encode()
                            ).hexdigest(),
                        }
                    )
                    t += every_s
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_ts", "frame_sha"]
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        run, schema="media_id bigint, frame_ts double, frame_sha string"
    )
