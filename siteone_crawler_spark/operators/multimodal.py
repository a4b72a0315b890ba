"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata structs; the
Spark-side plumbing (schemas, batch iteration, partition sizing) is real and
tested, while the codec step is stubbed: the container has no image/audio
libraries, so decode raises NotImplementedError unless `fake=True`, which
substitutes a deterministic synthetic decoder (so the pipeline shape is
exercisable end-to-end in tests).

Pattern: mapInPandas over Arrow batches. Media rows are large, so
`media_repartition` sizes partitions by BYTES (sum of payload sizes), not row
count — at 100 TB the difference is executor OOM vs smooth scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, feat array<float>, ok boolean"
)


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA (payload =
    seeded bytes; no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(((i * 131 + j * 17 + seed) % 256) for j in range(256 + (i % 7) * 64))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                payload,
                (
                    "image/png" if kind == "image" else f"{kind}/mp4",
                    64 + i % 128,
                    48 + i % 96,
                    0 if kind == "image" else 1000 + i * 33,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real codec: bucket byte histogram."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for j, b in enumerate(payload):
        acc[j % dim] += b
    n = max(len(payload), 1)
    return [round(a / n / 255.0, 6) for a in acc]


def extract_features(media: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    With fake=False this raises NotImplementedError at task time — the
    honest 'codec not present in this container' marker. The surrounding
    plumbing (schema, batching, partitioning) is identical either way.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not available in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feat": pdf["payload"].map(lambda p: _fake_decode(p, dim)),
                    "ok": True,
                }
            )
            yield out

    return media.mapInPandas(op, FEATURE_SCHEMA)


def media_repartition(media: DataFrame, target_bytes: int = 256 << 20) -> DataFrame:
    """Byte-aware repartition: rows whose payload alone reaches
    `target_bytes` each get their OWN partition (a few 4K-video rows can't
    co-land and blow an executor), while small rows hash-spread across
    ceil(total_small_bytes / target) partitions — ~target bytes per
    partition in expectation. A plain repartition(n) balances ROW counts
    only. Two tiny aggregates (sum + count) size the layout; no global sort."""
    sized = media.withColumn(
        "__sz", F.coalesce(F.length("payload"), F.lit(0)).cast("long")
    )
    big_pred = F.col("__sz") >= target_bytes
    stats = sized.agg(
        F.sum(F.when(~big_pred, F.col("__sz")).otherwise(0)).alias("small_bytes"),
        F.sum(F.when(big_pred, 1).otherwise(0)).alias("n_big"),
    ).first()
    n_small = max(1, int((stats["small_bytes"] or 0) // target_bytes) + 1)
    n_big = int(stats["n_big"] or 0)
    salt = F.when(
        big_pred, F.lit(n_small) + F.pmod(F.xxhash64("media_id"), F.lit(max(n_big, 1)))
    ).otherwise(F.pmod(F.xxhash64("media_id"), F.lit(n_small)))
    return (
        sized.withColumn("__salt", salt)
        .repartition(n_small + n_big, "__salt")
        .drop("__sz", "__salt")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) — the
    explode is native; the actual frame grab is the stubbed decode."""
    v = media.filter(F.col("kind") == "video")
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return v.select("media_id", F.explode(ts).alias("frame_ts"))


RESIZE_SCHEMA = (
    "media_id string, kind string, width int, height int, payload binary, ok boolean"
)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """Resize image payloads to (width, height) via mapInPandas — the last
    of the brief's four media ops (decode / featurize / resize /
    frame-sample). Same honesty contract as extract_features: with
    fake=False the task raises NotImplementedError (no PIL/ffmpeg in this
    container); fake=True emits a deterministic stand-in payload of
    width*height//64 bytes derived from the source bytes, so partitioning,
    Arrow batch shape, output schema and downstream size accounting are
    all real and testable. Non-image rows pass through with ok=false and
    a null payload (the filter stays in the plan, not in Python)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not available in this "
                    "environment; pass fake=True for the deterministic stub"
                )

            def rz(p):
                if p is None:
                    return None
                n = max(1, (width * height) // 64)
                seed = np.frombuffer(
                    hashlib.md5(p).digest(), dtype=np.uint8
                ).astype(np.uint64)
                reps = int(np.ceil(n / len(seed)))
                return np.tile(seed, reps)[:n].astype(np.uint8).tobytes()

            is_img = pdf["kind"] == "image"
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "payload": [
                        rz(p) if ok else None
                        for p, ok in zip(pdf["payload"], is_img)
                    ],
                    "ok": is_img,
                }
            )
            yield out

    return media.mapInPandas(op, RESIZE_SCHEMA)
