"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake) — but the Spark-side shape is
real and tested: schema (binary payload + typed metadata struct),
Arrow-batched ``mapInPandas`` transforms, and partition sizing by bytes
rather than rows (a 100 TB multimodal table is dominated by payload
bytes; ``spark.sql.files.maxPartitionBytes`` keeps scan tasks bounded,
and we repartition by byte budget before heavy per-row work).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_FIELDS = [
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
]
FEATURES_SCHEMA = T.StructType(_FEATURES_FIELDS)


def decode_media(payload: bytes, kind: str):
    """STUB: real deployments plug in PIL/librosa/ffmpeg here.

    Raises so nothing silently ships fake decodes; the feature pipeline
    below uses the deterministic fake instead.
    """
    raise NotImplementedError(
        "media codecs unavailable in this environment; use fake_features()"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for an encoder embedding: bytes → stable
    pseudo-features (chunked byte sums, L2-normalized)."""
    if not payload:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), dim)
    feats = np.array([c.sum() if c.size else 0.0 for c in chunks])
    n = np.linalg.norm(feats)
    return (feats / n if n > 0 else feats).tolist()


def _byte_buckets(
    batch_bytes: int, total_bytes: int | None, buckets: int | None
) -> int | None:
    """Bucket count for a byte-budget repartition, WITHOUT scanning.

    The r01 version paid an extra full ``octet_length`` pass + a driver
    ``collect()`` just to size buckets — cheap at sf0.1, a wasted 100 TB
    table scan at scale. Now the caller supplies either ``buckets``
    directly or a ``total_bytes`` estimate (catalog statistics, a prior
    run's metrics, the landing area's file sizes); with neither, returns
    None → no repartition, deferring to the scan's own partitioning
    (``spark.sql.files.maxPartitionBytes`` already bounds bytes/task for
    file sources — the repartition only matters after a join/shuffle
    whose output isn't byte-bounded).
    """
    if buckets is not None:
        return max(1, buckets)
    if total_bytes is not None:
        return max(1, int(total_bytes // batch_bytes) + 1)
    return None


def extract_features(
    media: DataFrame,
    batch_bytes: int = 64 << 20,
    total_bytes: int | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the transfer columnar; with a caller-supplied
    size estimate (``total_bytes`` or ``buckets``) the input is
    repartitioned so no task holds more than ~batch_bytes of payload at
    once — the knob that matters when rows are megabytes. Single-scan
    either way (see _byte_buckets).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "features": pdf["payload"].map(lambda b: fake_features(b or b"")),
                }
            )
            yield out

    n = _byte_buckets(batch_bytes, total_bytes, buckets)
    if n is not None:
        media = media.repartition(n, F.col("media_id"))
    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("orig_width", T.IntegerType()),
        T.StructField("orig_height", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame,
    max_edge: int = 256,
    batch_bytes: int = 64 << 20,
    total_bytes: int | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Image resize with stubbed pixel math, real Spark plumbing.

    Output geometry (aspect-preserving fit into ``max_edge``²) is
    computed for real; the pixel transform itself is the deliberate
    stub (payload passes through — a deployment swaps one function for
    PIL's ``Image.resize``). Batch shape, byte-budget partitioning and
    Arrow transfer are identical to what the real kernel needs, so the
    plan is honest about cost: payload bytes cross into Python once.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].fillna(0).astype("int64")
            h = pdf["height"].fillna(0).astype("int64")
            scale = (max_edge / np.maximum(w, h).clip(lower=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # STUB: real kernel = decode → resample → re-encode
                    "payload": pdf["payload"],
                    "width": np.maximum((w * scale).astype("int64"), 1).astype("int32"),
                    "height": np.maximum((h * scale).astype("int64"), 1).astype("int32"),
                    "orig_width": w.astype("int32"),
                    "orig_height": h.astype("int32"),
                }
            )

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    n = _byte_buckets(batch_bytes, total_bytes, buckets)
    if n is not None:
        imgs = imgs.repartition(n, F.col("media_id"))
    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (decode stubbed). Shows the explode-shaped row multiplication a real
    sampler produces, so partition math downstream is honest."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames.withColumn("decoded", F.lit(None).cast("binary"))
