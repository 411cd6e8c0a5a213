"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata. The Spark-side
machinery — schemas, partition-preserving mapInPandas, Arrow batch shapes —
is real and tested; the actual codec calls are STUBBED because the sandbox
has no image/audio libraries: ``decode_*(real=True)`` raises
NotImplementedError, while the default deterministic fake derives metadata
from the raw bytes (stable across partitionings) so pipelines exercise the
full dataflow.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("meta", StringType()),  # JSON sidecar
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes, dims: int = 8):
    """Deterministic fake image decode: metadata + feature vector derived
    purely from the payload bytes (partitioning-independent)."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 1984
    height = 64 + h[1] % 1984
    feats = [((h[2 + i] / 255.0) * 2.0 - 1.0) for i in range(dims)]
    return width, height, len(payload or b""), feats


def decode_images(
    media: DataFrame, dims: int = 8, real: bool = False, batch_hint: int = 1024
) -> DataFrame:
    """image binary → (media_id, width, height, n_bytes, features).

    Arrow-batched mapInPandas (never per-row Python): each batch is a
    pandas DataFrame; the UDF is a pure function of the payload column so
    the operator is deterministic under any partitioning/AQE re-plan.
    """
    if real:
        raise NotImplementedError(
            "real image decoding requires an image codec library not present "
            "in this environment; use real=False for the deterministic fake"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "width": [], "height": [], "n_bytes": [], "features": [],
            }
            for payload in pdf["payload"]:
                w, h, n, f = _fake_decode(bytes(payload) if payload is not None else b"", dims)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(n)
                out["features"].append(f)
            yield pd.DataFrame(out)

    src = media.filter(F.col("media_type") == "image").select("media_id", "payload")
    return src.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, real: bool = False) -> DataFrame:
    """image → resized image bytes. Stub: fake 'resize' re-encodes a
    deterministic digest of (payload, w, h) as the new payload."""
    if real:
        raise NotImplementedError("real resize requires an image library")

    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                hashlib.sha256(
                    (bytes(p) if p is not None else b"") + f"|{width}x{height}".encode()
                ).digest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    src = media.filter(F.col("media_type") == "image").select("media_id", "payload")
    return src.mapInPandas(run, out_schema)


def sample_video_frames(
    media: DataFrame, every_n: int = 30, real: bool = False
) -> DataFrame:
    """video → (media_id, frame_idx, frame payload). Stub: fake frames are
    byte-slices of the payload at deterministic offsets; frame count derives
    from payload length (stands in for container duration metadata)."""
    if real:
        raise NotImplementedError("real frame sampling requires a video demuxer")

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                n_frames = max(len(raw) // max(every_n, 1), 1)
                for i in range(min(n_frames, 16)):
                    ids.append(mid)
                    idxs.append(i * every_n)
                    frames.append(hashlib.sha256(raw + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    src = media.filter(F.col("media_type") == "video").select("media_id", "payload")
    return src.mapInPandas(run, out_schema)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: wrap each document's text bytes as a fake
    image payload (JVM-side encode; no Python)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.col("lang"), F.col("n_chars"))).alias("meta"),
    )
