"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct.  The
Spark-side plumbing (schema, partitioning, Arrow batch shape, mapInPandas
signature) is real and tested; the codec-dependent decode steps are STUBBED
behind ``NotImplementedError`` because no image/audio library ships in this
container — the batch iteration, feature schema and downstream joins run
against the deterministic byte-level features instead.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _byte_histogram(payload: bytes, buckets: int = 16) -> np.ndarray:
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=buckets, range=(0, 256))
    total = max(len(arr), 1)
    return hist / total


def extract_features(media: DataFrame, buckets: int = 16) -> DataFrame:
    """Byte-level feature extraction via mapInPandas (Arrow-batched).

    The feature vector is a deterministic byte-bucket histogram — a real
    computation standing in for decoded-content features so partitioning,
    batch shapes and downstream joins are exercised end-to-end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, ents, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                h = _byte_histogram(b, buckets)
                nz = h[h > 0]
                ents.append(float(-(nz * np.log2(nz)).sum()) if len(nz) else 0.0)
                feats.append([float(v) for v in h])
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "byte_entropy": np.round(ents, 6),
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame, target_size: tuple[int, int] = (224, 224)) -> DataFrame:
    """STUB — pixel decode requires an image codec not present in this
    container.  The Spark plumbing (signature, schema) is the real design;
    swap the body for PIL/libjpeg on a real cluster."""
    raise NotImplementedError(
        "image decode requires an image codec (PIL/opencv); not available "
        "in this container — use extract_features for byte-level features"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB — video frame sampling requires a video codec (see decode_image)."""
    raise NotImplementedError(
        "video frame sampling requires a codec; not available in this container"
    )


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        size = int(rng.randint(100, 2000))
        payload = bytes(rng.randint(0, 256, size=size, dtype=np.int32).astype(np.uint8))
        meta = (
            (64, 64, None, "image/png") if mtype == "image"
            else (None, None, int(rng.randint(1000, 60000)), "audio/ogg") if mtype == "audio"
            else (320, 240, int(rng.randint(1000, 60000)), "video/mp4")
        )
        rows.append((i, mtype, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
