"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas in Arrow batches.

The decode step is STUBBED — the real image/audio libraries are not in this
container — behind ``decode_media``: with ``fake=True`` (default) it derives
deterministic pseudo-features from the bytes (so the Spark-side plumbing —
schema, partitioning, UDF signature, batch shape — is real and tested);
with ``fake=False`` it raises NotImplementedError where a PIL/ffmpeg call
would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), False),  # opaque encoded bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (seeded bytes). Planted exact dups:
    every 8th row (i % 8 == 0, i > 0) carries the payload of row i-1 — the
    predecessor is never itself remapped (i-1 % 8 == 7), so each pair
    (i-1, i) is a real duplicate pair and nothing else collides."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        src = i - 1 if (i % 8 == 0 and i > 0) else i
        payload = np.random.default_rng(seed + src).integers(
            0, 256, size=256 + (src % 5) * 64, dtype=np.uint8
        )
        rows.append(
            (
                i,
                kind,
                bytes(payload.tobytes()),
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                1000 * (src % 7 + 1) if kind != "image" else None,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """media → per-item features via mapInPandas (Arrow batch iterator).

    fake=True: deterministic pseudo-embedding = normalized byte histogram
    projected to ``dim`` buckets + md5 content hash. fake=False: the real
    decoder slot (PIL / torchaudio / ffmpeg) — NotImplementedError here.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            feats, hashes, sizes = [], [], []
            for raw in pdf["data"]:
                b = np.frombuffer(raw, dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype(np.float32)
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append(hist / norm)
                hashes.append(hashlib.md5(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURES_SCHEMA)


def media_exact_dups(features: DataFrame) -> DataFrame:
    """Exact-duplicate media via content hash — same block/fingerprint/group
    spine as the text tiers."""
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash")
    return (
        features.withColumn("_n", F.count(F.lit(1)).over(w))
        .where(F.col("_n") > 1)
        .drop("_n")
        .select("media_id", "kind", "content_hash")
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize slot: real implementation would decode+resample in the
    same mapInPandas shape as decode_media. Kept as an explicit stub."""
    raise NotImplementedError("resize requires an image library — not in this container")


def frame_sample_stub(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling slot (ffmpeg) — explicit stub."""
    raise NotImplementedError("frame sampling requires ffmpeg — not in this container")
