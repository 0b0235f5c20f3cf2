"""Multimodal column plumbing (SURVEY.md §2.4).

Images/audio/video ride through the engine as opaque ``binary``
payload columns with typed metadata; the per-item compute (decode,
feature extraction, resize, frame sampling) runs as Arrow-batched
``mapInPandas`` transforms — the correct Spark shape for Python
media libraries: one Python worker call per Arrow batch, columnar
transfer both ways, schema declared up front.

The media libraries themselves are NOT available in this
environment, so the decode kernels are DELIBERATE STUBS:
``decode_media`` raises NotImplementedError on the real path and
the pipeline uses a clearly-marked deterministic fake (md5-driven)
instead. Everything around the kernel — schemas, batching, UDF
signatures, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def decode_media(payload: bytes, modality: str):  # pragma: no cover - stub
    """REAL decode path — requires image/audio codecs not present in
    this container. Kept as the extension point."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use the deterministic fake kernels (fake_feature) instead"
    )


def fake_feature(payload: bytes) -> list[float]:
    """Deterministic FAKE 'decode+embed': md5-expanded bytes mapped
    to FEATURE_DIM floats in [0, 1). Stands in for a real
    decode→model feature kernel; same input ⇒ same output."""
    h = hashlib.md5(payload).digest()
    while len(h) < FEATURE_DIM * 2:
        h += hashlib.md5(h).digest()
    return [int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65536.0 for i in range(FEATURE_DIM)]


def make_synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic corpus: payload bytes derived from the
    item id (no RNG), modality round-robin."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media{i}".encode()).digest() * (4 + i % 5)
        modality = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                modality,
                payload,
                64 + i % 16 if modality != "audio" else None,
                48 + i % 8 if modality != "audio" else None,
                16000 if modality == "audio" else None,
                30 if modality == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(fake_feature),
                }
            )

    return df.mapInPandas(kernel, FEATURES_SCHEMA)


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """'Resize': metadata transform + payload kernel pass-through
    (the real kernel would re-encode pixels; the fake truncates or
    pads payload deterministically to simulate size change)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (target_w * target_h) / (pdf["width"] * pdf["height"]).clip(lower=1)
            new_len = (pdf["payload"].map(len) * scale).clip(lower=8).astype("int64")
            pdf = pdf.copy()
            pdf["payload"] = [
                (p * (int(l) // max(len(p), 1) + 1))[: int(l)]
                for p, l in zip(pdf["payload"], new_len)
            ]
            pdf["width"] = target_w
            pdf["height"] = target_h
            yield pdf

    return df.filter(F.col("modality") == "image").mapInPandas(kernel, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """'Frame sampling' for videos: keeps 1-in-every_n frames worth
    of payload and updates n_frames metadata."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            keep = (pdf["n_frames"].fillna(0) // every_n).clip(lower=1).astype("int32")
            pdf["payload"] = [
                p[: max(8, len(p) // max(int(pdf["n_frames"].iloc[i] or 1), 1) * int(k))]
                for i, (p, k) in enumerate(zip(pdf["payload"], keep))
            ]
            pdf["n_frames"] = keep
            yield pdf

    return df.filter(F.col("modality") == "video").mapInPandas(kernel, MEDIA_SCHEMA)
