"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The decode kernels themselves are STUBBED (image/audio libraries are not
in this environment): ``decode_image`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder produces
stable feature vectors so the Spark-side plumbing — schema, batching,
partitioning — is fully testable.

At scale: binary payloads ride in parquet; ``spark.sql.files.
maxPartitionBytes`` bounds batch memory; metadata predicates (width,
format, duration) push down to the scan so the binary column is only
materialized for surviving rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..shipping import ensure_worker_imports

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("format", StringType(), True),  # png/jpeg/wav/mp4...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed kernel: md5-seeded
    pseudo-features. Replace with PIL/torchvision/librosa in production."""
    if payload is None:
        return np.zeros(dim)
    digest = hashlib.md5(payload).digest()
    raw = np.frombuffer((digest * ((dim * 8) // len(digest) + 1))[: dim * 8], dtype="<u8")
    return (raw % 10_000).astype("float64") / 10_000.0


def decode_real(payload: bytes):  # pragma: no cover - stub
    """Real decode path — requires image/audio libs not present here."""
    raise NotImplementedError(
        "media decoding requires PIL/librosa/av; install and replace "
        "_fake_decode — the Spark plumbing below is library-agnostic"
    )


def extract_features(df: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch holds ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` rows; payload bytes never pass through Python
    row-at-a-time.
    """
    ensure_worker_imports(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (_fake_decode(p, dim) if fake else decode_real(p)).tolist()
                if p is not None
                else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, fake: bool = True
) -> DataFrame:
    """mapInPandas image resize over binary payloads.

    The real kernel (PIL ``Image.resize``) is stubbed like decode; the
    fake path produces a deterministic payload of exactly target_w ×
    target_h bytes (md5-keystream of the original), so the Spark-side
    contract — binary in/binary out, metadata rewritten to the target
    dimensions, non-images passed through untouched — is fully testable.
    """
    ensure_worker_imports(df.sparkSession)

    def _fake_resize(payload: bytes) -> bytes:
        need = target_w * target_h
        out = bytearray()
        counter = 0
        seed = hashlib.md5(payload).digest()
        while len(out) < need:
            out.extend(hashlib.md5(seed + counter.to_bytes(4, "little")).digest())
            counter += 1
        return bytes(out[:need])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            payloads = []
            for p, img in zip(pdf["payload"], is_img):
                if not img or p is None:
                    payloads.append(p)
                elif fake:
                    payloads.append(_fake_resize(bytes(p)))
                else:  # pragma: no cover - stub
                    decode_real(bytes(p))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf.loc[is_img, "width"] = target_w
            pdf.loc[is_img, "height"] = target_h
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media, frame_ts).

    The expensive decode is deferred — this only expands the work list
    (sequence+explode, JVM-side), so the decode stage is evenly
    partitionable by frame rather than by video.
    """
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "format", "frame_ms", "payload")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic in-memory media table for tests (no external libs)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media{i}".encode()).digest() * (i % 5 + 1)
        rows.append(
            (
                i,
                kind,
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                1000 * (i % 7 + 1) if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
