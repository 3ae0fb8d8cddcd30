"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image_udf`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode
derived from the bytes — the Spark-side plumbing (schema, Arrow batch
shape, mapInPandas partitioning) is real and tested.

Schema convention:
    media(id: long, kind: string, blob: binary,
          meta: struct<width:int, height:int, sample_rate:int,
                       duration_ms:int, codec:string>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("kind", StringType()),
    StructField("blob", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("kind", StringType()),
    StructField("blob_sha", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", StringType()),  # json array<double> (8 dims)
])


def text_as_media(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Manufacture a media table from a text table (the sandbox has no
    binary testdata): blob = utf-8 bytes, kind round-robin."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"))
    return df.select(
        F.col(id_col).alias("id"),
        kind.alias("kind"),
        F.col(text_col).cast("binary").alias("blob"),
        F.struct(
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length(text_col) * 10).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"))


def _fake_decode(blob: bytes) -> np.ndarray:
    """Deterministic 8-dim 'feature' from bytes (sha256-seeded)."""
    h = hashlib.sha256(blob or b"").digest()
    return (np.frombuffer(h[:32], dtype=np.uint32).astype(np.float64)[:8]
            / np.float64(2 ** 32))


def extract_features(media: DataFrame, *, fake: bool = True,
                     batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary blobs.

    Real deployments replace ``_fake_decode`` with PIL/torchaudio/ffmpeg
    decode + model forward; the partitioning, Arrow batch shape and
    output schema stay identical.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires PIL/torchaudio — not in "
            "this container; pass fake=True for the deterministic stub")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json
        for pdf in batches:
            feats = [json.dumps([round(float(x), 8) for x in _fake_decode(b)])
                     for b in pdf["blob"]]
            shas = [hashlib.sha256(b or b"").hexdigest() for b in pdf["blob"]]
            yield pd.DataFrame({
                "id": pdf["id"],
                "kind": pdf["kind"],
                "blob_sha": shas,
                "n_bytes": [len(b or b"") for b in pdf["blob"]],
                "feature": feats,
            })

    return media.mapInPandas(_gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (explode on
    duration — Catalyst-native; the decode of each frame is the stubbed
    step above)."""
    return (media.where(F.col("kind") == "video")
            .withColumn("frame_ts_ms", F.explode(
                F.sequence(F.lit(0),
                           F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))))
            .select("id", "frame_ts_ms", "meta"))
