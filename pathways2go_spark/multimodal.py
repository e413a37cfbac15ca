"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The interleaved documents carry media spans (media_ref != ''). This module
provides the Spark-side plumbing for treating media as first-class data:
a media table with a binary payload column, Arrow-batched feature
extraction over mapInPandas, and frame sampling — with the actual
image/audio DECODE stubbed (the codec libraries are not in this image;
`decode_media` raises NotImplementedError unless `fake=True`, which
substitutes a deterministic byte-hash feature so the distributed plumbing
— schema, batching, partitioning — is fully exercised and tested).
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
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_kind", T.StringType()),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Extract media spans into a typed media table. The payload here is
    the deterministic bytes of the media_ref (a stand-in for the blob a
    production reader would fetch from object storage by media_ref)."""
    spans = documents.select("doc_id", F.explode("spans").alias("s")).filter(
        F.col("s.media_ref") != ""
    )
    return spans.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.text").alias("caption"),
        F.encode(F.col("s.media_ref"), "UTF-8").alias("payload"),
        F.split_part(F.col("s.media_ref"), F.lit("://"), F.lit(1)).alias("media_kind"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_media(payload: bytes) -> "np.ndarray":
    """Real decode (image/audio/video) — NOT IMPLEMENTED in this image:
    the codec libraries (PIL/ffmpeg/torchaudio) are unavailable. The
    distributed pipeline around it is real; swap this function for the
    actual decoder in production."""
    raise NotImplementedError("media codecs unavailable in this environment")


def extract_features(media: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas. fake=True uses a
    deterministic byte-hash embedding (sha256 -> dim floats in [0,1)) so
    schema/batch/partition behavior is fully testable without codecs."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                pdf["payload"].map(decode_media)  # raises: codecs absent
            feats = []
            for p in pdf["payload"]:
                h = hashlib.sha256(bytes(p)).digest()
                feats.append(
                    np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
                    / np.float32(2**32)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        run, schema=_FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Deterministic frame/sample selection: keep every n-th media item
    per document by media_ref order (the video frame-sampling shape —
    a windowed rank, no shuffle beyond the per-doc partitioning)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("media_ref")
    return (
        media.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") - 1) % every_n == 0)
        .drop("rank")
    )
