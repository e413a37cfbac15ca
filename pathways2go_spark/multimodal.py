"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The interleaved documents carry media spans (media_ref != ''). This module
provides the Spark-side plumbing for treating media as first-class data:
a media table with a binary payload column, Arrow-batched feature
extraction over mapInPandas, and frame sampling.

Decode is REAL where a codec exists and degrades explicitly where not:
  - audio (WAV) decodes through stdlib `wave` — always available;
  - images decode through PIL or imageio when installed (optional
    imports resolved once per worker process; neither ships in this
    image, so the image route raises NotImplementedError here and
    lights up automatically on a cluster that has either library);
  - `extract_features(mode="auto")` falls back per row to a documented
    deterministic byte-hash feature when no codec can decode the
    payload, so the distributed plumbing — schema, batching,
    partitioning — behaves identically with or without codecs.
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


_AUDIO_KINDS = frozenset({"wav", "audio", "aud"})


def _image_codec():
    """Optional image codec, resolved once per worker process: PIL first,
    imageio second, None when neither is installed."""
    global _IMG_CODEC
    try:
        return _IMG_CODEC
    except NameError:
        pass
    codec = None
    try:
        from PIL import Image  # type: ignore

        codec = ("pil", Image)
    except ImportError:
        try:
            import imageio.v3 as iio  # type: ignore

            codec = ("imageio", iio)
        except ImportError:
            codec = None
    _IMG_CODEC = codec
    return codec


def decode_media(payload: bytes, media_kind: str = "img") -> "np.ndarray":
    """Decode a media payload to a flat float32 sample/pixel array.

    WAV audio decodes through stdlib `wave` (always available); images
    decode through PIL or imageio when installed. Raises
    NotImplementedError only when the environment has no codec for the
    kind — use extract_features(mode="auto") for the documented
    deterministic fallback instead of the raise."""
    import io

    kind = (media_kind or "").lower()
    if kind in _AUDIO_KINDS:
        import wave

        with wave.open(io.BytesIO(bytes(payload))) as w:
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
        if dtype is None:
            raise ValueError(f"unsupported WAV sample width {width}")
        return np.frombuffer(raw, dtype=dtype).astype(np.float32)
    codec = _image_codec()
    if codec is None:
        raise NotImplementedError(
            f"no codec available for media_kind={media_kind!r} "
            "(stdlib wave handles WAV; install PIL or imageio for images)"
        )
    name, mod = codec
    if name == "pil":
        return np.asarray(
            mod.open(io.BytesIO(bytes(payload))), dtype=np.float32
        ).ravel()
    return np.asarray(mod.imread(bytes(payload)), dtype=np.float32).ravel()


def _hash_feature(payload: bytes, dim: int) -> "np.ndarray":
    """Deterministic byte-hash embedding (sha256 -> dim floats in [0,1))
    — the documented no-codec fallback; also the exact-oracle route."""
    h = hashlib.sha256(bytes(payload)).digest()
    while len(h) < dim * 4:
        h += hashlib.sha256(h).digest()
    return (
        np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
        / np.float32(2**32)
    )


def _decoded_feature(samples: "np.ndarray", dim: int) -> "np.ndarray":
    """Fixed-stride resample of the decoded signal into `dim` floats,
    peak-normalized — deterministic given the payload bytes."""
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float32)
    idx = (np.arange(dim, dtype=np.int64) * samples.size) // dim
    scale = np.float32(max(1.0, float(np.abs(samples).max())))
    return (samples[idx] / scale).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 8, fake: bool | None = None, mode: str = "hash"
) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    mode="hash"    deterministic byte-hash embedding (exact SQL oracle);
    mode="decode"  real decode via decode_media — raises on payloads the
                   environment has no codec for;
    mode="auto"    real decode where possible, per-row hash fallback
                   where not (same schema/batching either way).
    `fake` is the legacy alias: True -> "hash", False -> "decode".
    """
    if fake is not None:
        mode = "hash" if fake else "decode"
    if mode not in ("hash", "decode", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p, k in zip(pdf["payload"], pdf["media_kind"]):
                if mode != "hash":
                    try:
                        feats.append(_decoded_feature(decode_media(p, k), dim))
                        continue
                    except Exception:
                        if mode == "decode":
                            raise
                feats.append(_hash_feature(p, dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.select("doc_id", "media_ref", "payload", "media_kind").mapInPandas(
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
