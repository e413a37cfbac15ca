"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The interleaved documents carry media spans (media_ref != ''). This module
provides the Spark-side plumbing for treating media as first-class data:
a media table with a binary payload column, Arrow-batched feature
extraction over mapInPandas, and frame sampling.

Decode is REAL where a codec exists and degrades explicitly where not:
  - audio (WAV) decodes through stdlib `wave` — always available;
  - PNG (8-bit gray/RGB/palette/alpha, all five scanline filters),
    binary PPM/PGM, and uncompressed 24/32-bit BMP decode through the
    pure-stdlib decoders below (zlib + struct) — always available;
  - other image formats (JPEG, WebP, ...) decode through PIL or imageio
    when installed (optional imports resolved once per worker process;
    neither ships in this sandbox, so those formats raise
    NotImplementedError here and light up automatically on a cluster
    that has either library);
  - `extract_features(mode="auto")` falls back per row to a documented
    deterministic byte-hash feature when no codec can decode the
    payload, so the distributed plumbing — schema, batching,
    partitioning — behaves identically with or without codecs.

Payloads are format-sniffed by magic bytes first (PNG/PPM/BMP/RIFF-WAVE),
so a mislabeled media_kind still decodes correctly.
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (3 = palette, expands to RGB after PLTE lookup)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> "np.ndarray":
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth).
    Returns the reconstructed (height, stride) uint8 array."""
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) & 255
        else:
            # Sub/Average/Paeth reference the pixel bpp bytes to the left
            # of the one being reconstructed — inherently sequential in x.
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) >> 1
                elif ft == 4:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"unknown PNG filter type {ft}")
                rec[x] = (int(line[x]) + pred) & 255
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _decode_png(payload: bytes) -> "np.ndarray":
    """Pure-stdlib PNG decode (zlib inflate + unfilter): 8-bit depth,
    color types 0/2/3/4/6, no interlace. Flat float32 pixel array;
    palette images expand through PLTE to RGB."""
    import struct
    import zlib

    pos = len(_PNG_MAGIC)
    idat = b""
    plte = None
    width = height = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if ctag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctag == b"IDAT":
            idat += data
        elif ctag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"stdlib PNG decoder handles 8-bit non-interlaced gray/RGB/"
            f"palette/alpha; got depth={depth} ctype={ctype} "
            f"interlace={interlace} (install PIL/imageio for the rest)"
        )
    channels = _PNG_CHANNELS[ctype]
    stride = width * channels
    raw = zlib.decompress(idat)
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    px = _png_unfilter(raw, height, stride, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px.ravel()]
    return px.astype(np.float32).ravel()


def _decode_ppm(payload: bytes) -> "np.ndarray":
    """Binary PPM (P6, RGB) / PGM (P5, gray), maxval <= 255."""
    # header = magic, width, height, maxval as whitespace-separated ASCII
    # tokens; '#' comments run to end of line; one whitespace byte then raster.
    toks: list[bytes] = []
    i = 2  # past magic
    while len(toks) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise NotImplementedError("stdlib PPM decoder handles maxval <= 255")
    channels = 3 if payload[:2] == b"P6" else 1
    n = width * height * channels
    return (
        np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
        .astype(np.float32)
        .ravel()
    )


def _decode_bmp(payload: bytes) -> "np.ndarray":
    """Uncompressed 24/32-bit BMP (BI_RGB), bottom-up or top-down rows.
    Returns flat float32 pixels in RGB(A) order."""
    import struct

    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"stdlib BMP decoder handles uncompressed 24/32-bit; "
            f"got bpp={bpp} compression={compression}"
        )
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3  # rows pad to 4-byte boundaries
    flip = height > 0  # positive height = bottom-up storage
    height = abs(height)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : width * nch]
    px = rows.reshape(height, width, nch)
    if flip:
        px = px[::-1]
    px = px[..., [2, 1, 0] + ([3] if nch == 4 else [])]  # BGR(A) -> RGB(A)
    return px.astype(np.float32).ravel()


def decode_media(payload: bytes, media_kind: str = "img") -> "np.ndarray":
    """Decode a media payload to a flat float32 sample/pixel array.

    Always available via stdlib: WAV (`wave`), PNG (zlib inflate +
    unfilter), binary PPM/PGM, uncompressed BMP — dispatched by magic
    bytes, so a mislabeled media_kind still decodes. Other image
    formats decode through PIL or imageio when installed. Raises
    NotImplementedError only when the environment has no codec for the
    payload — use extract_features(mode="auto") for the documented
    deterministic fallback instead of the raise."""
    import io

    payload = bytes(payload)
    head = payload[:16]
    if head.startswith(_PNG_MAGIC):
        return _decode_png(payload)
    if head[:2] in (b"P5", b"P6"):
        return _decode_ppm(payload)
    if head[:2] == b"BM":
        return _decode_bmp(payload)
    kind = (media_kind or "").lower()
    if kind in _AUDIO_KINDS or (head[:4] == b"RIFF" and head[8:12] == b"WAVE"):
        import wave

        with wave.open(io.BytesIO(payload)) as w:
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
            "(stdlib handles WAV/PNG/PPM/BMP; install PIL or imageio "
            "for JPEG/WebP/...)"
        )
    name, mod = codec
    if name == "pil":
        return np.asarray(
            mod.open(io.BytesIO(payload)), dtype=np.float32
        ).ravel()
    return np.asarray(mod.imread(payload), dtype=np.float32).ravel()


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


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup by content hash: the same blob embedded in many
    documents (logos, stock images, re-posted clips) collapses to one
    keeper — the asset-level counterpart of document dedup, and the
    first pass any multimodal pipeline runs (content-hash equality
    needs no decode, so it is codec-free and byte-exact).

    One shuffle on md5(payload); the keeper is the (doc_id, media_ref)
    minimum inside each hash group via a keyed window — deterministic
    under retries. Returns one row per duplicated blob:
    (content_md5, n_copies, n_docs, keeper_doc, keeper_ref)."""
    from pyspark.sql import Window

    h = media.select(
        "doc_id", "media_ref", F.md5("payload").alias("content_md5")
    )
    w = Window.partitionBy("content_md5").orderBy("doc_id", "media_ref")
    return (
        h.withColumn("rk", F.row_number().over(w))
        .groupBy("content_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
                "keeper_doc"
            ),
            F.min(F.when(F.col("rk") == 1, F.col("media_ref"))).alias(
                "keeper_ref"
            ),
        )
        .filter(F.col("n_copies") > 1)
    )
