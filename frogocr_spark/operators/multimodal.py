"""Multimodal payload plumbing: opaque binary columns + typed metadata.

The reference decodes images via leptonica (``pixReadMem`` —
``Source/TaskProcessor.cpp:213-226``).  This container has no image/audio
libraries, so per the build contract the DECODE step is stubbed while the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested:

- :func:`attach_binary_payload` builds a deterministic fake ``binary``
  column + metadata struct from text rows (stands in for real blobs).
- :func:`decode_features` is the ``mapInPandas`` feature extractor: it
  sniffs the magic bytes (real logic), routes to a decoder, and the
  decoder itself raises ``NotImplementedError`` unless
  ``fake_decode=True`` (deterministic fake features for tests/bench).

At 100 TB the binary column rides the same salted-repartition path as
text: blobs stay partition-local (never collected), metadata is a narrow
struct so scans that only need metadata never read blob bytes (parquet
column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = {b"\x89PNG": "png", b"\xff\xd8\xff": "jpeg", b"RIFF": "wav"}

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("decode_error", T.StringType(), True),
])


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Deterministic fake blob: md5-seeded bytes with a real magic header
    chosen by id; metadata struct alongside."""
    kind = F.pmod(F.col(id_col), F.lit(3))
    header = (F.when(kind == 0, F.lit(b"\x89PNG"))
              .when(kind == 1, F.lit(b"\xff\xd8\xff"))
              .otherwise(F.lit(b"RIFF")))
    body = F.encode(F.md5(F.col(text_col)), "utf-8").cast("binary")
    return (df
            .withColumn("payload", F.concat(header, body))
            .withColumn("media_meta", F.struct(
                F.when(kind == 0, "image/png")
                 .when(kind == 1, "image/jpeg")
                 .otherwise("audio/wav").alias("mime"),
                (F.length(F.col(text_col)) % 1024).alias("width"),
                F.lit(512).alias("height"),
            )))


def sniff_magic(blob: bytes) -> str:
    for magic, name in MAGIC.items():
        if blob[:len(magic)] == magic:
            return name
    return "unknown"


def _decode_real(blob: bytes, media: str) -> np.ndarray:
    """Real decoder slot — image/audio libs are not in this container."""
    raise NotImplementedError(
        f"{media} decode requires PIL/libsndfile (not installed); "
        "run with fake_decode=True or install codecs on the cluster image")


def _decode_fake(blob: bytes, media: str, dim: int = 8) -> np.ndarray:
    """Deterministic fake features: md5-seeded floats (test/bench path).

    The digest is md5 of the blob's LOWERCASE-HEX encoding — a string
    hash, not a bytes hash — so any SQL engine can recompute it
    (``md5(lower(hex(payload)))``; DuckDB has no md5 over BLOB), which
    is what lets the driver's oracle hash-verify the fake-decode
    contract queries end to end.  Features: repeat the 16-byte digest,
    read ``dim`` little-endian uint32 words, convert to float32 (the
    rounding step), scale by 2^-32 (exact — power of two)."""
    digest = hashlib.md5(blob.hex().encode()).digest()
    return np.frombuffer((digest * ((dim * 4) // 16 + 1))[:dim * 4],
                         dtype=np.uint32).astype(np.float32) / np.float32(2**32)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("src_w", T.IntegerType(), True),
    T.StructField("src_h", T.IntegerType(), True),
    T.StructField("out_w", T.IntegerType(), True),
    T.StructField("out_h", T.IntegerType(), True),
    T.StructField("pixels", T.BinaryType(), True),
    T.StructField("decode_error", T.StringType(), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("ts_ms", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("decode_error", T.StringType(), True),
])


def _resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) array — REAL math (only
    the codec decode is stubbed); vectorized fancy-index gather."""
    h, w = img.shape[:2]
    yi = np.arange(out_h) * h // out_h
    xi = np.arange(out_w) * w // out_w
    return img[yi][:, xi]


def _decode_fake_image(blob: bytes, w: int = 16, h: int = 16) -> np.ndarray:
    """Deterministic fake bitmap: md5-seeded (h, w, 3) uint8 (test path —
    a real cluster image swaps in PIL here)."""
    digest = hashlib.md5(blob).digest()
    raw = (digest * (h * w * 3 // 16 + 1))[:h * w * 3]
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).copy()


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "doc_id", blob_col: str = "payload",
                  fake_decode: bool = False) -> DataFrame:
    """Arrow-batched image resize: decode (stubbed) → nearest-neighbor
    resize (real) → raw RGB bytes out.  1 row in = 1 row out; non-image
    payloads pass through with ``decode_error`` set.  Blob bytes stay
    partition-local end to end."""
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                blob = bytes(blob)
                media = sniff_magic(blob)
                rec = [int(doc_id), media, None, None, None, None, None,
                       None]
                if media not in ("png", "jpeg"):
                    rec[7] = f"not an image: {media}"
                else:
                    try:
                        img = (_decode_fake_image(blob) if fake_decode
                               else _decode_real(blob, media))
                        resized = _resize_nearest(img, out_w, out_h)
                        rec[2:7] = [img.shape[1], img.shape[0],
                                    out_w, out_h, resized.tobytes()]
                    except NotImplementedError as e:
                        rec[7] = str(e)
                out.append(tuple(rec))
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA])

    return narrow.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, k: int, id_col: str = "doc_id",
                  blob_col: str = "payload",
                  fake_decode: bool = False, dim: int = 8) -> DataFrame:
    """Frame sampling for video-like payloads: 1 row in → ≤ k rows out
    (the UDTF shape — same as the reference's one-task→many-blocks
    recognizers, SURVEY §2.9 X2).  Sampling indices = evenly spaced over
    the clip: half-up rounding of ``j*(n-1)/(m-1)`` computed in EXACT
    integer arithmetic (``(2j(n-1) + (m-1)) // 2(m-1)``) —
    engine-portable by construction, unlike ``np.round``'s banker's
    rounding, so the DuckDB oracle reproduces the indices verbatim
    (spacing ≥ 1 when ``m ≤ n`` keeps the m indices distinct).  REAL
    logic; per-frame decode is the stubbed step.  ``ts_ms`` assumes
    30 fps."""
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                blob = bytes(blob)
                media = sniff_magic(blob)
                if media == "unknown":
                    out.append((int(doc_id), None, None, None, None,
                                f"undecodable payload: {media}"))
                    continue
                try:
                    if not fake_decode:
                        _decode_real(blob, media)
                    n_frames = 1 + blob[-1] % 30
                    m = min(k, n_frames)
                    if m == 1:
                        idx = np.zeros(1, dtype=np.int32)
                    else:
                        j = np.arange(m, dtype=np.int64)
                        idx = np.unique(
                            (2 * j * (n_frames - 1) + (m - 1))
                            // (2 * (m - 1))).astype(np.int32)
                    for i in idx:
                        feat = _decode_fake(blob + bytes([i]), media, dim)
                        out.append((int(doc_id), int(n_frames), int(i),
                                    int(i * 1000 // 30),
                                    [float(x) for x in feat], None))
                except NotImplementedError as e:
                    out.append((int(doc_id), None, None, None, None, str(e)))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA])

    return narrow.mapInPandas(run, schema=FRAME_SCHEMA)


def decode_features(df: DataFrame, id_col: str = "doc_id",
                    blob_col: str = "payload",
                    fake_decode: bool = False, dim: int = 8) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads."""
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                blob = bytes(blob)
                media = sniff_magic(blob)
                feat, err = None, None
                try:
                    vec = (_decode_fake(blob, media, dim) if fake_decode
                           else _decode_real(blob, media))
                    feat = [float(x) for x in vec]
                except NotImplementedError as e:
                    err = str(e)
                out.append((int(doc_id), media, len(blob), feat, err))
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA])

    return narrow.mapInPandas(run, schema=FEATURE_SCHEMA)
