"""Multimodal columns: media as opaque binary + typed metadata.

The reference ships page images and embedded media in tar shards
(annotator_process.py:321-348, figure.py:76-123); here media are rows of a
``media`` table: (doc_id, media_ref, content binary, fmt, width, height).
Bytes in the sandbox are deterministic pseudo-payloads derived from
media_ref; real decode (PIL/ffmpeg) is stubbed behind ``decode_real=True``
(NotImplementedError) while the Spark-side plumbing — schema, Arrow batch
shape, mapInPandas feature extraction — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("content", BinaryType()),
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("phash", StringType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Derive the media table from figure spans of the interleaved input.

    Pseudo-payload: md5-stream bytes seeded by (doc_id, media_ref);
    deterministic sizes/dimensions derived from the same hash (SQL-
    reproducible: length = 64 + hash16 % 4096).
    """
    figs = (
        docs.select(
            "doc_id",
            F.explode("spans").alias("s"),
        )
        .filter(F.col("s.media_ref").isNotNull())
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    seed = "md5(concat(doc_id, '/', media_ref))"
    h16 = f"CAST(conv(substr({seed}, 1, 4), 16, 10) AS INT)"
    figs = figs.withColumn("n_bytes", F.expr(f"64 + ({h16} % 4096)"))
    figs = figs.withColumn(
        "width", F.expr(f"32 + ({h16} % 993)")
    ).withColumn("height", F.expr(f"32 + (CAST(conv(substr({seed}, 5, 4), 16, 10) AS INT) % 993)"))

    def gen_bytes(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            contents = []
            for doc_id, ref, n in zip(pdf["doc_id"], pdf["media_ref"], pdf["n_bytes"]):
                n = int(n)
                digest = hashlib.md5(f"{doc_id}/{ref}".encode()).digest()
                contents.append((digest * (n // 16 + 1))[:n])
            out = pdf[["doc_id", "media_ref"]].copy()
            out["content"] = contents
            out["fmt"] = "png"
            out["width"] = pdf["width"].astype("int32")
            out["height"] = pdf["height"].astype("int32")
            yield out

    return figs.mapInPandas(gen_bytes, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, decode_real: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``decode_real=True`` is the production path (image decode + resize +
    perceptual hash) — stubbed here because no imaging libs ship in this
    container; the batch plumbing is identical.
    """

    def features(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_real:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg (not in sandbox); "
                "deterministic byte-level features are the test surrogate"
            )
        for pdf in batch_iter:
            rows = []
            for doc_id, ref, content in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["content"]
            ):
                b = bytes(content)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_ref": ref,
                        "n_bytes": len(b),
                        "byte_mean": round(sum(b) / len(b), 6) if b else 0.0,
                        "phash": hashlib.md5(b).hexdigest()[:16],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(features, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_media(
    media: DataFrame, max_dim: int = 256, decode_real: bool = False
) -> DataFrame:
    """Aspect-preserving resize to fit ``max_dim`` (mapInPandas batch shape).

    The output *dimensions* are integer arithmetic on the metadata and are
    fully real (new_w = w·max_dim // max(w, h) when the image exceeds
    max_dim); the pixel resample itself needs an imaging lib and is stubbed
    behind ``decode_real=True`` — content passes through unchanged, so the
    schema, partitioning and batch plumbing are production-shaped.
    """

    def resize(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_real:
            raise NotImplementedError(
                "real pixel resample requires PIL (not in sandbox); "
                "dimension arithmetic + passthrough bytes are the surrogate"
            )
        for pdf in batch_iter:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            longest = w.combine(h, max)
            scale_needed = longest > max_dim
            out_w = w.where(~scale_needed, (w * max_dim) // longest)
            out_h = h.where(~scale_needed, (h * max_dim) // longest)
            out = pdf[["doc_id", "media_ref"]].copy()
            out["width"] = w.astype("int32")
            out["height"] = h.astype("int32")
            out["out_width"] = out_w.astype("int32")
            out["out_height"] = out_h.astype("int32")
            out["content"] = pdf["content"]
            yield out

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_sig", StringType()),
    ]
)


def frame_sample(
    media: DataFrame,
    frame_len: int = 256,
    max_frames: int = 4,
    decode_real: bool = False,
) -> DataFrame:
    """Sample up to ``max_frames`` fixed-stride frames per media item.

    The production path (``decode_real=True``) would ffmpeg-demux the
    container and decode keyframes; stubbed in-sandbox.  The surrogate
    treats the binary content as a raw frame stream: frame i is bytes
    [i·frame_len, (i+1)·frame_len), ``frame_sig`` is the lowercase hex of
    its first 8 bytes — byte-identical to the SQL oracle, so the driver
    pins that the pandas-UDF byte handling (slicing, Arrow binary round-
    trip) is exact, not just row counts.
    """

    def frames(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_real:
            raise NotImplementedError(
                "real frame decode requires ffmpeg (not in sandbox); "
                "fixed-stride byte slicing is the surrogate"
            )
        for pdf in batch_iter:
            rows = []
            for doc_id, ref, content in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["content"]
            ):
                b = bytes(content)
                n_frames = min(max_frames, max(1, len(b) // frame_len))
                for i in range(n_frames):
                    fb = b[i * frame_len:(i + 1) * frame_len]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_ref": ref,
                            "frame_idx": i,
                            "frame_bytes": fb,
                            "frame_sig": fb[:8].hex(),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)
