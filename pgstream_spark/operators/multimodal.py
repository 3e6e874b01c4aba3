"""Multimodal (binary payload) columns — SURVEY §2 L-5.

The reference already treats binary payloads as first-class (``bytea`` →
strict ``ByteString``, `/root/reference/src/Database/PostgreSQL/Stream/FromRow.hs:215-225`).
Here a media asset is an opaque ``binary`` column plus a typed metadata
struct, processed with Arrow-batched ``mapInPandas`` — the Spark-idiomatic
shape for decode / feature-extract / resize / frame-sample stages:

* schema and batch plumbing are real and tested;
* the actual codec step is STUBBED (this environment ships no image/audio
  libraries): ``decode_stub=True`` produces a deterministic fake feature
  vector from the bytes; ``decode_stub=False`` raises
  ``NotImplementedError`` at the point a real libjpeg/ffmpeg call belongs.

Scale notes: binary payloads ride through shuffles only if you shuffle
them — keep media tables partitioned by asset id and join *metadata* not
payloads; ``mapInPandas`` streams Arrow batches so peak executor memory is
one batch of payloads, controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_META_SCHEMA", "attach_media_meta", "extract_features", "resize_images", "sample_frames"]

# Typed metadata for an opaque media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),   # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), False),
    ]
)

_FEATURE_DIM = 8


def attach_media_meta(
    df: DataFrame, payload_col: str, media_type: str = "image"
) -> DataFrame:
    """Derive the typed metadata struct for a binary payload column.

    Size comes from the bytes; codec-derived fields (width/height/duration)
    stay NULL until a real decoder fills them — the schema contract is what
    downstream operators program against.
    """
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("size_bytes"),
        ),
    )


def extract_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode payloads and emit a fixed-dim feature vector per asset via
    Arrow-batched ``mapInPandas``.

    With ``decode_stub`` the "decoder" is a deterministic sha256-seeded
    fake (stable across runs/executors, so tests can assert exact values);
    without it, the function raises ``NotImplementedError`` where a real
    codec (PIL / torchaudio / pyav) would be invoked.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires an image/audio codec library; "
                    "install one and replace this branch"
                )
            feats = []
            for raw in pdf[payload_col]:
                digest = hashlib.sha256(bytes(raw or b"")).digest()
                feats.append(
                    [b / 255.0 for b in digest[:_FEATURE_DIM]]
                )
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "features": feats})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def resize_images(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    width: int,
    height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize stage: (id, payload) → (id, payload, width, height).

    Real implementation belongs at the marked point (PIL/libvips); the
    stub emits a deterministic pseudo-payload of the right conceptual
    shape (truncated/padded bytes) so downstream schema/partitioning
    logic is testable.  Arrow-batched; peak memory = one batch.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    target = width * height // 64 + 16  # stub size model

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires an imaging library (PIL/libvips); "
                    "replace this branch"
                )
            outs = []
            for raw in pdf[payload_col]:
                b = bytes(raw or b"")
                h = hashlib.sha256(b).digest()
                outs.append((b + h * (target // 32 + 1))[:target])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "payload": outs,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def sample_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_nth: int = 10,
    max_frames: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame-sampling stage: one row per sampled frame
    (id, frame_index, frame_payload).

    The stub treats the payload as a concatenation of fixed-size pseudo
    frames; a real implementation decodes with pyav/ffmpeg at the marked
    point.  Row-expanding output keeps frames independent rows, so
    downstream per-frame featurization parallelizes freely.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), False),
        ]
    )
    FRAME = 16  # stub frame width in bytes

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires a video decoder (pyav/ffmpeg); "
                    "replace this branch"
                )
            ids, idxs, frames = [], [], []
            for asset_id, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw or b"")
                n_frames = max(len(b) // FRAME, 0)
                taken = 0
                for fi in range(0, n_frames, every_nth):
                    if taken >= max_frames:
                        break
                    ids.append(int(asset_id))
                    idxs.append(fi)
                    frames.append(b[fi * FRAME : (fi + 1) * FRAME])
                    taken += 1
            yield pd.DataFrame(
                {"id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )
