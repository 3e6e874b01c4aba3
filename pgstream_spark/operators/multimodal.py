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

__all__ = ["MEDIA_META_SCHEMA", "attach_media_meta", "extract_features"]

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
