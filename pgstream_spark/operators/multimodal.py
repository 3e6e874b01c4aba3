"""Multimodal (binary payload) columns — SURVEY §2 L-5.

The reference already treats binary payloads as first-class (``bytea`` →
strict ``ByteString``, `/root/reference/src/Database/PostgreSQL/Stream/FromRow.hs:215-225`).
Here a media asset is an opaque ``binary`` column plus a typed metadata
struct, processed with Arrow-batched ``mapInPandas`` — the Spark-idiomatic
shape for decode / feature-extract / resize / frame-sample stages:

* schema and batch plumbing are real and tested;
* ``decode_stub=True`` produces a deterministic sha256-seeded fake (no
  decoding — useful for plumbing tests and unknown formats);
* ``decode_stub=False`` is a REAL decode path for the stdlib-decodable
  formats — PPM (P6), 24-bit BMP, PCM16 WAV — via ``operators.codecs``;
  compressed formats (JPEG/PNG/MP4) raise ``UnsupportedMediaError`` at
  the clearly-marked point where libjpeg/ffmpeg would plug in.

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

__all__ = ["MEDIA_META_SCHEMA", "attach_media_meta", "extract_features", "resize_images", "sample_frames", "extract_patches", "patch_dup_stats", "frame_dup_stats", "audio_frame_energy", "audio_spectral_features", "dhash_signatures", "dhash_candidate_pairs", "audio_fingerprint", "validate_media", "split_decodable"]

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
    fake (stable across runs/executors, so tests can assert exact values).
    Without it, payloads are REALLY decoded (PPM/BMP/WAV via
    ``operators.codecs``) into modality-tagged summary features:

    * image → [1, w, h, mean_r, mean_g, mean_b, std, aspect] (means/std
      scaled to [0,1]);
    * audio → [2, duration_s, rate_kHz, channels, mean, rms, peak, zcr]
      (amplitudes scaled by 2¹⁵);
    * anything else raises ``UnsupportedMediaError`` where a compressed-
      format codec (libjpeg / ffmpeg) would plug in.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    def real_features(raw: bytes) -> list[float]:
        import numpy as np

        from pgstream_spark.operators import codecs

        fmt = codecs.sniff_format(raw)
        if fmt in ("ppm", "bmp"):
            img = codecs.decode_image(raw)
            h, w, _ = img.shape
            scaled = img.astype("float64") / 255.0
            return [
                1.0,
                float(w),
                float(h),
                float(scaled[:, :, 0].mean()),
                float(scaled[:, :, 1].mean()),
                float(scaled[:, :, 2].mean()),
                float(scaled.std()),
                float(w) / float(h),
            ]
        if fmt == "wav":
            samples, rate = codecs.decode_wav(raw)
            x = samples.astype("float64") / 32768.0
            mono = x.mean(axis=1)
            zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if len(mono) > 1 else 0.0
            return [
                2.0,
                len(samples) / float(rate),
                rate / 1000.0,
                float(samples.shape[1]),
                float(mono.mean()),
                float(np.sqrt((mono**2).mean())) if len(mono) else 0.0,
                float(np.abs(mono).max()) if len(mono) else 0.0,
                zcr,
            ]
        # the libjpeg/ffmpeg integration point for compressed formats
        from pgstream_spark.operators.codecs import UnsupportedMediaError

        raise UnsupportedMediaError(f"no stdlib decoder for payload (fmt={fmt})")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for raw in pdf[payload_col]:
                b = bytes(raw or b"")
                if decode_stub:
                    digest = hashlib.sha256(b).digest()
                    feats.append([x / 255.0 for x in digest[:_FEATURE_DIM]])
                else:
                    feats.append(real_features(b))
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

    With ``decode_stub=False`` this REALLY resizes: PPM/BMP payloads are
    decoded (``operators.codecs``), nearest-neighbor resampled, and
    re-encoded as P6 PPM (the normalized output format of the stage);
    compressed inputs raise ``UnsupportedMediaError`` where PIL/libvips
    would plug in.  The stub emits a deterministic pseudo-payload of the
    right conceptual shape.  Arrow-batched; peak memory = one batch.
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
        from pgstream_spark.operators import codecs

        for pdf in it:
            outs = []
            for raw in pdf[payload_col]:
                b = bytes(raw or b"")
                if decode_stub:
                    h = hashlib.sha256(b).digest()
                    outs.append((b + h * (target // 32 + 1))[:target])
                else:
                    img = codecs.decode_image(b)
                    outs.append(
                        codecs.encode_ppm(codecs.resize_nearest(img, width, height))
                    )
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

    With ``decode_stub=False``, payloads are REALLY sampled: PCM16 WAV
    audio is cut into 1024-sample windows, every ``every_nth`` window
    re-encoded as a standalone WAV; Y4M (YUV4MPEG2 C444) VIDEO decodes
    through the real container parser and every ``every_nth`` frame is
    re-encoded as a standalone P6 image of the raw plane values (each
    frame independently decodable downstream — colorspace conversion
    is the consumer's call).  Compressed containers (MP4/WebM) raise
    ``UnsupportedMediaError`` where pyav/ffmpeg would plug in.  The
    stub treats the payload as a concatenation of fixed-size pseudo
    frames.  Row-expanding output keeps frames independent rows, so
    per-frame featurization parallelizes.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), False),
        ]
    )
    FRAME = 16  # stub frame width in bytes
    WINDOW = 1024  # real path: samples per audio frame

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pgstream_spark.operators import codecs

        for pdf in it:
            ids, idxs, frames = [], [], []
            for asset_id, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw or b"")
                if decode_stub:
                    n_frames = max(len(b) // FRAME, 0)
                    cut = lambda fi: b[fi * FRAME : (fi + 1) * FRAME]  # noqa: E731
                else:
                    fmt = codecs.sniff_format(b)
                    if fmt == "wav":
                        samples, rate = codecs.decode_wav(b)
                        n_frames = max(len(samples) // WINDOW, 0)
                        cut = lambda fi: codecs.encode_wav(  # noqa: E731
                            samples[fi * WINDOW : (fi + 1) * WINDOW], rate
                        )
                    elif fmt == "y4m":
                        vid, _fps = codecs.decode_y4m(b)
                        n_frames = vid.shape[0]
                        cut = lambda fi: codecs.encode_ppm(vid[fi])  # noqa: E731
                    else:
                        raise codecs.UnsupportedMediaError(
                            "real frame sampling implemented for WAV audio "
                            "and Y4M video; compressed containers need "
                            "pyav/ffmpeg"
                        )
                taken = 0
                for fi in range(0, n_frames, every_nth):
                    if taken >= max_frames:
                        break
                    ids.append(int(asset_id))
                    idxs.append(fi)
                    frames.append(cut(fi))
                    taken += 1
            yield pd.DataFrame(
                {"id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def extract_patches(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    patch: int = 8,
) -> DataFrame:
    """ViT-style patch grid: decode each image and emit one row per
    non-overlapping ``patch×patch`` tile with its mean RGB vector —
    the embedding-ready shape a vision encoder consumes (here the
    pixel-mean stands in for the patch projection; the tiling,
    schema, and batch plumbing are the real thing).

    Output ``(id, patch_row, patch_col, mean_rgb array<double>)``; rows
    per asset = ⌊h/patch⌋·⌊w/patch⌋, so the fan-out is bounded by image
    geometry, never corpus size.  Arrow-batched ``mapInPandas``; images
    that don't tile evenly lose the ragged margin (standard ViT crop).
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("patch_row", T.IntegerType(), False),
            T.StructField("patch_col", T.IntegerType(), False),
            T.StructField("mean_rgb", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pgstream_spark.operators import codecs

        for pdf in it:
            ids, prs, pcs, vecs = [], [], [], []
            for asset_id, raw in zip(pdf[id_col], pdf[payload_col]):
                img = codecs.decode_image(bytes(raw or b""))
                h, w, _ = img.shape
                nr, nc = h // patch, w // patch
                if nr == 0 or nc == 0:
                    continue
                tiles = (
                    img[: nr * patch, : nc * patch]
                    .reshape(nr, patch, nc, patch, 3)
                    .astype("float64")
                    / 255.0
                )
                means = tiles.mean(axis=(1, 3))  # (nr, nc, 3)
                for r in range(nr):
                    for c in range(nc):
                        ids.append(int(asset_id))
                        prs.append(r)
                        pcs.append(c)
                        vecs.append([float(v) for v in means[r, c]])
            yield pd.DataFrame(
                {"id": ids, "patch_row": prs, "patch_col": pcs, "mean_rgb": vecs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def audio_frame_energy(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    frame_ms: int = 100,
) -> DataFrame:
    """Fixed-length audio framing: decode WAV payloads and emit one row
    per ``frame_ms`` window with RMS energy and zero-crossing rate —
    the front half of voice-activity detection / silence trimming in an
    audio curation pipeline.  Trailing partial frames are kept (their
    true sample count divides the energy).  Output ``(id, frame,
    rms, zcr)``.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame", T.IntegerType(), False),
            T.StructField("rms", T.DoubleType(), False),
            T.StructField("zcr", T.DoubleType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pgstream_spark.operators import codecs

        for pdf in it:
            ids, frames, rmss, zcrs = [], [], [], []
            for asset_id, raw in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = codecs.decode_wav(bytes(raw or b""))
                mono = samples.astype("float64").mean(axis=1) / 32768.0
                step = max(int(rate * frame_ms / 1000), 1)
                for fi in range(0, len(mono), step):
                    chunk = mono[fi : fi + step]
                    ids.append(int(asset_id))
                    frames.append(fi // step)
                    rmss.append(float(np.sqrt((chunk**2).mean())))
                    zcrs.append(
                        float((np.diff(np.signbit(chunk)) != 0).mean())
                        if len(chunk) > 1
                        else 0.0
                    )
            yield pd.DataFrame({"id": ids, "frame": frames, "rms": rmss, "zcr": zcrs})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def audio_spectral_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    frame_ms: int = 100,
) -> DataFrame:
    """Per-frame spectral features from WAV payloads: dominant frequency,
    spectral centroid, and low/high-band energy split — the signal-side
    complement of :func:`audio_frame_energy` (energy says "is something
    there", the spectrum says "what does it look like": tone vs noise vs
    speech-band content) for audio curation filters.

    Arrow-batched ``mapInPandas`` like every multimodal kernel here: the
    decode + rFFT run per payload inside a vectorized batch, the plan
    stays a single map stage (no shuffle), and partitioning/pushdown
    behave exactly as for the other feature extractors.  numpy's rFFT on
    a per-frame window (≤ rate·frame_ms samples) is O(n log n) per
    frame and embarrassingly parallel across assets.

    Output ``(id, frame, dom_hz, centroid_hz, low_frac)`` where
    ``low_frac`` is the fraction of spectral energy below 1 kHz and the
    DC bin is excluded from the dominant-bin argmax.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame", T.IntegerType(), False),
            T.StructField("dom_hz", T.DoubleType(), False),
            T.StructField("centroid_hz", T.DoubleType(), False),
            T.StructField("low_frac", T.DoubleType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pgstream_spark.operators import codecs

        for pdf in it:
            ids, frames, doms, cents, lows = [], [], [], [], []
            for asset_id, raw in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = codecs.decode_wav(bytes(raw or b""))
                mono = samples.astype("float64").mean(axis=1) / 32768.0
                step = max(int(rate * frame_ms / 1000), 1)
                for fi in range(0, len(mono), step):
                    chunk = mono[fi : fi + step]
                    if len(chunk) < 2:
                        continue
                    spec = np.abs(np.fft.rfft(chunk))
                    freqs = np.fft.rfftfreq(len(chunk), d=1.0 / rate)
                    power = spec * spec
                    tot = float(power[1:].sum())
                    if tot <= 0.0:
                        dom = cen = low = 0.0
                    else:
                        dom = float(freqs[1 + int(np.argmax(power[1:]))])
                        cen = float((freqs[1:] * power[1:]).sum() / tot)
                        low = float(power[1:][freqs[1:] < 1000.0].sum() / tot)
                    ids.append(int(asset_id))
                    frames.append(fi // step)
                    doms.append(dom)
                    cents.append(cen)
                    lows.append(low)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame": frames,
                    "dom_hz": doms,
                    "centroid_hz": cents,
                    "low_frac": lows,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def patch_dup_stats(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    patch: int = 8,
) -> DataFrame:
    """Image PATCH-level exact dedup — the sub-asset analog of l37's
    duplicate text spans: decode each image (real codec path), tile it
    into non-overlapping ``patch×patch`` squares, hash each tile's raw
    bytes (md5 of the lowercase hex rendering — a rendering an
    oracle can reproduce byte-for-byte), and report per image how many
    of its tiles also occur in at least one OTHER image.  The curation
    signal behind logo/watermark/border detection in image corpora:
    a tile shared across many assets is boilerplate, not content.

    Output ``(id, n_patches, n_dup, dup_bp)`` — ``n_dup`` counts tiles
    whose hash appears in ≥ 2 distinct images, ``dup_bp`` the exact
    basis-point share (``n_dup·10000 DIV n_patches``).

    Scale shape: the mapInPandas decode emits (id, tile-hash) rows —
    fan-out bounded by image geometry, never corpus size; then one
    hash-keyed aggregate (count distinct ids — map-side combinable),
    a broadcast-sized join back on the hash, and one per-image
    aggregate.  No pairwise anything: duplicate detection is
    hash-equality, the same discipline as the text dedup tier."""
    hash_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("phash", T.StringType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from pgstream_spark.operators import codecs

        for pdf in it:
            ids, hashes = [], []
            for asset_id, raw in zip(pdf[id_col], pdf[payload_col]):
                img = codecs.decode_image(bytes(raw or b""))
                h, w, _ = img.shape
                nr, nc = h // patch, w // patch
                for r in range(nr):
                    for c in range(nc):
                        tile = img[
                            r * patch : (r + 1) * patch,
                            c * patch : (c + 1) * patch,
                        ].tobytes()
                        ids.append(int(asset_id))
                        hashes.append(
                            hashlib.md5(tile.hex().encode()).hexdigest()
                        )
            yield pd.DataFrame({"id": ids, "phash": hashes})

    tiles = df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=hash_schema
    )
    return _dup_stats_tail(tiles, "phash", "n_patches")


def _dup_stats_tail(hashed: DataFrame, hash_col: str, n_name: str) -> DataFrame:
    """Shared cross-asset dup aggregation behind `patch_dup_stats` and
    `frame_dup_stats`: count distinct assets per hash, join back, and
    report per asset the total / shared counts and the exact basis-point
    share — one definition so the ≥2 threshold and the floor-division
    rounding can never diverge between the spatial and temporal forms."""
    counts = hashed.groupBy(hash_col).agg(
        F.count_distinct("id").alias("__nd")
    )
    per = (
        hashed.join(counts, hash_col)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias(n_name),
            F.sum(F.when(F.col("__nd") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
        )
    )
    return per.select(
        "id",
        n_name,
        "n_dup",
        F.expr(f"n_dup * 10000 DIV {n_name}").cast("bigint").alias("dup_bp"),
    )


def frame_dup_stats(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_nth: int = 1,
    max_frames: int = 8,
) -> DataFrame:
    """FRAME-level exact dedup for temporal media — `patch_dup_stats`'
    temporal twin: sample frames through the REAL container path
    (`sample_frames(decode_stub=False)` — Y4M video decoded and each
    sampled frame re-encoded as P6; PCM16 WAV audio cut into windows
    re-encoded as standalone WAVs), decode each sampled frame back,
    hash its raw content bytes (md5 of the lowercase hex rendering of
    the pixel array / sample buffer, oracle-reproducible), and report
    per asset how many of its sampled frames also occur in at least
    one OTHER asset.  The curation signal behind intro/outro/slate/
    static-card detection in video corpora and jingle/silence-window
    detection in audio — a frame shared across many assets is
    boilerplate, and matching hashes prove the container round trips
    byte-exact end to end.

    Output ``(id, n_frames, n_dup, dup_bp)`` like the patch form.

    Scale shape: the two Arrow-batched decode stages fan out one row
    per SAMPLED frame (bounded by ``max_frames``, never corpus size);
    then one hash-keyed count-distinct, a join back on the hash, and
    one per-asset aggregate — no pairwise anything."""
    hash_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("fhash", T.StringType(), False),
        ]
    )
    frames = sample_frames(
        df,
        payload_col,
        id_col,
        every_nth=every_nth,
        max_frames=max_frames,
        decode_stub=False,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from pgstream_spark.operators import codecs

        for pdf in it:
            hs = []
            for raw in pdf["frame_payload"]:
                b = bytes(raw)
                if codecs.sniff_format(b) == "wav":
                    samples, _rate = codecs.decode_wav(b)
                    content = samples.tobytes()
                else:
                    content = codecs.decode_image(b).tobytes()
                hs.append(hashlib.md5(content.hex().encode()).hexdigest())
            yield pd.DataFrame({"id": pdf["id"], "fhash": hs})

    hashed = frames.mapInPandas(batches, schema=hash_schema)
    return _dup_stats_tail(hashed, "fhash", "n_frames")


def dhash_signatures(
    df: DataFrame,
    payload_col: str,
    id_col: str,
) -> DataFrame:
    """Perceptual dHash per image through the REAL codec path — the
    near-dup complement of `patch_dup_stats`'s exact tile matching:
    re-encodes, slight recolors, and noise leave the difference hash
    within a few bits, so corpus-level perceptual dedup becomes
    hamming distance on a 64-bit signature (the public-pipeline
    standard for image near-dedup, e.g. LAION's pHash/dHash stage).

    The classic recipe, integer-exact end to end: decode → luma
    ``299R+587G+114B`` (undivided — comparisons are scale-invariant)
    → 8×9 box downsample on floor boundaries ``[k·dim DIV grid]`` →
    bit = left cell mean > right cell mean, tested by CROSS-
    MULTIPLICATION of sums and areas (no division anywhere, so the
    signature is bit-reproducible by an arithmetic oracle) → 64 bits
    packed as FOUR 16-bit band keys ``b0..b3`` (two grid rows each).
    Bands, not one int64: bit 63 would wedge a signed BIGINT, and the
    bands ARE the LSH keys `dhash_candidate_pairs` buckets on —
    pigeonhole gives exact recall at hamming ≤ 3.

    Scale shape: one Arrow-batched mapInPandas pass (numpy kernel,
    no per-pixel Python), output 5 ints per image — the signature
    table is ~40 B/asset, joinable/bucketable at any corpus size.
    Requires images at least 8×9; raises inside the kernel otherwise.

    Returns ``(id, b0, b1, b2, b3)``.
    """
    import numpy as np

    out_schema = T.StructType(
        [T.StructField("id", T.LongType(), False)]
        + [T.StructField(f"b{k}", T.LongType(), False) for k in range(4)]
    )
    ROWS, COLS = 8, 9

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pgstream_spark.operators import codecs

        for pdf in it:
            recs = {"id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for asset_id, raw in zip(pdf[id_col], pdf[payload_col]):
                img = codecs.decode_image(bytes(raw or b"")).astype("int64")
                h, w, _ = img.shape
                if h < ROWS or w < COLS:
                    raise ValueError(
                        f"dhash needs >= {ROWS}x{COLS} pixels, got {h}x{w}"
                    )
                lum = 299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]
                rb = [r * h // ROWS for r in range(ROWS + 1)]
                cb = [c * w // COLS for c in range(COLS + 1)]
                s = np.array(
                    [
                        [
                            int(lum[rb[r]:rb[r + 1], cb[c]:cb[c + 1]].sum())
                            for c in range(COLS)
                        ]
                        for r in range(ROWS)
                    ],
                    dtype="int64",
                )
                wd = np.array(
                    [cb[c + 1] - cb[c] for c in range(COLS)], dtype="int64"
                )
                # mean(r,c) > mean(r,c+1)  <=>  s[c]·w[c+1] > s[c+1]·w[c]
                # (row heights cancel — both cells share the row band)
                bits = s[:, :-1] * wd[1:] > s[:, 1:] * wd[:-1]
                recs["id"].append(int(asset_id))
                for k in range(4):
                    key = 0
                    for i in range(2):
                        for c in range(COLS - 1):
                            if bits[2 * k + i, c]:
                                key |= 1 << (i * (COLS - 1) + c)
                    recs[f"b{k}"].append(key)
            yield pd.DataFrame(recs)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def dhash_candidate_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    allow_approx: bool = False,
) -> DataFrame:
    """Perceptual near-dup pairs from `dhash_signatures` output by
    banded LSH: two signatures within ``max_hamming`` differing bits
    agree on at least one of the four 16-bit bands whenever
    ``max_hamming < 4`` (pigeonhole), so bucketing on (band, key)
    finds EVERY qualifying pair — exact recall, no pairwise scan.
    With ``max_hamming >= 4`` the band filter can miss pairs; that
    needs ``allow_approx=True`` as an explicit acknowledgement.

    Scale shape: explode 4 band rows per image, self-join inside
    (band, key) buckets — fan-out bounded by bucket sizes (a
    saturated bucket means exact-duplicate images; dedup those with
    `patch_dup_stats`/exact hash first, or thin them with
    `dedup.drop_saturated_buckets`), then one distinct and a
    signature join-back for the exact hamming verify, built-ins only
    (``bit_count``/``xor`` stay in whole-stage codegen).

    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``.
    """
    if max_hamming >= 4 and not allow_approx:
        raise ValueError(
            "banded recall is exact only for max_hamming <= 3; pass "
            "allow_approx=True to accept missed pairs"
        )
    # Eager persist: `sigs` is usually a decode-heavy lineage (dHash /
    # audio fingerprint over raw media) and feeds the band explode plus
    # BOTH verify join-backs — without the persist the full decode
    # executes once per plan branch.  The persisted rows are one id +
    # four 16-bit band ints per item.
    sigs = sigs.persist()
    sigs.count()
    bands = sigs.select(
        F.col("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"), F.col(f"b{k}").alias("key")
                    )
                    for k in range(4)
                ]
            )
        ).alias("__b"),
    ).select("id", F.col("__b.band").alias("__band"), F.col("__b.key").alias("__key"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    sa = sigs.select(
        F.col("id").alias("id_a"), *[F.col(f"b{k}").alias(f"__a{k}") for k in range(4)]
    )
    sb = sigs.select(
        F.col("id").alias("id_b"), *[F.col(f"b{k}").alias(f"__bb{k}") for k in range(4)]
    )
    ham = sum(
        F.bit_count(F.col(f"__a{k}").bitwiseXOR(F.col(f"__bb{k}")))
        for k in range(4)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", ham.cast("bigint").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def audio_fingerprint(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    buckets: int = 65,
) -> DataFrame:
    """Perceptual audio fingerprint through the REAL WAV codec path —
    the temporal analog of `dhash_signatures` (same idea as the
    energy-envelope stage of public audio fingerprinters: re-encodes,
    gain-neutral edits, and tail trims leave most envelope transitions
    intact, so near-dup detection becomes hamming distance).

    Integer-exact recipe: decode PCM16 → channel SUM (not mean — no
    division) → ``buckets`` floor-boundary time buckets → bucket
    energy ``Σ s²`` (exact int64) → bit k = mean energy of bucket k >
    bucket k+1, tested by cross-multiplication of energy sums and
    bucket sizes → 64 bits packed as FOUR 16-bit band keys ``b0..b3``
    (bit k lands in band ``k DIV 16``).  The output schema matches
    `dhash_signatures`, so `dhash_candidate_pairs` provides the banded
    near-dup join for audio unchanged (pigeonhole recall at hamming
    ≤ 3).

    Scale shape: one Arrow-batched mapInPandas pass, numpy kernel,
    5 ints per asset out.  Requires at least ``buckets`` mono frames;
    raises inside the kernel otherwise.

    Returns ``(id, b0, b1, b2, b3)``.
    """
    import numpy as np

    out_schema = T.StructType(
        [T.StructField("id", T.LongType(), False)]
        + [T.StructField(f"b{k}", T.LongType(), False) for k in range(4)]
    )
    if buckets != 65:
        # 64 transitions = 4 × 16-bit bands; other counts would need a
        # different packing — keep the signature format fixed.
        raise ValueError("audio_fingerprint packs 64 transitions; buckets must be 65")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pgstream_spark.operators import codecs

        for pdf in it:
            recs = {"id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for asset_id, raw in zip(pdf[id_col], pdf[payload_col]):
                samples, _rate = codecs.decode_wav(bytes(raw or b""))
                mono = samples.astype("int64").sum(axis=1)
                n = len(mono)
                if n < buckets:
                    raise ValueError(
                        f"audio_fingerprint needs >= {buckets} frames, got {n}"
                    )
                bd = [k * n // buckets for k in range(buckets + 1)]
                # integer envelope guard: the numpy int64 square-sum of a
                # bucket wraps silently once max|s|² · bucket_len ≥ 2^63
                # (≈ 2^31 stereo PCM16 frames per bucket — hours of audio,
                # but raise rather than emit wrong bits past it)
                mx = int(np.abs(mono).max()) if n else 0
                max_len = max(bd[k + 1] - bd[k] for k in range(buckets))
                if mx * mx * max_len >= 1 << 63:
                    raise ValueError(
                        "audio_fingerprint: bucket energy would overflow "
                        f"int64 (max|sample|={mx}, bucket_len={max_len}); "
                        "chunk the clip first"
                    )
                e = [
                    int((mono[bd[k]:bd[k + 1]] ** 2).sum())
                    for k in range(buckets)
                ]
                cnt = [bd[k + 1] - bd[k] for k in range(buckets)]
                # transition comparisons in Python ints (arbitrary
                # precision): energy·count cross-products exceed 2^63 for
                # realistic ~minute-long clips, where an int64 product
                # would wrap and flip fingerprint bits with no error
                bits = [
                    e[k] * cnt[k + 1] > e[k + 1] * cnt[k]
                    for k in range(buckets - 1)
                ]
                recs["id"].append(int(asset_id))
                for b in range(4):
                    key = 0
                    for j in range(16):
                        if bits[b * 16 + j]:
                            key |= 1 << j
                    recs[f"b{b}"].append(key)
            yield pd.DataFrame(recs)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def validate_media(
    df: DataFrame,
    payload_col: str,
    out: str = "media_check",
) -> DataFrame:
    """Attach a decode-validation verdict to every media payload — the
    binary-column analog of the text sources' corrupt-row quarantine:
    a 100 TB media ingest cannot let one truncated file kill a job
    hours in, so corruption is detected ONCE at the gate and routed,
    not thrown.

    Adds ``out`` = struct(``format`` string|null, ``ok`` boolean,
    ``error`` string|null): ``format`` from the magic-byte sniff,
    ``ok`` = the REAL codec decoded it, ``error`` the exception text
    for quarantine triage (unknown format → ``format`` null).  One
    Arrow-batched pass; payloads never leave the row.
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<format: string, ok: boolean, error: string>"
    )
    def check(payloads):
        from pgstream_spark.operators import codecs

        fmts, oks, errs = [], [], []
        for raw in payloads:
            b = bytes(raw or b"")
            fmt = codecs.sniff_format(b)
            fmts.append(fmt)
            if fmt is None:
                oks.append(False)
                errs.append("unknown format (no magic match)")
                continue
            try:
                if fmt in ("ppm", "bmp"):
                    codecs.decode_image(b)
                elif fmt == "wav":
                    codecs.decode_wav(b)
                elif fmt == "y4m":
                    codecs.decode_y4m(b)
                oks.append(True)
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 — the POINT is to
                # capture any decode failure as data, not a job kill
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:200])
        return pd.DataFrame({"format": fmts, "ok": oks, "error": errs})

    return df.withColumn(out, check(F.col(payload_col)))


def split_decodable(
    df: DataFrame,
    payload_col: str,
) -> tuple[DataFrame, DataFrame]:
    """(decodable, quarantine) split of a media frame: run
    `validate_media` once, return the clean rows (verdict dropped) and
    the quarantined rows with ``media_format`` / ``media_error``
    columns for triage.  Callers should persist the validated frame if
    they consume both sides (two actions otherwise validate twice)."""
    checked = validate_media(df, payload_col, out="__mc")
    good = checked.filter(F.col("__mc.ok")).drop("__mc")
    bad = (
        checked.filter(~F.col("__mc.ok"))
        .withColumn("media_format", F.col("__mc.format"))
        .withColumn("media_error", F.col("__mc.error"))
        .drop("__mc")
    )
    return good, bad
