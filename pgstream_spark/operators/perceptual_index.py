"""Incremental PERCEPTUAL near-dup index — the media twin of
``operators/neardup_index`` (which signs TEXT with MinHash): banded
dHash / audio-fingerprint signatures are persisted once, and each new
batch of assets is (1) signed through the real codec path
(``multimodal.dhash_signatures`` / ``audio_fingerprint``), (2) probed
against the index for cross-batch candidates by (band, key) equality,
(3) verified by exact hamming distance, and (4) appended idempotently
— so daily media ingest costs O(batch), never O(corpus).

Index layout: a parquet directory PARTITIONED BY ``batch`` of
``(band, key, id, b0, b1, b2, b3)`` rows — the four 16-bit band keys
both ARE the LSH buckets and CARRY the full signature, so the probe
verifies hamming without a second lookup — plus a ``_manifest.json``
(reused verbatim from the text index: Hadoop-FS-routed, atomic
replace) pinning the signature format and the ingest ledger.

Exactly-once ingest: same contract as the text index — every append
carries a caller-chosen ``batch_id``; a replayed batch overwrites its
own ``batch=<id>`` partition via dynamic partition overwrite instead
of blind-appending, and a batch already in the ledger is a no-op.
One writer at a time per index path.

Recall contract: two signatures within hamming ``h < 4`` agree on at
least one of the four bands (pigeonhole), so probing at
``max_hamming <= 3`` finds EVERY qualifying cross-batch pair — the
same guarantee `multimodal.dhash_candidate_pairs` gives in-batch.

Scale shape: the probe BROADCASTS the batch's banded rows (4 × |batch|
tiny rows) against the index scan, so the index — the big side — is
never shuffled; verification is a column expression on the joined
rows (``bit_count``/``xor``, whole-stage codegen), no join-back.

Reference parity note: like the text index, this has no reference
counterpart — it is part of the training-data tier this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgstream_spark.operators.neardup_index import (
    _read_manifest,
    _write_manifest,
)

__all__ = [
    "write_perceptual_index",
    "append_perceptual_index",
    "probe_perceptual_index",
    "foreach_batch_perceptual_appender",
]

_FORMAT = "banded-sig64-v1"
_BANDS = 4


def _banded_rows(sigs: DataFrame) -> DataFrame:
    """(id, b0..b3) → exploded (band, key, id, b0..b3) rows."""
    return sigs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"), F.col(f"b{k}").alias("key")
                    )
                    for k in range(_BANDS)
                ]
            )
        ).alias("__b"),
        "id",
        *[f"b{k}" for k in range(_BANDS)],
    ).select(
        F.col("__b.band").alias("band"),
        F.col("__b.key").alias("key"),
        "id",
        *[f"b{k}" for k in range(_BANDS)],
    )


def _sig_fingerprint(sigs: DataFrame) -> tuple[int, int]:
    """Order-independent (n, xor-of-xxhash64) content fingerprint of a
    signature frame — incremental under append (XOR is associative)."""
    row = sigs.select(
        F.count(F.lit(1)).alias("n"),
        # bit_xor is a true aggregate — map-side combinable, never
        # materializes the hash list
        F.expr("bit_xor(xxhash64(id, b0, b1, b2, b3))").alias("fp"),
    ).collect()[0]
    return int(row.n), int(row.fp or 0)


def write_perceptual_index(
    sigs: DataFrame,
    path: str,
    batch_id: str = "0",
) -> dict:
    """Create a perceptual index at ``path`` from a signature frame
    (``(id, b0..b3)`` — `dhash_signatures`/`audio_fingerprint` output).
    Refuses to overwrite an existing index (append instead)."""
    spark = sigs.sparkSession
    try:
        _read_manifest(spark, path)
        exists = True
    except Exception:  # noqa: BLE001 — local missing file raises
        # FileNotFoundError; scheme'd paths surface a JVM IOException —
        # either way an unreadable manifest means "no index here"
        exists = False
    if exists:
        raise ValueError(
            f"perceptual index already exists at {path}; use "
            "append_perceptual_index"
        )
    # one evaluation of the (possibly codec-decoding) signature
    # lineage for BOTH the fingerprint collect and the parquet write
    sigs = sigs.persist()
    try:
        n, fp = _sig_fingerprint(sigs)
        # pin static overwrite: under a session-wide
        # spark.sql.sources.partitionOverwriteMode=dynamic, a plain
        # overwrite+partitionBy would replace only the incoming batch
        # partition and leave stale batch=<id> dirs under a
        # freshly-stamped manifest (ghost probe hits)
        _banded_rows(sigs).withColumn(
            "batch", F.lit(str(batch_id))
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "static"
        ).partitionBy("batch").parquet(path)
    finally:
        sigs.unpersist()
    manifest = {
        "format": _FORMAT,
        "bands": _BANDS,
        "ledger": [str(batch_id)],
        "n_sigs": n,
        "fingerprint": fp,
    }
    _write_manifest(spark, path, manifest)
    return manifest


def append_perceptual_index(
    sigs: DataFrame,
    path: str,
    batch_id: str,
) -> dict:
    """Idempotently append a batch's signatures.  A batch_id already in
    the ledger is a no-op; a replayed half-written batch overwrites its
    own partition (dynamic partition overwrite) before the ledger
    records it — the parquet-then-manifest commit order of the text
    index."""
    spark = sigs.sparkSession
    manifest = _read_manifest(spark, path)
    if manifest.get("format") != _FORMAT:
        raise ValueError(
            f"index at {path} has format {manifest.get('format')!r}, "
            f"expected {_FORMAT!r}"
        )
    if str(batch_id) in manifest["ledger"]:
        return manifest
    sigs = sigs.persist()  # decode once for fingerprint + write
    try:
        n, fp = _sig_fingerprint(sigs)
        (
            _banded_rows(sigs)
            .withColumn("batch", F.lit(str(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(path)
        )
    finally:
        sigs.unpersist()
    manifest["ledger"].append(str(batch_id))
    manifest["n_sigs"] = int(manifest["n_sigs"]) + n
    manifest["fingerprint"] = int(manifest["fingerprint"]) ^ fp
    _write_manifest(spark, path, manifest)
    return manifest


def probe_perceptual_index(
    spark: SparkSession,
    path: str,
    sigs: DataFrame,
    max_hamming: int = 3,
    allow_approx: bool = False,
) -> DataFrame:
    """Cross-batch candidates: every (new asset, indexed asset) pair
    within ``max_hamming`` differing signature bits.  Exact recall for
    ``max_hamming <= 3`` (pigeonhole over the four bands); larger
    thresholds need ``allow_approx=True``.

    Returns ``(id_new, id_indexed, hamming)``.  Pairs where the new
    batch collides with itself are NOT reported (probe then append —
    in-batch dedup is `dhash_candidate_pairs`' job)."""
    if max_hamming >= _BANDS and not allow_approx:
        raise ValueError(
            "banded recall is exact only for max_hamming <= 3; pass "
            "allow_approx=True to accept missed pairs"
        )
    manifest = _read_manifest(spark, path)
    if manifest.get("format") != _FORMAT:
        raise ValueError(
            f"index at {path} has format {manifest.get('format')!r}, "
            f"expected {_FORMAT!r}"
        )
    index = spark.read.parquet(path)
    batch = _banded_rows(sigs).select(
        "band",
        "key",
        F.col("id").alias("id_new"),
        *[F.col(f"b{k}").alias(f"__n{k}") for k in range(_BANDS)],
    )
    ham = sum(
        F.bit_count(F.col(f"__n{k}").bitwiseXOR(F.col(f"b{k}")))
        for k in range(_BANDS)
    )
    return (
        index.join(F.broadcast(batch), ["band", "key"])
        .filter(F.col("id") != F.col("id_new"))
        .select(
            "id_new",
            F.col("id").alias("id_indexed"),
            *[f"__n{k}" for k in range(_BANDS)],
            *[f"b{k}" for k in range(_BANDS)],
        )
        .distinct()
        .select(
            "id_new",
            "id_indexed",
            ham.cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def foreach_batch_perceptual_appender(path: str, sign):
    """``writeStream.foreachBatch`` sink that signs each micro-batch of
    media assets and appends the signatures to the index EXACTLY ONCE —
    the media twin of ``neardup_index.foreach_batch_appender``.
    ``sign`` maps the micro-batch DataFrame to a signature frame
    ``(id, b0..b3)`` (e.g. ``lambda df: dhash_signatures(df, "payload",
    "asset_id")``); the batch id is Spark's ``batchId``, stable across
    restarts from the same checkpoint, so a replayed micro-batch lands
    as a ledger no-op / partition overwrite instead of duplicate
    signature rows::

        (assets_stream.writeStream
            .foreachBatch(foreach_batch_perceptual_appender(
                "/idx/path",
                lambda df: dhash_signatures(df, "payload", "asset_id")))
            .option("checkpointLocation", ck)
            .start())

    The first batch bootstraps the index if none exists.
    """

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        sigs = sign(batch_df)
        try:
            _read_manifest(batch_df.sparkSession, path)
            bootstrapped = True
        except Exception:  # noqa: BLE001 — unreadable manifest = absent
            bootstrapped = False
        if bootstrapped:
            append_perceptual_index(sigs, path, f"stream-{batch_id}")
        else:
            write_perceptual_index(sigs, path, batch_id=f"stream-{batch_id}")

    return _append
