"""Incremental near-duplicate index — the ingest-time counterpart of the
batch MinHash+LSH pipeline (``operators/dedup.py``).

A 100 TB corpus is not re-banded every time a batch arrives: the banded
signature rows are PERSISTED once, and each new batch is (1) signed, (2)
probed against the index for cross-batch candidates, (3) verified
exactly, and (4) appended — so daily ingest costs O(batch), never
O(corpus).  This is the near-dup analogue of ``dedup_against_history``
(exact keys) and of the persisted IVF index (``operators/ivf.py``).

Index layout: one parquet directory of ``(band, bucket, bkey, id)``
rows — ``bucket`` is the 64-bit band hash (compact shuffle/join key),
``bkey`` the band's raw signature slice (joins re-check it, so a 2⁻⁶⁴
hash collision can never smuggle in a candidate the exact banding would
not produce) — plus a ``manifest.json`` pinning the signature
parameters; probe/append refuse an index written under different ones.

Scale shape: the probe BROADCASTS the batch's banded rows (bands × |batch|
tiny rows) against the index scan, so the index — the big side — is
never shuffled; candidates then deduplicate and verify in O(candidates)
(``verify_candidate_pairs`` economics, transport auto-gated).  The
probe applies the batch path's stop-bucket guard by default
(``dedup.drop_saturated_buckets``, ``bucket_cap="auto"``) so a
saturated vocabulary-artifact bucket cannot grow candidates with
corpus size.

Reference parity note: the reference engine delegates dedup-shaped
workloads to SQL it streams from PostgreSQL (src/PostgreSQL/Stream.hs);
an incremental signature store has no reference counterpart — it is
part of the training-data tier this engine adds.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgstream_spark.operators.dedup import (
    drop_saturated_buckets,
    minhash_signatures,
    verify_candidate_pairs,
)

__all__ = [
    "write_neardup_index",
    "append_neardup_index",
    "probe_neardup_index",
]

# underscore prefix: Spark/Hadoop's default path filter skips it (the
# _SUCCESS convention), so the manifest can live beside the parquet
_MANIFEST = "_manifest.json"


def _banded(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    params: dict,
) -> DataFrame:
    """(band, bucket, bkey, id) rows for every document."""
    sigs = minhash_signatures(
        docs,
        id_col,
        text_col,
        n=params["n"],
        num_perm=params["num_perm"],
        seed=params["seed"],
        hash_fn=params["hash_fn"],
    )
    b, r = params["bands"], params["num_perm"] // params["bands"]
    return sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(b - 1)),
                lambda i: F.slice("sig", i * r + 1, r),
            )
        ).alias("band", "bkey"),
    ).select(
        "band",
        F.xxhash64("bkey", "band").alias("bucket"),
        "bkey",
        "id",
    )


def _write_manifest(path: str, params: dict) -> None:
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(params, fh, sort_keys=True)
    os.rename(tmp, os.path.join(path, _MANIFEST))  # commit point


def _read_manifest(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as fh:
        return json.load(fh)


def write_neardup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 96,
    bands: int = 12,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    n_files: int | None = None,
) -> None:
    """Create the index from an initial corpus (overwrites ``path``)."""
    if num_perm % bands:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
    params = {
        "n": n,
        "num_perm": num_perm,
        "bands": bands,
        "seed": seed,
        "hash_fn": hash_fn,
    }
    rows = _banded(docs, id_col, text_col, params)
    if n_files is None:
        n_files = docs.sparkSession.sparkContext.defaultParallelism
    from pgstream_spark.sinks import ROW_GROUP_BYTES

    (
        rows.repartition(n_files, "band", "bucket")
        .sortWithinPartitions("band", "bucket")
        .write.mode("overwrite")
        .option("parquet.block.size", ROW_GROUP_BYTES)
        .parquet(path)
    )
    _write_manifest(path, params)


def append_neardup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append a new batch's banded rows (the post-probe ingest step).
    Parameters come from the manifest — an index is internally consistent
    by construction."""
    params = _read_manifest(path)
    rows = _banded(docs, id_col, text_col, params)
    from pgstream_spark.sinks import ROW_GROUP_BYTES

    (
        rows.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "band", "bucket"
        )
        .write.mode("append")
        .option("parquet.block.size", ROW_GROUP_BYTES)
        .parquet(path)
    )


def probe_neardup_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    measure: str = "jaccard",
    bucket_cap: int | None | str = "auto",
    broadcast_batch: bool = True,
    transport: str = "auto",
) -> DataFrame:
    """Cross-batch near-dup pairs: (id_a = indexed doc, id_b = batch doc,
    <measure>) with score >= threshold.

    ``corpus`` must hold the TEXTS of both sides (indexed history and the
    batch) — the index stores only signatures, so exact verification
    reads texts from the corpus the caller owns.  ``broadcast_batch``
    (default) ships the batch's banded rows to the index scan so the
    index never shuffles; disable for batches too large to broadcast
    (the join then shuffles both sides on (band, bucket)).
    ``bucket_cap`` is the SAME stop-bucket guard the batch path applies
    (``dedup.drop_saturated_buckets``, default ``"auto"`` = 32× the
    exact median index-bucket size, floored at 64): a saturated
    vocabulary-artifact bucket would otherwise pair |bucket| × |batch|
    rows per probe — candidate count growing with CORPUS size, the
    exact break of the O(batch) ingest contract.  On an artifact-free
    corpus auto is result-identical to ``None`` (uncapped).
    """
    params = _read_manifest(path)
    idx = spark.read.parquet(path)
    if bucket_cap is not None:
        idx = drop_saturated_buckets(idx, bucket_cap)
    probe = _banded(batch, id_col, text_col, params).withColumnRenamed(
        "id", "__pid"
    )
    if broadcast_batch:
        probe = F.broadcast(probe)
    cands = (
        idx.join(
            probe.withColumnRenamed("bkey", "__pkey"),
            ["band", "bucket"],
        )
        # hash buckets are the compact join key; the raw slices make the
        # candidate set EXACTLY the banding's (no 2^-64 collision noise)
        .filter((F.col("bkey") == F.col("__pkey")) & (F.col("id") != F.col("__pid")))
        .select(F.col("id").alias("id_a"), F.col("__pid").alias("id_b"))
        .distinct()
    )
    return verify_candidate_pairs(
        cands,
        corpus,
        id_col,
        text_col,
        n=params["n"],
        threshold=threshold,
        measure=measure,
        transport=transport,
    )
