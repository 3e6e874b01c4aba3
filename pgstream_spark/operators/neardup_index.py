"""Incremental near-duplicate index — the ingest-time counterpart of the
batch MinHash+LSH pipeline (``operators/dedup.py``).

A 100 TB corpus is not re-banded every time a batch arrives: the banded
signature rows are PERSISTED once, and each new batch is (1) signed, (2)
probed against the index for cross-batch candidates, (3) verified
exactly, and (4) appended — so daily ingest costs O(batch), never
O(corpus).  This is the near-dup analogue of ``dedup_against_history``
(exact keys) and of the persisted IVF index (``operators/ivf.py``).

Index layout: a parquet directory PARTITIONED BY ``batch`` (the ingest
ledger — see below) of ``(band, bucket, bkey, id)`` rows — ``bucket``
is the 64-bit band hash (compact shuffle/join key), ``bkey`` the band's
raw signature slice (joins re-check it, so a 2⁻⁶⁴ hash collision can
never smuggle in a candidate the exact banding would not produce) —
plus a ``_manifest.json`` pinning the signature parameters; probe and
append refuse an index written under different ones.

Exactly-once ingest: every append carries a caller-chosen ``batch_id``.
The batch's rows land in the ``batch=<id>`` partition via DYNAMIC
partition overwrite, and the manifest records the id in a ledger — so a
REPLAYED batch (retry after a crash, an at-least-once upstream)
overwrites its own partition instead of blind-appending duplicate
signature rows, and a batch already in the ledger is a no-op.  The
commit order is parquet-then-manifest: a crash between the two leaves a
partition the retry overwrites byte-compatibly.  Same idempotency
contract as ``streaming/exactly_once.py``'s batch-id ledger, expressed
in the layout instead of a side table.  (One writer at a time per index
path — the manifest is a read-modify-write, like any ingest ledger.)

Corpus identity: the manifest also pins a content FINGERPRINT of the
indexed corpus — row count plus the XOR of ``xxhash64(id, text)`` over
all indexed documents (order-independent, and incremental: an append
XORs the batch's fingerprint in).  ``probe_neardup_index`` accepts the
history frame via ``expected_corpus`` and REFUSES a stale index whose
recorded fingerprint no longer matches — the guard for cached /
reused index paths whose underlying corpus was regenerated in place.

Manifest I/O goes through Hadoop's FileSystem API whenever ``path``
carries a scheme (``hdfs://``, ``s3a://``, …), so the index works on
any filesystem the Spark cluster can reach; bare local paths use plain
``open()``/``os.rename()`` (atomic on POSIX).

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
    "corpus_fingerprint",
    "index_corpus_info",
    "foreach_batch_appender",
]

# underscore prefix: Spark/Hadoop's default path filter skips it (the
# _SUCCESS convention), so the manifest can live beside the parquet
_MANIFEST = "_manifest.json"

# partition value for the initial write (appends use caller batch ids)
_BASE_BATCH = "__base__"


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


def corpus_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Content identity of a document set: ``{"count", "fp"}`` where
    ``fp`` is the XOR of ``xxhash64(id, text)`` over all rows — order-
    independent (XOR commutes) and incremental (the fingerprint of a
    union is the XOR of the parts), so an append updates it in O(batch).
    One map-side-combinable aggregation; no shuffle beyond the final
    single-row combine."""
    row = (
        docs.select(F.xxhash64(F.col(id_col), F.col(text_col)).alias("__h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(__h)").alias("fp"),
        )
        .collect()[0]
    )
    return {"count": int(row["n"]), "fp": int(row["fp"] or 0)}


# ---------------------------------------------------------------------
# manifest I/O — Hadoop FileSystem when the path has a scheme, plain
# local files otherwise (atomic POSIX rename as the commit point)
# ---------------------------------------------------------------------

def _write_manifest(spark: SparkSession, path: str, manifest: dict) -> None:
    text = json.dumps(manifest, sort_keys=True)
    if "://" in path:
        jvm = spark._jvm
        gw = spark.sparkContext._gateway
        conf = spark._jsc.hadoopConfiguration()
        dst = jvm.org.apache.hadoop.fs.Path(os.path.join(path, _MANIFEST))
        tmp = jvm.org.apache.hadoop.fs.Path(
            os.path.join(path, _MANIFEST + ".tmp")
        )
        fs = dst.getFileSystem(conf)
        out = fs.create(tmp, True)
        out.write(bytearray(text, "utf-8"))
        out.close()
        # FileContext.rename(.., Rename.OVERWRITE) is the ATOMIC
        # replace-commit (plain FileSystem.rename refuses to clobber on
        # HDFS, and delete-then-rename would leave a manifest-less —
        # bricked — index if the process died between the two)
        ren = jvm.org.apache.hadoop.fs.Options.Rename
        opts = gw.new_array(ren, 1)
        opts[0] = ren.OVERWRITE
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            dst.toUri(), conf
        )
        fc.rename(tmp, dst, opts)
        return
    tmp_local = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp_local, "w") as fh:
        fh.write(text)
    os.rename(tmp_local, os.path.join(path, _MANIFEST))  # commit point


def _read_manifest(spark: SparkSession, path: str) -> dict:
    if "://" in path:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        src = jvm.org.apache.hadoop.fs.Path(os.path.join(path, _MANIFEST))
        fs = src.getFileSystem(conf)
        stream = fs.open(src)
        try:
            raw = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return json.loads(bytes(raw).decode("utf-8"))
    with open(os.path.join(path, _MANIFEST)) as fh:
        return json.load(fh)


def index_corpus_info(spark: SparkSession, path: str) -> dict:
    """The manifest's recorded corpus identity and ingest ledger:
    ``{"corpus": {"count", "fp"}, "batches": [ids...]}``."""
    m = _read_manifest(spark, path)
    return {
        "corpus": m.get("corpus"),
        "batches": sorted(m.get("batches", {})),
    }


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
        rows.withColumn("batch", F.lit(_BASE_BATCH))
        .repartition(n_files, "band", "bucket")
        .sortWithinPartitions("band", "bucket")
        .write.mode("overwrite")
        # a REBUILD must drop every partition, including appended
        # batch=<id> ones — pin static overwrite so a session-wide
        # dynamic partitionOverwriteMode cannot leave stale batches
        # under a freshly-stamped manifest
        .option("partitionOverwriteMode", "static")
        .option("parquet.block.size", ROW_GROUP_BYTES)
        .partitionBy("batch")
        .parquet(path)
    )
    manifest = dict(params)
    manifest["corpus"] = corpus_fingerprint(docs, id_col, text_col)
    manifest["batches"] = {}
    _write_manifest(docs.sparkSession, path, manifest)


def append_neardup_index(
    docs: DataFrame,
    path: str,
    batch_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> bool:
    """Append a new batch's banded rows (the post-probe ingest step) —
    RETRY-IDEMPOTENT via the manifest's batch ledger.

    Signature parameters come from the manifest, so an index is
    internally consistent by construction.  ``batch_id`` names the
    ingest batch (an upstream epoch / file / offset-range id): a replay
    of a ledgered batch is a no-op, a replay of a HALF-applied batch
    (crash between the parquet write and the manifest commit)
    dynamically OVERWRITES its own ``batch=<id>`` partition — the index
    row count is the same whether a batch is delivered once or five
    times.  Returns True when the batch was applied, False for a
    ledgered replay.  Wire this from ``foreachBatch`` with Spark's
    ``batchId`` for exactly-once streaming ingest (see
    ``streaming/exactly_once.py`` for the same pattern on row sinks).
    """
    if not batch_id or batch_id == _BASE_BATCH:
        raise ValueError(f"batch_id must be a non-empty id, not {batch_id!r}")
    spark = docs.sparkSession
    manifest = _read_manifest(spark, path)
    if batch_id in manifest.get("batches", {}):
        return False  # ledgered — the batch is fully applied
    rows = _banded(docs, id_col, text_col, manifest)
    from pgstream_spark.sinks import ROW_GROUP_BYTES

    (
        rows.withColumn("batch", F.lit(batch_id))
        .repartition(
            spark.sparkContext.defaultParallelism, "band", "bucket"
        )
        .write.mode("overwrite")
        # dynamic: only the batch=<id> partition present in this write
        # is replaced — the rest of the index is untouched, and a retry
        # replaces the same partition instead of appending beside it
        .option("partitionOverwriteMode", "dynamic")
        .option("parquet.block.size", ROW_GROUP_BYTES)
        .partitionBy("batch")
        .parquet(path)
    )
    fp = corpus_fingerprint(docs, id_col, text_col)
    corpus = manifest.get("corpus", {"count": 0, "fp": 0})
    manifest["corpus"] = {
        "count": corpus["count"] + fp["count"],
        "fp": corpus["fp"] ^ fp["fp"],
    }
    manifest.setdefault("batches", {})[batch_id] = fp
    _write_manifest(spark, path, manifest)  # ledger commit point
    return True


def foreach_batch_appender(
    path: str, id_col: str = "doc_id", text_col: str = "text"
):
    """``writeStream.foreachBatch`` sink that appends each micro-batch to
    the index EXACTLY ONCE: the batch id is Spark's ``batchId``, which is
    stable across restarts from the same checkpoint, so a replayed
    micro-batch (failure between the append and the checkpoint commit)
    lands in the ledger as a no-op / partition overwrite instead of
    duplicate signature rows — the same guarantee ``streaming/
    exactly_once.py`` gives row sinks, for the signature store::

        (docs_stream.writeStream
            .foreachBatch(foreach_batch_appender("/idx/path"))
            .option("checkpointLocation", ck)
            .start())
    """

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        append_neardup_index(
            batch_df, path, f"stream-{batch_id}", id_col, text_col
        )

    return _append


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
    expected_corpus: DataFrame | None = None,
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

    ``expected_corpus``: pass the HISTORY frame (the documents the index
    was built/appended from) and the probe verifies its content
    fingerprint against the manifest's, refusing a stale index whose
    corpus was regenerated in place (one cheap aggregation over the
    history ids+texts; skip it on hot paths that own their index
    lifecycle).
    """
    params = _read_manifest(spark, path)
    if expected_corpus is not None:
        want = params.get("corpus")
        got = corpus_fingerprint(expected_corpus, id_col, text_col)
        if want != got:
            raise ValueError(
                f"neardup index at {path} is stale: manifest corpus "
                f"fingerprint {want} != expected corpus {got} — rebuild "
                f"the index (write_neardup_index) or re-point the probe"
            )
    # prune to the signature columns (drops the batch ledger partition)
    idx = spark.read.parquet(path).select("band", "bucket", "bkey", "id")
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
