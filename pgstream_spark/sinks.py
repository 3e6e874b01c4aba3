"""Write paths tuned for re-reading at scale — SURVEY §2 S-4 extension.

The reference's sink is the Postgres table it streams into
(`/root/reference/src/PostgreSQL/Stream.hs:97` — the server owns the
layout).  On Spark the writer *chooses* the layout, and at 100 TB the
choice decides whether every later join/filter shuffles or not:

* ``write_bucketed``    — hash-bucketed catalog table.  Two tables
  bucketed by the same key with the same bucket count join with **no
  exchange on either side**: the scan itself satisfies the required
  hash distribution.  This is how a fact table that is joined daily by
  the same key amortizes its shuffle exactly once, at write time.
* ``write_partitioned`` — directory-partitioned parquet.  Partition
  values become directory names; a filter on the partition column
  prunes whole directories at planning time (``PartitionFilters`` in
  the scan) — the 100 TB analogue of an index range scan.
* ``co_located_join``   — the read side: join two same-bucketed tables
  and (verifiably, see ``tests/test_sinks.py``) produce a plan with no
  Exchange.

Bucket-file hygiene: a naive ``bucketBy`` write emits
``input_partitions x n_buckets`` files; the writer repartitions by the
bucket key first so each bucket lands in one file per write.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_bucketed",
    "write_partitioned",
    "co_located_join",
    "write_clustered",
    "write_zordered",
    "compact_dir",
    "export_shards",
    "ROW_GROUP_BYTES",
]

# Max parquet row-group size every writer in this module enforces
# (``parquet.block.size``).  Scan splits are ROW-GROUP-bounded no matter
# what ``spark.sql.files.maxPartitionBytes`` asks for, so one writer task
# emitting a single giant row group caps the parallelism of every later
# read of that artifact (measured: the sf1 single-write_table file ran
# l69's scan stage on ONE thread while the 100-row-group sf10 file used
# all 32 — SCALE.md "row-group granularity gates the scan stage").
# 32 MB keeps a 1 GB task output splittable ~32 ways while staying large
# enough that footer/stat overhead stays negligible.
ROW_GROUP_BYTES = 32 << 20


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    row_group_bytes: int = ROW_GROUP_BYTES,
) -> None:
    """Save ``df`` as a parquet catalog table hash-bucketed on
    ``bucket_cols`` (optionally sorted within buckets, which additionally
    removes the Sort from later sort-merge joins on the same key)."""
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format("parquet")
        .option("parquet.block.size", row_group_bytes)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    row_group_bytes: int = ROW_GROUP_BYTES,
) -> None:
    """Write directory-partitioned parquet: one directory per distinct
    value combination of ``partition_cols``; filters on those columns
    prune directories at planning time."""
    (
        df.write.mode(mode)
        .option("parquet.block.size", row_group_bytes)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    mode: str = "overwrite",
    row_group_bytes: int = ROW_GROUP_BYTES,
) -> None:
    """Range-cluster ``df`` on ``cluster_cols`` into ``n_files`` sorted
    files — the data-skipping write path.

    ``repartitionByRange`` gives each file a disjoint value range (sampled
    boundaries) and the in-file sort tightens parquet row-group min/max
    stats, so a later filter on the cluster column skips whole files via
    footer stats — the poor-man's z-order, and the right layout for a
    column that is filtered far more often than it is joined.  (For join
    keys prefer ``write_bucketed``: range files serve range *filters*,
    buckets serve equi-*joins*.)  ``tests/test_sinks.py`` pins the
    disjointness by reading the footers back.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .option("parquet.block.size", row_group_bytes)
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int,
    bits: int = 8,
    mode: str = "overwrite",
    row_group_bytes: int = ROW_GROUP_BYTES,
) -> None:
    """Z-order (Morton-curve) cluster ``df`` on TWO OR MORE numeric
    columns so footer-stat skipping works on EVERY z-column, not just
    the leading one — the layout Delta's OPTIMIZE ZORDER provides,
    built from Spark primitives.

    ``write_clustered`` is strictly better for a single filter column,
    but lexicographic range-clustering on (a, b) leaves b's per-file
    min/max spanning the whole domain — a filter on b alone skips
    nothing.  Z-ordering interleaves the bit patterns of each column's
    ``bits``-bit QUANTILE rank (rank, not raw value, so skewed columns
    spread evenly) and range-partitions on the interleaved key: every
    file then covers a small hyper-rectangle of the joint domain, so
    min/max pruning bites on any z-column.

    Scale shape: quantile boundaries come from ONE distributed
    ``approxQuantile`` pass (2^bits doubles per column to the driver —
    KB-sized); the rank is then a map-only count-of-boundaries-≤-value
    over the literal boundary array, the interleave pure bit arithmetic,
    and the write the same repartitionByRange + in-file sort as
    ``write_clustered``.  No global window anywhere — a percent_rank
    formulation would funnel the corpus through one partition.  Past ~4
    columns each column's skipping power dilutes (bits per column
    shrink) — the standard z-order caveat.
    """
    if len(zorder_cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use write_clustered for 1")
    if bits * len(zorder_cols) > 62:
        raise ValueError(
            f"bits({bits}) × columns({len(zorder_cols)}) must fit a long"
        )
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    all_bounds = df.stat.approxQuantile(
        list(zorder_cols), probs, 1.0 / (4 << bits)
    )
    ranked = df
    rank_cols = []
    for c, bounds in zip(zorder_cols, all_bounds):
        rc = f"__zr_{c}"
        lit_bounds = F.array(*[F.lit(float(b)) for b in bounds])
        ranked = ranked.withColumn(
            rc,
            F.size(
                F.filter(lit_bounds, lambda b: b <= F.col(c).cast("double"))
            ).cast("long"),
        )
        rank_cols.append(rc)
    # Morton interleave: output bit (i*n + j) takes bit i of column j
    n = len(rank_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, rc in enumerate(rank_cols):
            bit = F.shiftright(F.col(rc), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    (
        ranked.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *rank_cols)
        .write.mode(mode)
        .option("parquet.block.size", row_group_bytes)
        .parquet(path)
    )


def compact_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    row_group_bytes: int = ROW_GROUP_BYTES,
) -> int:
    """Compact a directory of small parquet files into ~``target``-sized
    ones; returns the new file count.

    The standard maintenance pass after streaming/micro-batch ingestion:
    a file-per-trigger sink accretes thousands of KB-sized files, and at
    100 TB the scan's task count (and the namenode/liststore load) is set
    by file count, not bytes.  Local-FS swap is rename-based; on an
    object store write to a versioned prefix and flip a manifest instead
    (documented, not emulated here).

    If the directory carries a `sources/skipping` stats manifest, it is
    rebuilt after the swap with the same stat columns — compaction
    changes every file, so the old rows would misdescribe all of them.
    """
    from pgstream_spark.sources.skipping import (
        MANIFEST_NAME,
        write_stats_manifest,
    )

    def _is_data(f: str) -> bool:
        return f.endswith(".parquet") and not f.startswith(("_", "."))

    from pgstream_spark.sources.skipping import _BLOOM_KM

    stat_cols: list | None = None
    bloom_params: dict[str, tuple[int, int]] = {}
    old_manifest = os.path.join(path, MANIFEST_NAME)
    if os.path.exists(old_manifest):
        import pyarrow.parquet as pq

        names = pq.read_schema(old_manifest).names
        stat_cols = sorted(
            c[len("min_"):] for c in names if c.startswith("min_")
        )
        # bloom sidecars are invalidated by compaction (every file is
        # new) — recover each column's geometry from any existing blob
        # (self-describing: k byte + bitmap) so they can be REBUILT
        # after the swap rather than silently dropped
        bloom_cols = [
            c[len("bloom_"):] for c in names if c.startswith("bloom_")
        ]
        if bloom_cols:
            rows = pq.read_table(
                old_manifest, columns=[f"bloom_{c}" for c in bloom_cols]
            ).to_pylist()
            for c in bloom_cols:
                blob = next(
                    (r[f"bloom_{c}"] for r in rows if r.get(f"bloom_{c}")),
                    None,
                )
                if blob is not None:
                    bloom_params[c] = (
                        (len(blob) - 1) * 8,
                        blob[0] & ~_BLOOM_KM,  # mask the format tag off k
                    )
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(path)
        for f in files
        if _is_data(f)
    )
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    (
        df.repartition(n)
        .write.mode("overwrite")
        .option("parquet.block.size", row_group_bytes)
        .parquet(tmp)
    )
    bak = path.rstrip("/") + ".__compact_bak__"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    if stat_cols is not None:
        write_stats_manifest(spark, path, stat_cols)
        if bloom_params:
            from pgstream_spark.sources.skipping import add_bloom_sidecar

            for c, (m_bits, k) in sorted(bloom_params.items()):
                add_bloom_sidecar(spark, path, c, m_bits=m_bits, k=k)
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if _is_data(f)
    )


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    mode: str = "overwrite",
    row_group_bytes: int = ROW_GROUP_BYTES,
) -> None:
    """Export ``df`` as ``n_shards`` deterministic training shards.

    Shard assignment is ``xxhash64(id) mod n`` — derived from row
    CONTENT, not from Spark's partitioning — so re-running the export on
    a differently-partitioned (or differently-sized-cluster) input puts
    every record in the SAME shard: the reproducibility contract a
    training-data export needs (shard k of a 100 TB corpus is a stable,
    addressable unit across pipeline re-runs).  Directory layout is
    ``shard=K/`` via ``partitionBy``; the pre-repartition on the shard
    id yields one file per shard per write.
    """
    from pyspark.sql import functions as F

    sharded = df.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int"),
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode(mode)
        .option("parquet.block.size", row_group_bytes)
        .partitionBy("shard")
        .parquet(path)
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two catalog tables bucketed on ``on`` with equal bucket
    counts.  With ``spark.sql.sources.bucketing.enabled`` (default on)
    the resulting plan has no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
