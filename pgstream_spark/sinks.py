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

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "write_partitioned", "co_located_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a parquet catalog table hash-bucketed on
    ``bucket_cols`` (optionally sorted within buckets, which additionally
    removes the Sort from later sort-merge joins on the same key)."""
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format("parquet")
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
) -> None:
    """Write directory-partitioned parquet: one directory per distinct
    value combination of ``partition_cols``; filters on those columns
    prune directories at planning time."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two catalog tables bucketed on ``on`` with equal bucket
    counts.  With ``spark.sql.sources.bucketing.enabled`` (default on)
    the resulting plan has no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
