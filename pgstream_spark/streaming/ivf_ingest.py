"""Streaming ingestion into a persisted IVF index — the continuous
half of the index lifecycle (`operators/ivf.write_ivf_index` builds,
`append_ivf_index` batch-appends, `ivf_rebuild_needed` monitors drift;
this module keeps the index current from a vector STREAM).

Exactly-once without changing the reader layout: `append` writes are
not redo-safe (a retried micro-batch would duplicate vectors), so each
batch is STAGED to an idempotent ``__ingest__/batch_id=N`` directory
(overwrite-on-redo, the T-3 discipline) and then moved into the
standing ``vectors/bucket=K/`` partitions under DETERMINISTIC
batch-derived file names — a redo regenerates the same names and
``os.replace`` makes the second copy overwrite the first, so duplicates
cannot survive a retry or a crash mid-move.  Readers
(``ivf_query_index``) see the exact same single-level bucket layout as
a batch-built index; probes stay partition-pruned.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ivf_stream_sink"]


def ivf_stream_sink(
    index_path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` writer assigning each micro-batch of vectors to
    the index's existing centroids and landing them in the bucket
    partitions exactly once.  The index at ``index_path`` must already
    exist (``write_ivf_index``); centroid drift from appends is the
    documented trade-off — monitor with ``ivf_rebuild_needed``.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pgstream_spark.operators.ivf import assign_buckets, load_ivf_centroids

        spark = batch_df.sparkSession
        centroids = load_ivf_centroids(spark, index_path)
        bucketed = assign_buckets(
            batch_df.select(
                F.col(corpus_id).alias("neighbor_id"),
                F.col(vec_col).alias("embedding"),
            ),
            centroids,
            vec_col="embedding",
        )
        stage = os.path.join(index_path, "__ingest__", f"batch_id={batch_id}")
        if os.path.exists(stage):
            shutil.rmtree(stage)  # redo of an uncommitted batch
        (
            bucketed.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(stage)
        )
        # a redo may produce fewer files or different buckets than the
        # crashed attempt left behind — remove every trace of this batch
        # id before moving, so the new copy is the ONLY copy
        for stale in glob.glob(
            os.path.join(index_path, "vectors", "bucket=*", f"ingest-b{batch_id}-*.parquet")
        ):
            os.remove(stale)
        # move staged files into the standing layout under deterministic
        # names: redo produces the SAME names, os.replace absorbs it
        for bdir in sorted(glob.glob(os.path.join(stage, "bucket=*"))):
            bucket = os.path.basename(bdir)
            dst_dir = os.path.join(index_path, "vectors", bucket)
            os.makedirs(dst_dir, exist_ok=True)
            files = sorted(
                f for f in os.listdir(bdir) if f.endswith(".parquet")
            )
            for j, fname in enumerate(files):
                os.replace(
                    os.path.join(bdir, fname),
                    os.path.join(dst_dir, f"ingest-b{batch_id}-{j}.parquet"),
                )
        shutil.rmtree(stage, ignore_errors=True)

    return write
