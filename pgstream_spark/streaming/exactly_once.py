"""Exactly-once delivery (T-3).

The reference wraps its cursor stream in a transaction — rollback on error,
commit on success (`/root/reference/src/Database/PostgreSQL/Stream.hs:253,263-270`)
— so a consumer never observes a half-delivered stream.  Spark's version of
that contract is checkpointing + an idempotent sink: the checkpoint records
which micro-batch is committed; on restart, an uncommitted batch is
re-executed and the sink must make the redo invisible.

``idempotent_parquet_sink`` implements the standard pattern: write each
micro-batch to a deterministic ``batch_id``-derived subdirectory, replacing
whatever a failed earlier attempt of the same batch left behind.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame

__all__ = ["idempotent_parquet_sink"]


def idempotent_parquet_sink(sink_dir: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function writing each micro-batch to
    ``{sink_dir}/batch_id={id}`` with overwrite-on-redo semantics."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        path = os.path.join(sink_dir, f"batch_id={batch_id}")
        if os.path.exists(path):
            shutil.rmtree(path)  # redo of an uncommitted batch: replace, don't append
        batch_df.write.mode("overwrite").parquet(path)

    return write
