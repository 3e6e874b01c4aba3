"""Streaming distribution-drift monitor — the live twin of
`operators/snapshot.histogram_drift` (l60).

A training-data ingest stream should page someone when the incoming
mix shifts — language balance collapses, token lengths spike, a
source floods.  This sink maintains the stream's CUMULATIVE bucket
histogram across micro-batches and records, per batch, the exact
total-variation drift of (a) the batch alone and (b) the stream so
far, against a fixed reference histogram (the last release's profile,
from `histogram_drift`'s count table).

Design (the pg_sink/ivf_ingest lifecycle pattern, adapted to
read-modify-write state):

* State = one tiny ``(bucket, cnt)`` table per applied batch,
  VERSIONED BY BATCH ID (``counts/v<id>``) — O(n_buckets) rows each.
  The previous state is always the version named by the LEDGER's max
  batch id, never "whatever directory exists".
* Commit protocol: write ``counts/v<id>`` and ``log/v<id>`` with
  overwrite (both are pure functions of ledgered-prev + this batch, so
  a replay rewrites them byte-identically), then append the ledger row
  LAST.  A crash anywhere before the ledger append leaves the batch
  unapplied; the replay overwrites the partial outputs and commits.
  A replayed already-ledgered id returns immediately.
* Drift arithmetic is the exact integer cross-multiplication of
  `histogram_drift_counts` — no floats, so every monitor row is
  bit-reproducible from the same inputs, restart or not.

Scale shape: per batch, one map-side-combinable count over the batch
plus joins on O(n_buckets)-row tables — monitor cost is independent of
stream volume.  At 100 TB/day the counts table is still `n_buckets`
rows; only the batch count scan grows, and it is the same scan the
ingest already pays.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["drift_monitor_sink", "read_drift_log"]


def drift_monitor_sink(
    store_dir: str,
    reference_counts: list[tuple[int, int]],
    bucket_col: str,
    n_buckets: int,
    laplace: int = 1,
    alert_tv_micro: int | None = None,
):
    """Return a ``foreachBatch`` function monitoring drift against a
    reference histogram.

    ``reference_counts`` is the released profile as ``(bucket, cnt)``
    pairs (missing buckets count 0).  Per applied batch the monitor
    writes one row under ``<store_dir>/log``: ``(batch_id, n_rows,
    batch_tv_micro, cum_tv_micro, alert)`` where the tv values are
    ``sum(tv_micro) DIV 2`` over the bins (total-variation distance in
    micro units, exact) and ``alert`` fires when the CUMULATIVE drift
    exceeds ``alert_tv_micro``.
    """
    ref = [(int(b), int(c)) for b, c in reference_counts]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pgstream_spark.operators.snapshot import histogram_drift_counts

        spark = batch_df.sparkSession
        ledger_dir = os.path.join(store_dir, "ledger")

        try:
            applied = {
                r.batch_id for r in spark.read.parquet(ledger_dir).collect()
            }
        except Exception:
            applied = set()
        if batch_id in applied:
            return  # replay of a committed batch — nothing to redo

        bc = (
            batch_df.select(F.col(bucket_col).cast("long").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        batch_rows = [(r.bucket, r.cnt) for r in bc.collect()]  # O(buckets)
        n_rows = sum(c for _, c in batch_rows)

        prev_rows: list[tuple[int, int]] = []
        if applied:
            prev_rows = [
                (r.bucket, r.cnt)
                for r in spark.read.parquet(
                    os.path.join(store_dir, "counts", f"v{max(applied)}")
                ).collect()
            ]
        merged: dict[int, int] = {}
        for b, c in prev_rows + batch_rows:
            merged[b] = merged.get(b, 0) + c
        cum_rows = sorted(merged.items())

        ref_df = spark.createDataFrame(
            ref or [(0, 0)], "bucket long, cnt_b long"
        )

        def tv_of(rows: list[tuple[int, int]]) -> int:
            a_df = spark.createDataFrame(
                rows or [(0, 0)], "bucket long, cnt_a long"
            )
            bins = histogram_drift_counts(
                a_df, ref_df, n_buckets, laplace
            ).collect()
            return sum(r.tv_micro for r in bins) // 2

        batch_tv = tv_of(batch_rows)
        cum_tv = tv_of(cum_rows)
        alert = bool(alert_tv_micro is not None and cum_tv > alert_tv_micro)

        # versioned outputs first (overwrite — a replay after a crash
        # rewrites them identically from the ledgered prev), ledger LAST
        spark.createDataFrame(
            cum_rows or [(0, 0)], "bucket long, cnt long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_dir, "counts", f"v{batch_id}")
        )
        spark.createDataFrame(
            [(int(batch_id), int(n_rows), int(batch_tv), int(cum_tv), alert)],
            "batch_id long, n_rows long, batch_tv_micro long, "
            "cum_tv_micro long, alert boolean",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_dir, "log", f"v{batch_id}")
        )
        spark.createDataFrame([(int(batch_id),)], "batch_id long").write.mode(
            "append"
        ).parquet(ledger_dir)  # the commit point

    return apply_batch


def read_drift_log(spark, store_dir: str) -> DataFrame:
    """The monitor's per-batch drift log (committed batches only),
    ordered by batch id."""
    ledger = spark.read.parquet(os.path.join(store_dir, "ledger"))
    log = spark.read.parquet(os.path.join(store_dir, "log", "v*"))
    return log.join(ledger, "batch_id").orderBy("batch_id")
