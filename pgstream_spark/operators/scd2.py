"""Slowly-changing-dimension (type 2) history — versioned dimensions.

`streaming/cdc.apply_changes` (t14) materializes the LATEST state per
key; warehouses equally need the *history* form: every version a key
ever had, with its validity interval, so facts can join to the version
that was true at event time (point-in-time correctness — the difference
between a backtest and a lookahead leak in the reference's trading
domain).

``scd2_history`` builds that table from a changelog in one window pass:

* one shuffle+sort per key (`lead()` over (key, seq)) — no self-join,
  no iteration; the same exchange any per-key window costs,
* ``valid_from`` = the change's own timestamp; ``valid_to`` = the NEXT
  change's timestamp (NULL while current) — half-open ``[from, to)``
  intervals, so versions tile each key's timeline without overlap,
* delete ops close the preceding version and emit NO version row —
  a key deleted then re-inserted has a hole in its timeline, exactly
  Postgres-temporal semantics.

``point_in_time_join`` is the read side: facts → the version valid at
fact time.  It reuses the as-of machinery (`operators/asof.py`: union +
window carry — one shuffle + one sort, no Join node) and then applies
the ``valid_to`` bound, which turns as-of's "most recent change ≤ t"
into "version whose interval contains t" (NULL matches inside deletion
holes).  Skew on hot keys takes the same ``salt_buckets`` knob as j8b.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history", "point_in_time_join", "scd2_apply_batch"]


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str | None = None,
    op_col: str | None = None,
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Changelog → versioned dimension with ``[valid_from, valid_to)``.

    ``seq_col`` breaks same-timestamp ties (defaults to ``ts_col``
    alone); ``op_col`` holding ``'D'`` marks deletes (close-only).
    Returns ``(key, valid_from, valid_to, *payload)`` ordered freely.
    """
    order = [F.col(ts_col).asc()] + ([F.col(seq_col).asc()] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    versioned = changes.withColumn("__valid_to", F.lead(ts_col).over(w))
    if op_col is not None:
        versioned = versioned.filter(F.col(op_col) != F.lit("D"))
    return versioned.select(
        F.col(key_col),
        F.col(ts_col).alias("valid_from"),
        F.col("__valid_to").alias("valid_to"),
        *[F.col(c) for c in payload_cols],
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    on: str,
    fact_ts: str,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Facts → the dimension version valid at fact time.

    ``history`` is ``scd2_history`` output.  Result carries every fact
    row; version columns are NULL when the fact time falls before the
    first version or inside a deletion hole.  One shuffle + one sort
    (as-of carry), then the interval bound nullifies carried versions
    whose ``valid_to`` has passed.
    """
    from pgstream_spark.operators.asof import asof_join

    joined = asof_join(
        facts,
        history,
        on=on,
        left_ts=fact_ts,
        right_ts="valid_from",
        direction="backward",
        salt_buckets=salt_buckets,
    )
    ver_cols = [c for c in joined.columns if c.endswith("_r")]
    in_hole = F.col("valid_to_r").isNotNull() & (
        F.col(fact_ts) >= F.col("valid_to_r")
    )
    return joined.select(
        *[c for c in joined.columns if not c.endswith("_r")],
        *[
            F.when(in_hole, F.lit(None)).otherwise(F.col(c)).alias(c)
            for c in ver_cols
        ],
    )


def scd2_apply_batch(
    store_dir: str,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str | None = None,
    op_col: str | None = None,
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Incrementally maintain a PERSISTED SCD2 history from change
    batches — the foreachBatch body of a streaming dimension pipeline.

    Store layout under ``store_dir``: ``log/`` (append-only changes —
    the durable source of truth; deletes live here, since a history row
    can't encode its own deletion timestamp) and ``history/current``
    (the materialized version table, swap-committed).  Per batch the
    history is rebuilt ONLY for the keys the batch touches: untouched
    keys' rows are carried over as-is, affected keys re-window over
    their full change log — O(|touched keys' changes|), not O(|log|),
    because the log is partitioned by a key bucket and the rebuild scan
    prunes to the touched buckets.

    Returns the committed history DataFrame.  Redo-safety: the log
    append uses a batch-content digest directory, so a replayed batch
    overwrites its own directory instead of duplicating rows.
    """
    import os
    import shutil

    spark = batch.sparkSession
    log_dir = os.path.join(store_dir, "log")
    hist_cur = os.path.join(store_dir, "history", "current")
    hist_tmp = os.path.join(store_dir, "history", "__tmp__")
    hist_bak = os.path.join(store_dir, "history", "__bak__")

    # deterministic batch identity → idempotent append (a replay of the
    # same rows lands in the same directory)
    digest = (
        batch.select(
            F.md5(
                F.concat_ws(
                    "\x00",
                    F.col(key_col).cast("string"),
                    F.col(ts_col).cast("string"),
                    *(
                        [F.col(seq_col).cast("string")] if seq_col else []
                    ),
                )
            ).alias("h")
        )
        .agg(F.bit_xor(F.conv(F.substring("h", 1, 15), 16, 10).cast("long")).alias("x"))
        .collect()[0]["x"]
    )
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(64)).alias("__kb")
    batch.withColumn("__kb", bucket).write.mode("overwrite").partitionBy(
        "__kb"
    ).parquet(os.path.join(log_dir, f"batch={digest}"))

    log = spark.read.parquet(log_dir)
    # touched keys as a broadcast semi/anti join, never a collected
    # isin() list — a wide batch would otherwise inflate the plan with
    # a million-literal predicate
    touched = F.broadcast(batch.select(key_col).distinct())
    affected_log = log.join(touched, key_col, "leftsemi")
    rebuilt = scd2_history(
        affected_log, key_col, ts_col, seq_col=seq_col, op_col=op_col,
        payload_cols=payload_cols,
    )

    if os.path.exists(hist_tmp):
        shutil.rmtree(hist_tmp)
    if not os.path.exists(hist_cur) and os.path.exists(hist_bak):
        os.rename(hist_bak, hist_cur)
    if os.path.exists(hist_cur):
        untouched = spark.read.parquet(hist_cur).join(
            touched, key_col, "left_anti"
        )
        merged = untouched.unionByName(rebuilt)
    else:
        merged = rebuilt
    merged.write.mode("overwrite").parquet(hist_tmp)
    if os.path.exists(hist_bak):
        shutil.rmtree(hist_bak)
    if os.path.exists(hist_cur):
        os.rename(hist_cur, hist_bak)
    os.rename(hist_tmp, hist_cur)
    if os.path.exists(hist_bak):
        shutil.rmtree(hist_bak)
    return spark.read.parquet(hist_cur)
