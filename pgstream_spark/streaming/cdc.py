"""CDC change application — materialize a replica table from a base
snapshot plus a change stream.

The reference library exists to consume Postgres streams
(`/root/reference/src/PgStream/Stream.hs` — COPY/cursor delivery of
row changes); the natural downstream operator is *applying* such a
stream: given a base snapshot and (key, seq, op, payload) change rows,
produce the table state after all changes — last-write-wins per key,
deletes removing rows, upserts inserting-or-replacing.

Spark-first shape: latest change per key via one window (`row_number`
over seq desc — partial top-1 pushdown keeps the shuffle at one row per
key), then ONE full-outer join against the base. No iteration, no
driver involvement; at 100 TB both sides shuffle once on the key (or
zero times if base and changelog are bucketed by key — the layout a
standing replica would use).

Batch-mode is the oracle-checkable path; the same latest-per-key +
merge logic runs incrementally per micro-batch with
``applyInPandasWithState`` (T-8 machinery) when the changelog is a
stream — each batch's changes fold into state keyed the same way.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["apply_changes", "materialized_replica_sink", "read_replica", "scd2_stream_sink"]


def _recover_replica(replica_dir: str) -> None:
    """Repair an interrupted swap so a restart never loses the replica.

    The swap sequence is: write ``__tmp__`` fully → rename ``current`` →
    ``__bak__`` → rename ``__tmp__`` → ``current`` → rmtree ``__bak__``.
    A crash can strand three states, each with an unambiguous repair:

    * ``current`` missing, ``__tmp__`` present — died between the two
      renames; ``__tmp__`` is the *complete* new state (it is only ever
      renamed after its write finished), so promote it.
    * ``current`` missing, only ``__bak__`` present — defensive: restore
      the backup rather than silently reinitializing to empty.
    * ``current`` AND ``__bak__`` present — died before the final rmtree
      (or ``__tmp__`` write itself died, which overwrite-mode clobbers);
      drop the stale backup.
    """
    cur = os.path.join(replica_dir, "current")
    tmp = os.path.join(replica_dir, "__tmp__")
    bak = os.path.join(replica_dir, "__bak__")
    if not os.path.exists(cur):
        if os.path.exists(tmp):
            os.rename(tmp, cur)
        elif os.path.exists(bak):
            os.rename(bak, cur)
    if os.path.exists(cur) and os.path.exists(bak):
        shutil.rmtree(bak)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a changelog to a snapshot: last-write-wins per key.

    ``changes`` carries the key columns, a total-order ``seq_col``
    (LSN/offset), ``op_col`` (``delete_op`` marks deletions; anything
    else is an upsert), and the full payload (same non-key columns as
    ``base``).  Rows of ``base`` with no change survive unchanged;
    upserted keys take the payload of their HIGHEST-seq change (even if
    earlier changes deleted them); keys whose last change is a delete
    disappear, whether or not they existed in ``base``.
    """
    keys = list(key_cols)
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in keys + [seq_col, op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")

    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__c_{c}") for c in payload],
        )
    )
    cond = [base[k] == latest[f"__k_{k}"] for k in keys]
    merged = base.join(latest, cond, "full_outer")
    keep = F.col("__op").isNull() | (F.col("__op") != delete_op)
    out_cols = [
        F.coalesce(base[k], F.col(f"__k_{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col("__op").isNotNull(), F.col(f"__c_{c}"))
        .otherwise(base[c])
        .alias(c)
        for c in payload
    ]
    return merged.filter(keep).select(*out_cols)


def materialized_replica_sink(
    spark: SparkSession,
    replica_dir: str,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining a materialized replica table from
    a CDC change stream — the full downstream half of the reference's
    logical-replication delivery (`Stream.hs:97-142` delivers the rows;
    this keeps the table).

    Each micro-batch folds into ``{replica_dir}/current`` (parquet) via a
    *versioned* merge: the replica stores ``__seq`` (the highest change
    sequence applied per key) and a change is taken only when its seq is
    strictly higher.  That makes the sink idempotent under Spark's
    redo-on-restart contract — re-applying an already-applied batch
    compares equal seqs and changes nothing — and safe for a stale batch
    replay, with no batch-id bookkeeping.  Deletes keep a TOMBSTONE row
    (``__deleted`` true, payload nulled) so a stale upsert can never
    resurrect a deleted key — read through ``read_replica``, which
    filters tombstones; GC tombstones older than the source's maximum
    reorder horizon with an ordinary filter job.  The swap is write-tmp
    + rename, the same local-FS discipline as ``sinks.compact_dir``.

    Scale: one micro-batch costs latest-per-key on the batch (small) +
    one key join against the replica — bucket the replica by key
    (``sinks.write_bucketed``) to make that join exchange-free on the
    replica side.  For table formats with transactional MERGE
    (Delta/Iceberg) this whole function collapses to ``MERGE INTO``;
    the parquet implementation keeps the engine dependency-free.
    """
    keys = list(key_cols)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        payload = [
            c for c in batch_df.columns if c not in (*keys, seq_col, op_col)
        ]
        _recover_replica(replica_dir)
        cur = os.path.join(replica_dir, "current")
        if os.path.exists(cur):
            state = spark.read.parquet(cur)
        else:
            state = (
                batch_df.select(
                    *keys,
                    *payload,
                    F.col(seq_col).cast("long").alias("__seq"),
                    F.lit(False).alias("__deleted"),
                )
                .filter(F.lit(False))
            )

        w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                *[F.col(k).alias(f"__k_{k}") for k in keys],
                F.col(seq_col).cast("long").alias("__c_seq"),
                F.col(op_col).alias("__op"),
                *[F.col(c).alias(f"__c_{c}") for c in payload],
            )
        )
        cond = [state[k] == latest[f"__k_{k}"] for k in keys]
        j = state.join(latest, cond, "full_outer")
        take = F.col("__c_seq").isNotNull() & (
            F.col("__seq").isNull() | (F.col("__c_seq") > F.col("__seq"))
        )
        taken_del = take & (F.col("__op") == delete_op)
        merged = j.select(
            *[F.coalesce(state[k], F.col(f"__k_{k}")).alias(k) for k in keys],
            *[
                F.when(taken_del, F.lit(None))
                .when(take, F.col(f"__c_{c}"))
                .otherwise(state[c])
                .alias(c)
                for c in payload
            ],
            F.when(take, F.col("__c_seq")).otherwise(F.col("__seq")).alias("__seq"),
            F.when(take, F.col("__op") == delete_op)
            .otherwise(F.coalesce(F.col("__deleted"), F.lit(False)))
            .alias("__deleted"),
        )

        tmp = os.path.join(replica_dir, "__tmp__")
        merged.write.mode("overwrite").parquet(tmp)
        bak = os.path.join(replica_dir, "__bak__")
        if os.path.exists(cur):
            os.rename(cur, bak)
        os.rename(tmp, cur)
        if os.path.exists(bak):
            shutil.rmtree(bak)

    return write


def read_replica(spark: SparkSession, replica_dir: str) -> DataFrame:
    """Current state of a ``materialized_replica_sink`` table: tombstones
    filtered, bookkeeping columns dropped."""
    _recover_replica(replica_dir)
    cur = spark.read.parquet(os.path.join(replica_dir, "current"))
    return cur.filter(~F.col("__deleted")).drop("__seq", "__deleted")


def scd2_stream_sink(
    store_dir: str,
    key_col: str,
    ts_col: str,
    seq_col: str | None = None,
    op_col: str | None = None,
    payload_cols: Sequence[str] = (),
):
    """foreachBatch writer maintaining a PERSISTED SCD2 history from a
    CDC change stream — the streaming lifecycle around
    `operators/scd2.scd2_apply_batch` (which carries the correctness
    burden: touched-key-only rebuild, content-digest idempotent log
    appends, swap-committed history).

    Composition semantics inherited from the pieces, both pytest-pinned:
    replays (micro-batch retries) are absorbed by the digest log, so
    exactly-once delivery is NOT required of the stream; a crash between
    log append and history swap self-heals on the next batch (the log is
    the source of truth, the history a rebuildable materialization).
    Use ``operators/scd2.point_in_time_join`` on `read_replica`-style
    consumers of ``<store_dir>/history/current``.

    Returns the writer function — attach with
    ``stream.writeStream.foreachBatch(scd2_stream_sink(store_dir, ...))``.
    """
    from pgstream_spark.operators.scd2 import scd2_apply_batch

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scd2_apply_batch(
            store_dir,
            batch_df,
            key_col=key_col,
            ts_col=ts_col,
            seq_col=seq_col,
            op_col=op_col,
            payload_cols=payload_cols,
        )

    return write
