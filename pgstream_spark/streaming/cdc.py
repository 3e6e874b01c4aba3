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

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["apply_changes"]


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
