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

__all__ = ["scd2_history", "point_in_time_join"]


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
