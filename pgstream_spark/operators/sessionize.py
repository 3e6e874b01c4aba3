"""Gap-based sessionization: assign session IDs to event rows.

T-5's ``session_window`` aggregates sessions; pipelines equally need the
row-level version — every event tagged with its session index so
downstream features (events-per-session, dwell, funnel position) join
back to raw rows.  The classic two-window formulation:

    new_session = (t − lag(t) > gap) OR first-row-of-key
    session_idx = running SUM of new_session per key

Both windows share one hash exchange + one sort (same partition and
order), all arithmetic is exact integers — bit-reproducible against the
SQL oracle with no float discipline needed.

Scale: identical cost shape to any per-key window (one shuffle, one
in-partition sort); the skew caveat of W-* applies (a single key with
10⁹ events serializes — pre-split such keys by a coarse time bucket and
stitch boundary sessions, the as-of join's documented recipe).  For the
streaming path use ``streaming/windows.session_windowed_agg`` (state
merges natively); this operator is the batch/backfill shape.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgstream_spark.functions.datetime import epoch_seconds

__all__ = ["sessionize", "transition_matrix"]


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
    tie_col: str | None = None,
    out_col: str = "session_idx",
) -> DataFrame:
    """Append ``out_col``: 1-based session index per key, a new session
    starting wherever the gap since the previous event exceeds
    ``gap_seconds``.  ``tie_col`` totalizes the order for equal
    timestamps (required — ambiguous order would make session boundaries
    partitioning-dependent)."""
    if tie_col is None:
        raise ValueError("tie_col is required for a total event order")
    keys = list(key_cols)
    es = epoch_seconds(F.col(ts_col))
    order = [F.col(ts_col).asc(), F.col(tie_col).asc()]
    w_lag = Window.partitionBy(*keys).orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(es).over(w_lag)
    is_new = F.when(
        prev.isNull() | ((es - prev) > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(out_col, F.sum(is_new).over(w_run))


def transition_matrix(
    df: DataFrame,
    state_col: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    round_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition counts and probabilities over each
    key's ordered state sequence — the path-analysis primitive ("what do
    users do after `search`?") and the fit step of a Markov chain model.

    Per key, order rows by ``order_cols`` (must be total within a key —
    include a unique tie column) and pair each state with its successor
    via ``lag``; then ONE global aggregation over ``(prev, next)``.  The
    probability column is ``n / row-count of prev`` — a single long÷long
    double division, rounded for cross-engine stability; the counts are
    exact integers.

    Scale: one shuffle on the keys + in-partition sort (the sessionize
    economics — key skew caveat applies), then one agg whose output is
    bounded by |states|², independent of row count.  The per-prev totals
    come from a window over that tiny aggregate, not a second pass over
    the data.
    """
    keys = list(key_cols)
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    pairs = (
        df.withColumn("__prev", F.lag(F.col(state_col)).over(w))
        .where(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev_state"),
                 F.col(state_col).alias("next_state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_prev = Window.partitionBy("prev_state")
    total = F.sum("n").over(w_prev)
    p = F.round(F.col("n").cast("double") / total.cast("double"), round_digits)
    return pairs.withColumn("p", p)
