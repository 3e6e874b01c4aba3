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

__all__ = ["sessionize"]


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
