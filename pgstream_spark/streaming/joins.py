"""Stream-stream event-time joins (T-* extension).

The canonical streaming correlation: match each left event to right
events with the same key arriving inside a bounded time window after it
(impression→click attribution, order→shipment, request→response).

Mode-agnostic like the window helpers — the SAME function works on batch
DataFrames (where it is an ordinary interval equi-join, and therefore
batch output is the oracle for the streaming run) and on streaming
DataFrames (where the watermarks + the time-range predicate let Spark
bound the join state on both sides and evict expired rows).

Scale shape: an equi-join keyed on the join keys — state and shuffle are
hash-partitioned by key; the range predicate only bounds *retention*, it
is not part of the exchange. Skewed keys behave like any skewed
shuffle join (salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_stream_time_join"]


def stream_stream_time_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right events to left events with equal ``key`` and
    ``left_ts <= right_ts <= left_ts + tolerance``.

    ``left_ts`` / ``right_ts`` must be distinct column names (rename
    upstream); every other column name must be unique across the two
    inputs except ``key``, which is coalesced into one output column.
    Streaming inputs get ``watermark`` on their time column — required
    by Spark for state eviction in stream-stream joins, harmless no-op
    in batch mode.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    lk, rk = f"__{key}_l", f"__{key}_r"
    l = left.withColumnRenamed(key, lk)
    r = right.withColumnRenamed(key, rk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}"))
    )
    out = l.join(r, cond, how)
    return out.withColumn(key, F.coalesce(F.col(lk), F.col(rk))).drop(lk, rk)
