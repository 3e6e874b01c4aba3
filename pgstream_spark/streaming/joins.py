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

__all__ = ["stream_stream_time_join", "stream_static_point_in_time"]


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


def stream_static_point_in_time(
    stream: DataFrame,
    history: DataFrame,
    on: str,
    fact_ts: str,
) -> DataFrame:
    """Enrich a fact stream with the dimension version valid AT EVENT
    TIME — the streaming read side of SCD2 (`operators/scd2`), as a
    stream-static interval join: ``key match AND valid_from <= ts <
    valid_to`` (open ``valid_to`` = current version).  SCD2 intervals
    are disjoint per key, so at most one version matches; facts before
    the first version or inside a deletion hole keep NULL version
    columns (left outer) — exactly `scd2.point_in_time_join`'s
    contract, whose output column shape (version columns suffixed
    ``_r``) this matches so the batch operator is the oracle.

    Mode-agnostic: on a batch frame it is an ordinary interval join; on
    a streaming frame Spark plans it as a STATELESS per-micro-batch
    join against the static side — no watermark, no state store, no
    foreachBatch.  Scale shape: an equi-join keyed on ``on`` (the
    interval bound rides as a post-join filter, not in the exchange);
    broadcast the history when it is dimension-sized.

    Static-side caveat (Spark semantics, not this function's): file
    sources freeze their file LISTING when the streaming query starts,
    so dimension updates written after start are not visible to an
    already-running query.  For live dimension reloads run the batch
    operator inside ``foreachBatch`` (reload + `point_in_time_join`
    per micro-batch) — one line with the same oracle.
    """
    keep_key = stream[on]
    ver = [c for c in history.columns if c != on]
    clashes = set(stream.columns) & ({f"{c}_r" for c in ver} | {"__pit_key"})
    if clashes:
        raise ValueError(
            f"stream columns collide with enrichment output: {sorted(clashes)}"
            " — rename them before the join"
        )
    h = history.select(
        F.col(on).alias("__pit_key"),
        *[F.col(c).alias(f"{c}_r") for c in ver],
    )
    cond = (
        (keep_key == F.col("__pit_key"))
        & (stream[fact_ts] >= F.col("valid_from_r"))
        & (
            F.col("valid_to_r").isNull()
            | (stream[fact_ts] < F.col("valid_to_r"))
        )
    )
    return stream.join(h, cond, "left_outer").drop("__pit_key")
