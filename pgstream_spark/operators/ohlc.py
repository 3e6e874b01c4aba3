"""OHLC bar aggregation — time-bucketed open/high/low/close summaries.

The reference is a trading-analytics client library (its shipped example
computes per-day price deltas over an ``iex_trades`` table,
``/root/reference/Example.hs:20-43``); the canonical query of that domain
is the candlestick bar: per instrument and time bucket, the first, max,
min, and last observation plus volume statistics.  Postgres spells it
``first(value ORDER BY ts)`` / ``last(value ORDER BY ts)`` over
``time_bucket`` groups; Spark has no ordered-aggregate FIRST/LAST, so the
bar is built from two ``row_number`` windows (ascending and descending)
over the same single shuffle, then a conditional aggregate.

Physical shape (what survives 100 TB):

* ONE hash exchange on (keys, bucket) for the windows; the aggregate
  reuses the same partitioning, so Catalyst plans no second exchange.
* ``row_number`` + conditional-max is rank-limit-friendly: the window
  carries no per-row state beyond the counter, and the aggregate emits
  one row per (key, bucket) — the bar count, not the tick count, crosses
  the wire.
* The bucket is floor-of-epoch integer arithmetic (timezone-free), so
  plans are portable across session timezones and the bucket column
  joins/partitions as a plain BIGINT — prunable when bars are written
  date-partitioned.

Determinism: ties in ``ts`` are broken by a caller-named unique column,
so open/close are well-defined on both engines; high/low/count are
order-free; the mean rides the exact integer-cents sum
(``inventory.dsum`` convention).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgstream_spark.functions.datetime import epoch_seconds

__all__ = ["ohlc_bars", "ohlc_rollup"]


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str],
    bucket_seconds: int = 3600,
    tie_col: str | None = None,
    scale: int = 10_000,
) -> DataFrame:
    """Per (key, time-bucket) OHLC bar.

    Returns one row per key × bucket with ``bar_epoch_s`` (bucket start,
    seconds since epoch, BIGINT), ``open``/``high``/``low``/``close``,
    ``n_events`` and the exact integer-scaled ``avg_value``.

    ``tie_col`` (default: first key-free unique column must be supplied)
    breaks timestamp ties so open/close are deterministic under any
    partitioning — without it two same-timestamp ticks could swap across
    runs.
    """
    if tie_col is None:
        raise ValueError("tie_col is required for deterministic open/close")
    keys = list(key_cols)
    bucket = (
        (epoch_seconds(F.col(ts_col)) / F.lit(bucket_seconds)).cast("bigint")
        * bucket_seconds
    ).alias("bar_epoch_s")
    base = df.select(*keys, bucket, F.col(ts_col), F.col(tie_col), F.col(value_col))

    part = [*keys, "bar_epoch_s"]
    asc = Window.partitionBy(*part).orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    desc = Window.partitionBy(*part).orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    ranked = base.select(
        *part,
        F.col(value_col),
        F.row_number().over(asc).alias("_ra"),
        F.row_number().over(desc).alias("_rd"),
    )
    cents = F.round(F.col(value_col) * scale).cast("bigint")
    return ranked.groupBy(*part).agg(
        F.max(F.when(F.col("_ra") == 1, F.col(value_col))).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(F.when(F.col("_rd") == 1, F.col(value_col))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents).cast("double") / scale / F.count(F.lit(1))).alias("avg_value"),
    )


def ohlc_rollup(
    bars: DataFrame,
    key_cols: Sequence[str],
    coarse_bucket_seconds: int,
    bucket_col: str = "bar_epoch_s",
) -> DataFrame:
    """Roll fine OHLC bars up to a coarser tier (hour bars → day bars).

    The continuous-aggregate property that makes bar pipelines cheap at
    100 TB (same argument as ``rollup_time``): a day bar aggregates ~24
    hour-bars, not the raw ticks, so each coarser tier costs an
    aggregation over the previous tier's output (~10³-10⁶× smaller than
    the tick stream).  open/close pick the first/last fine bar's
    open/close via ``min_by``/``max_by`` on the bucket timestamp —
    deterministic because fine buckets are unique per key; high/low/count
    compose associatively.
    """
    keys = list(key_cols)
    coarse = (
        (F.col(bucket_col) / F.lit(coarse_bucket_seconds)).cast("bigint")
        * coarse_bucket_seconds
    ).alias(bucket_col)
    b = F.col(bucket_col)
    return (
        bars.groupBy(*keys, coarse)
        .agg(
            F.min_by("open", b).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", b).alias("close"),
            F.sum("n_events").alias("n_events"),
        )
    )
