"""Event-time windowed aggregation + stateful dedup (T-4..T-7).

Each helper works on BOTH batch and streaming DataFrames — Spark's
``window``/``session_window`` functions are mode-agnostic, which is what
makes the batch-mode DuckDB oracle a valid check for the streaming
semantics (SURVEY §5.2-2).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tumbling_windowed_agg",
    "session_windowed_agg",
    "stateful_dedup",
    "ohlc_windowed",
]


def tumbling_windowed_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    group_cols: Sequence[str] = (),
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) event-time window aggregate.

    ``watermark`` (e.g. ``'10 minutes'``) bounds state for streaming mode
    and defines the late-data drop point (T-6).
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), duration, slide) if slide else F.window(F.col(ts_col), duration)
    out = df.groupBy(win.alias("win"), *group_cols).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def ohlc_windowed(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    duration: str,
    key_cols: Sequence[str] = (),
    tie_col: str | None = None,
    watermark: str | None = None,
    scale: int = 10_000,
) -> DataFrame:
    """Streaming-capable OHLC bars over tumbling event-time windows.

    The mode-agnostic counterpart of ``operators/ohlc.ohlc_bars``: where
    the batch operator ranks with two ``row_number`` windows (window
    functions don't stream), this expresses open/close as
    ``min_by``/``max_by`` over a unique ``(ts, tie_col)`` order struct —
    plain algebraic aggregates with a partial-merge, so the SAME code
    runs batch and micro-batch with watermark-bounded state (state per
    key×window = one bar, not the ticks).  Deterministic because the
    order struct is unique per row; the mean rides the exact
    integer-cents sum.

    Spark watermarks require an instant TIMESTAMP column (NTZ is
    rejected: EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — cast NTZ event time
    upstream under a UTC session when streaming.
    """
    if tie_col is None:
        raise ValueError("tie_col is required for deterministic open/close")
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    ordk = F.struct(F.col(ts_col), F.col(tie_col))
    cents = F.round(F.col(value_col) * scale).cast("bigint")
    out = df.groupBy(F.window(F.col(ts_col), duration).alias("win"), *key_cols).agg(
        F.min_by(value_col, ordk).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, ordk).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents).cast("double") / scale / F.count(F.lit(1))).alias("avg_value"),
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def session_windowed_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    group_cols: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge (T-5)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("win"), *group_cols).agg(*aggs)
    return out.select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        *[c for c in out.columns if c != "win"],
    )


def stateful_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Duplicate-key collapse (T-7).

    Streaming mode with a watermark uses
    ``dropDuplicatesWithinWatermark`` so state is bounded by the watermark
    horizon; batch mode (or no watermark) uses plain ``dropDuplicates``.
    """
    cols = list(key_cols)
    if watermark is not None and ts_col is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
    return df.dropDuplicates(cols)
