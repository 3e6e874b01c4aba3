"""Classical additive seasonal decomposition over a regular time series:

    value = trend + seasonal + residual

with trend a centered moving average, seasonal the per-phase mean of the
detrended series, residual the remainder — the moving-average step of
STL-style decomposition (Cleveland et al., J. Official Stat. 1990)
without the robustness iterations, which keeps every number a closed
deterministic expression.

Spark-first shape: the input is an AGGREGATED series (one row per time
bucket — built by a scan-speed groupBy upstream), so every window here
runs over |buckets| rows, not raw events; a year of hourly buckets is
8 760 rows.  The global ``orderBy`` window is therefore a deliberate
single-partition plan on sketch-sized data — the same economics as every
final rollup in this package.  Determinism discipline: the bucket counts
are exact integers; trend is one integer-sum ÷ constant division; the
per-phase seasonal mean goes through the scaled-integer dsum pattern;
each output is rounded once.

Gaps matter: a missing bucket would silently shrink the moving-average
window, so callers must densify first (``regularize`` below, or
``rollup_time.gapfill_locf`` for carry-forward semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["regularize", "seasonal_decompose"]

_SCALE = 10_000


def regularize(
    series: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 hour",
    fill: float | int = 0,
) -> DataFrame:
    """Densify a (time, value) series to a fixed step: generate the full
    bucket grid between the observed min and max with ``sequence``, left
    join the observations, fill holes with ``fill``.  The grid generation
    is one tiny aggregate + one ``explode``; the join is on the bucket
    key.  Returns ``(time_col, value_col)`` sorted-agnostic.
    """
    bounds = series.agg(
        F.min(time_col).alias("h0"), F.max(time_col).alias("h1")
    )
    grid = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr(f"INTERVAL {step}"))
        ).alias(time_col)
    )
    return grid.join(series, time_col, "left").select(
        time_col,
        F.coalesce(F.col(value_col), F.lit(fill)).alias(value_col),
    )


def seasonal_decompose(
    series: DataFrame,
    time_col: str,
    value_col: str,
    phase: Column,
    half_window: int = 12,
    round_digits: int = 6,
) -> DataFrame:
    """Decompose a REGULAR integer-valued series into trend + seasonal +
    residual.

    * trend: centered moving average over ``2·half_window + 1`` buckets
      (rows-frame), defined only where the window is complete — edge
      rows are dropped, the standard convention;
    * seasonal: mean of the detrended series per ``phase`` (e.g.
      ``F.hour(time_col)`` for hour-of-day on an hourly series);
    * residual: ``value − trend − seasonal``.

    Returns ``(time_col, value_col, trend, seasonal, residual)`` with the
    three doubles rounded to ``round_digits``.  Exactness: the moving sum
    is an integer; detrended values are scaled to integer ten-thousandths
    before the per-phase mean so the sum is associative and order-free.
    """
    width = 2 * half_window + 1
    w = Window.orderBy(F.col(time_col).asc()).rowsBetween(
        -half_window, half_window
    )
    trend = F.sum(value_col).over(w).cast("double") / float(width)
    covered = F.count(F.lit(1)).over(w) == width
    tr = (
        series.select(
            time_col,
            value_col,
            trend.alias("__trend"),
            covered.alias("__cov"),
        )
        .where(F.col("__cov"))
        .drop("__cov")
    )
    det_scaled = F.round(
        (F.col(value_col).cast("double") - F.col("__trend")) * _SCALE
    ).cast("bigint")
    se = tr.select(
        time_col, value_col, "__trend",
        det_scaled.alias("__det"),
        phase.alias("__phase"),
    )
    wp = Window.partitionBy("__phase")
    seasonal = F.round(
        F.sum("__det").over(wp).cast("double")
        / F.count(F.lit(1)).over(wp).cast("double")
        / float(_SCALE),
        round_digits,
    )
    out = se.withColumn("seasonal", seasonal)
    return out.select(
        time_col,
        value_col,
        F.round(F.col("__trend"), round_digits).alias("trend"),
        "seasonal",
        F.round(
            F.col(value_col).cast("double") - F.col("__trend") - F.col("seasonal"),
            round_digits,
        ).alias("residual"),
    )
