"""Robust (median/MAD) outlier statistics per group.

Quality gates over heavy-tailed analytics data (prices, latencies,
document-quality scores) use the median absolute deviation, not the
standard deviation — one fat-fingered tick moves a stddev threshold, not
a MAD threshold.  This is the robust counterpart of the variance-based
G-8 stats aggregate, and the outlier-flagging primitive a curation
pipeline applies before training-data export.

Two exact interpolated percentiles (median of values, median of absolute
deviations) plus a threshold count:

    med = P50(v);  mad = P50(|v − med|);  outlier ⇔ |v − med| > k·mad

Physical shape: two hash aggregates over the same grouping key plus one
broadcast join of the group-sized stats table back onto the fact rows
(groups ≪ rows, so the join never shuffles the fact side at any scale).
Exact percentiles sort within the aggregate — at extreme per-group
cardinality swap in ``approx_percentile`` (same call shape, sketch-backed)
exactly as G-4 does for distinct counts.

Determinism: the medians are rounded (default 4 digits) BEFORE the
deviation/threshold arithmetic, so every comparison operand is
bit-identical across engines and the outlier count is exact — the ulp
discipline the inventory applies to every cross-engine float reduction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["robust_zscore_stats", "weighted_quantiles"]


def robust_zscore_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
    round_digits: int = 4,
) -> DataFrame:
    """Per-key median, MAD, row count, and count of ``|v−med| > k·mad``."""
    med = df.groupBy(key_col).agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), round_digits).alias("med")
    )
    dev = df.join(F.broadcast(med), key_col).withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(key_col).agg(
        F.round(F.expr("percentile(_dev, 0.5)"), round_digits).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), key_col)
        .groupBy(key_col)
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("_dev") > F.lit(k) * F.col("mad"), 1)).alias(
                "n_outliers"
            ),
        )
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    key_cols: Sequence[str],
    qs: Sequence[float],
    tie_cols: Sequence[str] = (),
    pre_aggregate: bool = True,
) -> DataFrame:
    """Exact weighted quantiles per key — for each q, the smallest value
    whose cumulative weight reaches q·total (the lower weighted
    quantile; q=0.5 is the weighted median).  The statistic behind
    duration-weighted latency percentiles and quantity-weighted price
    levels, which no built-in provides.

    One shuffle + one in-partition sort serves the cumulative weight,
    the partition total, and EVERY requested q: the crossing row per q
    is a conditional min aggregate over the same sorted pass — adding
    quantiles costs aggregate columns, never extra passes.  The q·total
    threshold compares in exact integers (q scaled to millionths:
    ``cum·10⁶ ≥ q₆·total``), so results are bit-stable on any engine
    and partitioning.  Values and weights must already be integers
    (scale upstream).

    ``pre_aggregate`` (default on, skipped when ``tie_cols`` are given)
    is the SKEW answer: weights are first summed per (key, value) — a
    map-side-combinable aggregate, so a key holding 50% of all rows
    collapses to its DISTINCT VALUES before the shuffle + sort the
    cumulative pass pays.  The crossing statistic depends only on each
    value's total weight, so the result is bit-identical either way
    (pytest-pinned on a one-key-holds-50% fixture); the sorted pass then
    scales with value cardinality (e.g. |distinct cents|), not row
    count.
    """
    keys = list(key_cols)
    if pre_aggregate and not tie_cols:
        df = df.groupBy(*keys, value_col).agg(
            F.sum(weight_col).alias(weight_col)
        )
    order = [F.col(value_col).asc()] + [F.col(c).asc() for c in tie_cols]
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*keys)
    r = df.select(
        *keys,
        F.col(value_col).alias("__v"),
        F.sum(weight_col).over(w_run).alias("__cum"),
        F.sum(weight_col).over(w_all).alias("__tot"),
    )
    aggs = [F.min("__tot").cast("bigint").alias("total_weight")]
    for q in qs:
        q6 = round(q * 1_000_000)
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") * 1_000_000 >= F.lit(q6) * F.col("__tot"),
                    F.col("__v"),
                )
            ).alias(f"q{str(q).replace('.', '_')}")
        )
    return r.groupBy(*keys).agg(*aggs)
