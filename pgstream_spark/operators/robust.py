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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["robust_zscore_stats"]


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
