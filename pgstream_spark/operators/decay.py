"""Time-decayed exponential moving average (EWMA) as a window operator.

Trading analytics (the reference's domain — its example walks daily price
deltas, ``/root/reference/Example.hs:20-43``) weights recent observations
more than stale ones: ``ewma(t) = Σ v_j·e^{-(t-t_j)/τ} / Σ e^{-(t-t_j)/τ}``
over a trailing window.  The naive formulation re-scans the frame per row
with a row-dependent weight — O(frame²) and inexpressible as a plain
window sum.

The factored form used here: divide numerator and denominator by the
row-independent constant ``e^{t0/τ}`` and the per-row factor
``e^{-t/τ}`` CANCELS in the ratio, leaving

    ewma = sum(v·w) OVER frame / sum(w) OVER frame,   w = e^{(t_j-t0)/τ}

— two ordinary windowed sums over a per-row projected weight.  One
shuffle (the window partition), codegen throughout, no Python.  This is
the standard trick for making exponential decay associative (cf. the
time-decay aggregation in stream-processing literature); it is what lets
the same expression run as a streaming windowed aggregate.

Overflow bound: ``w`` grows as ``e^{span/τ}`` across the partition, so the
data span per partition must satisfy ``span/τ < ~700`` (IEEE double max
``e^709``).  At 100 TB / years of data, segment long histories by a
coarse time bucket (day/week) into separate window partitions and chain
segment boundaries — the weight is relative within a frame, so any
``t0`` inside the segment works.  The operator takes ``t0`` explicitly to
keep the exponent small and the plan deterministic.

Determinism: both engines sum doubles over the frame; association order
may differ, but with ≤ frame_rows positive terms the relative error is
≤ n·ε ≈ 1e-14, absorbed by rounding the final ratio (caller convention:
round(4), as every libm-touching query in the inventory does).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgstream_spark.functions.datetime import epoch_seconds

__all__ = ["ewma_time_decay"]


def ewma_time_decay(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str],
    tau_seconds: float,
    t0_epoch_s: int,
    frame_rows: int = 20,
    tie_col: str | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Append ``ewma`` = time-decay-weighted mean of ``value_col`` over the
    trailing ``frame_rows`` rows per key, ordered by (ts, tie_col).

    ``tau_seconds`` is the e-folding time (weight halves every
    ``tau·ln2`` seconds); ``t0_epoch_s`` anchors the exponent (must be
    within ~700·tau of every timestamp in the partition).
    """
    if tie_col is None:
        raise ValueError("tie_col is required for a total frame order")
    keys = list(key_cols)
    es = epoch_seconds(F.col(ts_col))
    w = F.exp((es - F.lit(t0_epoch_s)).cast("double") / F.lit(float(tau_seconds)))
    win = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
        .rowsBetween(-(frame_rows - 1), 0)
    )
    return df.withColumn(
        "ewma",
        F.round(
            F.sum(F.col(value_col) * w).over(win) / F.sum(w).over(win),
            round_digits,
        ),
    )
