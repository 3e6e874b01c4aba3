"""Rolling (trailing-window) correlation from exact integer sums.

Pairwise co-movement over a trailing window — beta/hedge-ratio inputs in
the reference's trading domain (its example walks daily price deltas,
``/root/reference/Example.hs:20-43``; the next question a trading user
asks of deltas is how two series co-move).

``corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))``

computed the inventory's way: x and y are scaled to integers per row
(one rounding, identical on both engines), every windowed Σ is a BIGINT
sum — exact and association-free, so the five window aggregates are
bit-identical under ANY partitioning or frame-evaluation order.  Only
the final combination touches doubles: int→double conversion, one
multiply/subtract chain, one sqrt — the same IEEE ops on both engines,
with the result rounded to absorb the final-ulp risk.

Physical shape: ONE hash exchange (the window partition) + one
in-partition sort; all five sums ride the same Window node.  Degenerate
windows (zero variance in either series — constant values or a 1-row
frame) yield NULL, decided by exact integer comparison.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_corr"]


def rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    frame_rows: int = 50,
    x_scale: int = 1,
    y_scale: int = 100,
    round_digits: int = 6,
    out_col: str = "rolling_corr",
) -> Column | DataFrame:
    """Append ``out_col`` = Pearson correlation of (x, y) over the
    trailing ``frame_rows`` rows per key, ordered by ``order_cols``
    (must form a total order for a deterministic frame).

    ``x_scale``/``y_scale`` are the per-column integer scalings (1 for
    already-integral values, 100 for cents, …); keep
    ``frame_rows · max|x·y·scales|² < 2^63``.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(frame_rows - 1), 0)
    )
    xi = F.round(F.col(x_col) * x_scale).cast("bigint")
    yi = F.round(F.col(y_col) * y_scale).cast("bigint")
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(xi).over(w)
    sy = F.sum(yi).over(w)
    sxx = F.sum(xi * xi).over(w)
    syy = F.sum(yi * yi).over(w)
    sxy = F.sum(xi * yi).over(w)
    # exact-integer variance/covariance numerators
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    corr = F.when(
        (vx > 0) & (vy > 0),
        F.round(
            cov.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double")),
            round_digits,
        ),
    )
    return df.withColumn(out_col, corr)
