"""CUSUM change-point detection — locate the most likely mean shift in
each key's ordered series, with ALL arithmetic in exact integers.

The classic CUSUM statistic against the series mean,

    S_t = sum_{i<=t} (x_i - mean(x)),     cp = argmax_t |S_t|,

is the standard single-change-point locator (Page, Biometrika 1954; the
amoc/"at most one change" estimator): |S_t| peaks at the index where the
level shifts.  Naively it needs the float mean first — a cross-engine
determinism hazard and a second pass.  Multiply through by n instead:

    n·S_t = n·prefix_t − t·total        (prefix_t = sum_{i<=t} x_i')

where x' is the value scaled to integer ten-thousandths.  Every term is
a BIGINT — prefix sums, row numbers, totals — so the argmax is exact and
order-free on any engine and any partitioning; the only doubles are the
two reported magnitudes, each produced by a single division and rounded.

Spark-first shape: ONE shuffle on the keys + one in-partition sort
serves the prefix-sum window, the row-number window, and the per-key
totals (count/sum over the same partition, unbounded frame); the argmax
is a ``max(struct(...))`` aggregation — no self-join, no second scan.
Magnitude bound: |n·S_t| ≤ n · Σ|x'| — at 10⁶ rows/key × values ≤ 10⁵
that is ~10¹⁵ < 2^63; per-key row counts beyond ~10⁷ should pre-split
by a coarse time bucket (the documented skew recipe for every per-key
window in this package).

Reference scope: delegated-SQL analytics family (SURVEY §2.B G/W rows,
`Query.hs`); this extends it with the time-series diagnostics tier.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cusum_changepoint"]

_SCALE = 10_000


def cusum_changepoint(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    round_digits: int = 6,
) -> DataFrame:
    """Per key: the order position where the cumulative deviation from
    the key's mean is largest in absolute value.

    ``order_cols`` must be total within a key (include a unique tie
    column).  Ties in |n·S_t| break to the EARLIEST position so the
    result is deterministic.  Returns one row per key:

    * ``cp_pos`` — 1-based position of the change point,
    * ``n`` — series length,
    * ``cusum_max`` — max |S_t| in original value units (rounded),
    * ``mean_before`` / ``mean_after`` — segment means (rounded), the
      evidence for the shift.
    """
    keys = list(key_cols)
    order = [F.col(c).asc() for c in order_cols]
    xc = F.round(F.col(value_col) * _SCALE).cast("bigint")
    w_ord = Window.partitionBy(*keys).orderBy(*order)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = F.row_number().over(w_ord)
    prefix = F.sum(xc).over(w_run)
    n = F.count(F.lit(1)).over(w_all)
    total = F.sum(xc).over(w_all)
    ns = n * prefix - t * total  # n·S_t, exact BIGINT
    scored = df.select(
        *keys,
        t.alias("__t"),
        n.alias("__n"),
        prefix.alias("__prefix"),
        F.abs(ns).alias("__abs_ns"),
    )
    # argmax with earliest-position tie-break: max over (|n·S_t|, -t)
    best = scored.groupBy(*keys).agg(
        F.max(
            F.struct(
                F.col("__abs_ns").alias("a"),
                (-F.col("__t")).alias("negt"),
                F.col("__prefix").alias("pfx"),
            )
        ).alias("__best"),
        F.max("__n").alias("n"),
        F.sum(
            F.when(F.col("__t") == F.col("__n"), F.col("__prefix")).otherwise(
                F.lit(0)
            )
        ).alias("__total"),
    )
    cp = F.col("__best.negt") * -1
    # The three magnitudes are ratios of integers, so a plain
    # round(double, 6) can land EXACTLY on a .5 at the 7th decimal and
    # the two engines' double-rounding may disagree by one ulp (observed
    # at sf1).  Round in exact integer arithmetic instead: the value is
    # num / (den·SCALE); its 6-decimal half-up rounding is
    # (200·num + den) DIV (2·den) (SCALE=10⁴ → ×100 to reach 10⁶),
    # exact BIGINT on both engines, then ONE power-of-ten double
    # division.  |S_t| is ≥ 0, but prefix/segment sums go NEGATIVE when
    # the series has negative values — and Spark's DIV truncates toward
    # zero while DuckDB's // floors, so the recipe is applied to
    # abs(num) with the sign reattached (half-away-from-zero, identical
    # on both engines for every sign).
    assert round_digits == 6, "integer rounding is pinned to 6 decimals"
    pre = best.select(
        *keys,
        cp.cast("int").alias("cp_pos"),
        F.col("n").cast("bigint").alias("n"),
        F.col("__best.a").alias("__a"),
        F.col("__best.pfx").alias("__pfx"),
        (F.col("__total") - F.col("__best.pfx")).alias("__after_sum"),
        (F.col("n") - cp).cast("bigint").alias("__after_n"),
    )
    pre = pre.withColumn(
        "__cm6", F.expr("(200 * __a + n) DIV (2 * n)")
    ).withColumn(
        "__mb6",
        F.expr(
            "CASE WHEN __pfx < 0 THEN -((200 * -__pfx + cp_pos) "
            "DIV (2 * cp_pos)) "
            "ELSE (200 * __pfx + cp_pos) DIV (2 * cp_pos) END"
        ),
    ).withColumn(
        "__ma6",
        F.expr(
            "CASE WHEN __after_n <= 0 THEN NULL "
            "WHEN __after_sum < 0 THEN -((200 * -__after_sum + __after_n) "
            "DIV (2 * __after_n)) "
            "ELSE (200 * __after_sum + __after_n) DIV (2 * __after_n) END"
        ),
    )
    return pre.select(
        *keys,
        "cp_pos",
        "n",
        (F.col("__cm6").cast("double") / 1000000.0).alias("cusum_max"),
        (F.col("__mb6").cast("double") / 1000000.0).alias("mean_before"),
        (F.col("__ma6").cast("double") / 1000000.0).alias("mean_after"),
    )
