"""Skew-mitigation helpers.

AQE's skew-join splitting handles joins; skewed *aggregations* (one key
holding a large fraction of all rows) still funnel that key's rows into a
single reducer.  ``salted_agg`` is the standard two-stage fix: aggregate
on (key, salt) first — spreading the hot key across ``salt_buckets``
reducers — then combine the partials.  Correct only for algebraic
aggregates (sum/count/min/max), which is what it exposes.

At 100 TB this is the difference between one straggler task processing
10⁹ rows and ``salt_buckets`` tasks processing 10⁹/N each.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage (salted) grouped aggregation for skewed keys.

    Returns one row per group with ``count(*) AS n`` (if ``count``) and
    ``sum(<c>) AS sum_<c>`` per ``sum_cols`` — identical semantics to the
    direct groupBy, different shuffle shape.
    """
    gcols = list(group_cols)
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")

    stage1_aggs = []
    if count:
        stage1_aggs.append(F.count(F.lit(1)).alias("__n"))
    for c in sum_cols:
        stage1_aggs.append(F.sum(c).alias(f"__s_{c}"))

    partial = df.withColumn("__salt", salt).groupBy(*gcols, "__salt").agg(*stage1_aggs)

    stage2_aggs = []
    if count:
        stage2_aggs.append(F.sum("__n").alias("n"))
    for c in sum_cols:
        stage2_aggs.append(F.sum(f"__s_{c}").alias(f"sum_{c}"))

    return partial.groupBy(*gcols).agg(*stage2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) ``left`` side and
    replicate the (smaller) ``right`` side across all ``salt_buckets``.

    A hot join key funnels every matching row pair through one reducer in
    a plain shuffle join; salting spreads the hot key's left rows across
    ``salt_buckets`` reducers at the cost of shipping the right side
    ``salt_buckets``× — the classic trade when the right side is modest
    but too big (or too mid-skewed) for a clean broadcast, and AQE's
    runtime skew splitting isn't available (e.g. inside a cached/reused
    exchange).  The left salt derives from the row content itself
    (``xxhash64`` over all columns) rather than ``rand()`` or
    ``monotonically_increasing_id`` — task retries must re-produce the
    same salt or the join silently drops/duplicates rows.

    Semantics are identical to ``left.join(right, on, how)`` for
    ``inner`` and ``left`` joins (each left row carries exactly one salt,
    each right row exists in every bucket).  Right/full joins would
    duplicate unmatched right rows per bucket and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    keys = list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_replicated = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = l_salted.join(r_replicated, keys + ["__salt"], how)
    return out.drop("__salt")
