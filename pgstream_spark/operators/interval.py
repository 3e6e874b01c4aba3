"""Interval / range-overlap join — SURVEY §2 J-9.

"Events within ±1 day of each order date" is a pure range predicate; with
no equi-key, Spark's only built-in plan is ``BroadcastNestedLoopJoin`` —
O(|L|·|R|) comparisons, fine only when one side broadcasts.  The scale
path here is the standard **bucketed range join**: quantize time into
buckets of ``bucket_seconds``, explode each left interval into every bucket
it covers, and equi-join on the bucket id before applying the exact range
predicate as a residual.

The bucket equi-join turns the nested loop into a hash/sort-merge join
whose cost is |L|·(interval/bucket) + matched pairs — linear-ish, shuffled
by bucket, AQE-coalescible.  Choosing ``bucket_seconds`` ≈ the typical
interval width keeps the explode factor ≤ 2-3.

``interval_join`` joins point events to [start, end] intervals;
``range_join_predicate`` is the small-side fallback that simply broadcasts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["interval_join", "broadcast_range_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 86_400,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_ts <= point_ts <= end_ts`` (plus optional equi-keys).

    Both inputs keep all their columns; column names must not collide
    (rename upstream).  Implementation: bucket-explode the intervals,
    bucket the points, equi-join on bucket (+``extra_on``), residual-filter
    the exact predicate, then drop the helper column.  One shuffle on
    (bucket, *extra_on*); no cartesian product.
    """
    extra_on = extra_on or []

    def _seconds(df: DataFrame, c: str) -> Column:
        """Epoch seconds for bucketing — timezone-free for timestamps
        (whole-second truncation; safe because points and interval ends
        truncate identically, so bucket coverage is preserved)."""
        dtype = dict(df.dtypes)[c]
        if dtype.startswith("timestamp"):
            col = F.col(c)
            return (
                F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
                * 86400
                + F.hour(col) * 3600
                + F.minute(col) * 60
                + F.second(col)
            ).cast("double")
        return F.col(c).cast("double")

    b = F.lit(int(bucket_seconds))
    p_bucket = F.floor(_seconds(points, point_ts) / b)
    i_start_bucket = F.floor(_seconds(intervals, start_ts) / b)
    i_end_bucket = F.floor(_seconds(intervals, end_ts) / b)

    pts = points.withColumn("__bucket", p_bucket.cast("long"))
    ivs = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(i_start_bucket.cast("long"), i_end_bucket.cast("long"))),
    )

    on = ["__bucket"] + extra_on
    joined = pts.join(ivs, on=on, how="inner").filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("__bucket")


def broadcast_range_join(
    big: DataFrame, small: DataFrame, predicate: Column
) -> DataFrame:
    """Small-side fallback: broadcast nested-loop range join.

    Correct for any theta predicate; only for dimension-sized ``small``
    (the reference's ``currentprice.val BETWEEN 0 AND 500`` inside a join
    condition, `/root/reference/Example.hs:33`, is this shape once the
    equi-keys are gone).
    """
    return big.join(F.broadcast(small), on=predicate, how="inner")


def interval_coverage(
    intervals: DataFrame,
    keys: Sequence[str] | str,
    start_col: str,
    end_col: str,
    tie_col: str,
) -> DataFrame:
    """Total covered length and island count of (possibly overlapping)
    half-open intervals per key — the uptime/coverage/SLA metric: N
    overlapping sessions cover their union once, not N times.

    Islands-and-gaps in one windowed pass: order intervals by start, an
    interval opens a NEW island iff its start exceeds the running max of
    all previous ends; the island id is the running sum of those flags.
    Then one aggregation per (key, island) — ``max(end) - min(start)`` is
    the island's covered length (positions inside an island are covered
    by construction) — and one per key.

    Cost: ONE shuffle on the keys + one in-partition sort, then hash
    aggregations — the t17 sessionize economics applied to intervals.
    All arithmetic is on the caller's integer units (epoch seconds);
    ``tie_col`` must make the sort total so the running max is
    deterministic under any partitioning.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(start_col).asc(), F.col(end_col).asc(), F.col(tie_col).asc()]
    w_prev = (
        Window.partitionBy(*ks)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*ks)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pmax = F.max(end_col).over(w_prev)
    new_island = F.when(
        pmax.isNull() | (F.col(start_col) > pmax), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = intervals.withColumn("__island", F.sum(new_island).over(w_run))
    per_island = tagged.groupBy(*ks, "__island").agg(
        (F.max(end_col) - F.min(start_col)).alias("__cov")
    )
    return per_island.groupBy(*ks).agg(
        F.sum("__cov").alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
    )
