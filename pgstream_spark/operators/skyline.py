"""Pareto frontier (2-D skyline) — the non-dominated set of a table.

The classic "cheapest AND freshest" query: keep every row for which no
other row is at least as good on both axes and strictly better on one.
The reference's domain (per-security price/date panels,
``/root/reference/Example.hs:25-33``) asks this as "best execution"
screens; SQL spells it as a quadratic ``NOT EXISTS`` anti-join, which is
unusable past ~10^5 rows.

The 2-D skyline has a linear sweep: sort by the minimized axis and keep
rows that strictly improve the running maximum of the maximized axis.
Distributing that sweep needs a *global prefix maximum*, which this
module implements with the standard two-level scan pattern instead of a
single-partition window:

1. reduce to one row per distinct ``minimize`` value (``max(maximize)``
   per group — map-side combinable, shuffle carries one row per value);
2. range-partition the reduced table by ``minimize`` and compute each
   partition's local running prefix;
3. collect ONE scalar per partition (its maximum) to the driver, prefix
   them there (K values, K = number of partitions), and broadcast the
   exclusive offsets back;
4. the global prefix is ``greatest(local prefix, partition offset)``.

Cost at 100 TB: one hash shuffle of the reduced table + one range
exchange + a K-row driver step — the same economics as Spark's own
range-partitioned global sort.  A partition-less ``Window.orderBy``
would funnel every distinct value through one task; this never does.

Dominance is strict-on-one-axis: rows tied on both axes survive
together.  Rows with NULL in either axis are excluded (dominance is
undefined on NULL) — filter upstream if they should be kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pareto_frontier_2d"]


def pareto_frontier_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Rows not dominated by any other row (minimize one axis, maximize
    the other).  Output = input rows (all columns), order free.

    A row is dominated iff some other row has ``minimize <=`` and
    ``maximize >=`` with at least one strict.  Equivalently, with
    ``gmax(p) = max(maximize)`` among rows at minimize-value ``p`` and
    ``prev(p) = max(maximize)`` among rows with strictly smaller value:

    * dominated by a strictly cheaper row  iff ``prev(p) >= maximize``;
    * dominated by an equal-cost row       iff ``gmax(p) >  maximize``.

    Both checks are per-distinct-``minimize``-value, so the frontier
    needs only the reduced staircase table, never a self-join.
    """
    clean = df.filter(F.col(minimize).isNotNull() & F.col(maximize).isNotNull())

    # 1. one row per distinct minimize value
    stair = clean.groupBy(minimize).agg(F.max(maximize).alias("__gmax"))

    # 2. range-partition + local exclusive prefix max
    # persist: __pid must be the SAME assignment for the offset collect
    # below and the windowed prefix — two independent evaluations of the
    # range exchange are not contractually identical.
    parts = (
        stair.repartitionByRange(num_partitions, F.col(minimize))
        .sortWithinPartitions(minimize)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(minimize)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn("__local_prev", F.max("__gmax").over(w_local))

    # 3. K scalars to the driver → exclusive per-partition offsets.
    # This is the only driver-side step and it is O(num_partitions),
    # the same budget as range-partitioning's own boundary sampling.
    pmax = {
        r["__pid"]: r["m"]
        for r in parts.groupBy("__pid").agg(F.max("__gmax").alias("m")).collect()
    }
    offsets, run = {}, None
    for pid in sorted(pmax):
        offsets[pid] = run
        run = pmax[pid] if run is None or pmax[pid] > run else run
    off_expr = F.lit(None).cast(dict(stair.dtypes)["__gmax"])
    for pid, off in offsets.items():
        if off is not None:
            off_expr = F.when(F.col("__pid") == pid, F.lit(off)).otherwise(off_expr)

    # 4. global exclusive prefix = max(local prefix, partition offset)
    # (greatest skips NULLs: NULL only when no prior row exists anywhere)
    prefixed = local.withColumn(
        "__prev", F.greatest(F.col("__local_prev"), off_expr)
    ).select(minimize, "__gmax", "__prev")

    dominated = (
        F.col("__prev").isNotNull() & (F.col("__prev") >= F.col(maximize))
    ) | (F.col("__gmax") > F.col(maximize))
    return (
        clean.join(prefixed, on=minimize)
        .filter(~dominated)
        .select(*df.columns)  # join key first → restore caller's order
    )
