"""Hypertable-style time rollups — continuous-aggregate shape.

Time-series stores expose "continuous aggregates": the same measure
pre-aggregated at several resolutions (minute/hour/day).  The Spark-native
shape is a single scan feeding a stacked rollup: aggregate once at the
finest resolution, then re-aggregate coarser tiers FROM the finer tier —
at 100 TB the raw table is read exactly once, and each coarser tier costs
an aggregation over the (tiny) finer tier instead of another scan.

Works in batch (oracle-checkable) and, per-tier, in streaming mode with a
watermark (each tier is an ordinary windowed aggregate).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup", "gapfill_locf", "merge_rollups", "incremental_rollup"]

# Cost-based reuse threshold: a multi-consumer aggregate tier is worth
# persisting only when recomputing it (one extra RAW-INPUT scan per
# consumer) costs more than the cache round-trip.  At bench scale the
# cache jobs dominate (measured on t9: no-persist 0.87 s vs persist
# 1.52 s over a 2 MB input); at warehouse scale the saved scans
# dominate.  Same 256 MiB knee as dedup's transport="auto" gate.
_PERSIST_MIN_BYTES = 256 << 20


def _persist_if_large(
    tier: DataFrame, src: DataFrame, min_bytes: int | None = None
) -> DataFrame:
    """Persist ``tier`` iff the raw input ``src`` is large.  Size comes
    from Catalyst's optimized-plan stats (file bytes for a parquet scan,
    propagated through projections — NO job runs; the dedup
    ``transport="auto"`` estimator).  Missing stats (the LogicalRDD
    Long.MaxValue sentinel) count as large — the conservative choice,
    since only re-scans are at stake, never results.  The threshold is
    read at CALL time (module constant, test/deploy-overridable), not
    bound as a default arg."""
    if min_bytes is None:
        min_bytes = _PERSIST_MIN_BYTES
    _NO_STATS = 1 << 60
    est = int(
        str(src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    if est >= min_bytes or est >= _NO_STATS:
        return tier.persist()
    return tier

_RES_SECONDS = {
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    resolutions: Sequence[str] = ("minute", "hour", "day"),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Stacked (count, sum, min, max) rollups of ``value_col`` at each
    resolution.

    Output: ``(resolution, bucket_start, *group_cols, n, sum_value,
    min_value, max_value)``.  Tiers beyond the first are computed from the
    previous tier (sum-of-sums, min-of-mins…), so the input scan happens
    once.  Resolutions must be coarsening multiples (minute→hour→day→week).
    """
    ordered = sorted(resolutions, key=lambda r: _RES_SECONDS[r])
    gcols = list(group_cols)

    finest = ordered[0]
    tier = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"), *gcols
        )
        .agg(
            F.count(value_col).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    # The finest tier feeds BOTH the union output and the next-coarser
    # aggregation, and the branches share no exchange (plan-verified:
    # 6 scans for 3 tiers, 0 ReusedExchange) — without reuse the
    # "read the raw table once" contract silently became one scan per
    # union branch.  ONLY the finest tier is a candidate (it is the
    # sole raw-sized aggregation; coarser tiers re-aggregate bucket
    # rows), and the persist is COST-BASED: below the knee the cache
    # jobs cost more than the saved 2 MB scans (A/B: 0.87 s vs 1.52 s
    # at sf0.1), above it each saved scan is corpus-sized.
    tier = _persist_if_large(tier, df)
    tiers = [tier.withColumn("resolution", F.lit(finest))]

    for res in ordered[1:]:
        tier = (
            tier.groupBy(
                F.date_trunc(res, F.col("bucket_start")).alias("bucket_start"),
                *gcols,
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        tiers.append(tier.withColumn("resolution", F.lit(res)))

    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionByName(t)
    return out.select(
        "resolution", "bucket_start", *gcols, "n", "sum_value", "min_value", "max_value"
    )


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str],
    bucket_seconds: int = 3600,
    scale: int = 10_000,
    mode: str = "locf",
) -> DataFrame:
    """Bucket a time series, materialize MISSING buckets, and fill them —
    the hypertable ``time_bucket_gapfill`` pair with either ``locf``
    (carry last observation forward) or ``interpolate`` (linear between
    the surrounding observations, NULL outside them).

    Dashboards and training-feature pipelines need a dense time grid;
    raw event streams have holes.  Shape: one bucketed aggregation, a
    per-key bucket spine via ``sequence(min, max)`` + ``explode`` (spine
    length is bounded by the series' time span ÷ bucket, independent of
    row count), a left join back, and ``last(..., ignorenulls)`` over an
    unbounded-preceding frame for the carry — one extra shuffle over the
    already-tiny bucket tier, never over raw events.

    The per-bucket sum is integer-scaled (``scale``) so the carried
    values are bit-reproducible across engines.  Returns
    ``(*key_cols, bucket_epoch_s, n_events, filled_value)`` with
    ``n_events = 0`` on gap rows and ``filled_value`` NULL only before a
    key's first observation.
    """
    from pyspark.sql import Window

    from pgstream_spark.functions.datetime import epoch_seconds

    keys = list(key_cols)
    b = F.floor(epoch_seconds(F.col(ts_col)) / bucket_seconds).cast("long")
    scaled = F.round(F.col(value_col) * scale).cast("bigint")
    agg = (
        df.select(*keys, b.alias("__b"), scaled.alias("__sv"))
        .groupBy(*keys, "__b")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("__sv").cast("double") / scale).alias("__sum"),
        )
    )
    # `agg` feeds the spine bounds AND the join-back, and the two
    # branches do NOT share an exchange (plan-verified) — without reuse
    # the raw-event aggregation scans the input twice.  Cost-based, as
    # in time_rollup: persist only when the raw input outweighs the
    # cache round-trip.
    agg = _persist_if_large(agg, df)
    spine = (
        agg.groupBy(*keys)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(*keys, F.explode(F.sequence("__lo", "__hi")).alias("__b"))
    )
    joined = spine.join(agg, keys + ["__b"], "left")
    wp = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if mode == "locf":
        filled = F.last("__sum", ignorenulls=True).over(wp)
    elif mode == "interpolate":
        # "next observation" = last-ignorenulls over a RUNNING frame in
        # DESCENDING bucket order — identical values to first-ignorenulls
        # over (current, unboundedFollowing), but Spark evaluates running
        # frames in O(n) per partition while unbounded-following frames
        # re-aggregate the remainder per row, O(n²) — measured 17× on the
        # per-key spine at sf0.1 (bench round 3).  Cost: one extra sort
        # on the same partitioning, no extra exchange.
        wn = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__b").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ob = F.when(F.col("__sum").isNotNull(), F.col("__b"))
        pv = F.last("__sum", ignorenulls=True).over(wp)
        pb = F.last(ob, ignorenulls=True).over(wp)
        nv = F.last("__sum", ignorenulls=True).over(wn)
        nb = F.last(ob, ignorenulls=True).over(wn)
        # observed buckets hit pb == nb == __b and reduce to pv exactly;
        # the expression nesting matches the oracle SQL so every IEEE
        # step is identical.
        filled = F.when(
            pb.isNotNull() & nb.isNotNull(),
            F.when(
                nb == pb,
                pv,
            ).otherwise(
                pv + (nv - pv) * ((F.col("__b") - pb) / (nb - pb))
            ),
        )
    else:
        raise ValueError(f"unknown gapfill mode: {mode!r}")
    return joined.select(
        *keys,
        (F.col("__b") * bucket_seconds).alias("bucket_epoch_s"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        filled.alias("filled_value"),
    )


def merge_rollups(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Combine two :func:`time_rollup` outputs covering disjoint or
    overlapping raw slices: (count, sum, min, max) are all algebraic, so
    the merge is one groupBy over the concatenated tiers — the
    incremental-maintenance step of a continuous aggregate.  The result
    is identical to re-running ``time_rollup`` over the union of the raw
    inputs (pytest-pinned), so an ingest pipeline can maintain a
    100 TB-backed rollup by aggregating ONLY each new partition and
    merging — O(delta) work per ingest, never a re-scan.
    """
    keys = [c for c in existing.columns
            if c not in ("n", "sum_value", "min_value", "max_value")]
    return (
        existing.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(*existing.columns)
    )


def incremental_rollup(
    state_dir: str,
    delta: DataFrame,
    ts_col: str,
    value_col: str,
    resolutions: Sequence[str] = ("minute", "hour", "day"),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Maintain a PERSISTED continuous aggregate under ``state_dir``:
    roll up only ``delta``, merge with the stored tiers, and swap the
    store atomically (write to ``__tmp__``, rename over ``current`` with
    crash recovery for the rename window — same discipline as
    `streaming/cdc.materialized_replica_sink`).  Returns the merged
    rollup DataFrame (read back from the committed store).
    """
    import os
    import shutil

    spark = delta.sparkSession
    cur = os.path.join(state_dir, "current")
    tmp = os.path.join(state_dir, "__tmp__")
    bak = os.path.join(state_dir, "__bak__")

    # crash recovery: a leftover tmp is an uncommitted write (discard);
    # a missing current with a bak is a crash mid-swap (restore)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if not os.path.exists(cur) and os.path.exists(bak):
        os.rename(bak, cur)

    new_tier = time_rollup(delta, ts_col, value_col, resolutions, group_cols)
    if os.path.exists(cur):
        existing = spark.read.parquet(cur)
        merged = merge_rollups(existing, new_tier)
    else:
        merged = new_tier
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(bak):
        shutil.rmtree(bak)
    if os.path.exists(cur):
        os.rename(cur, bak)
    os.rename(tmp, cur)
    if os.path.exists(bak):
        shutil.rmtree(bak)
    return spark.read.parquet(cur)
