"""As-of (nearest-prior) join — SURVEY §2 J-8.

The reference's domain is exactly this shape — per-security time series of
deltas/prices joined on (sid, day) (`/root/reference/Example.hs:25-33`) —
but Postgres made the authors express it with equi-joins on pre-aligned
days.  A real as-of join ("for each left row, the latest right row with
``right.ts <= left.ts``") has no single Spark primitive; this implements
the **union + partitioned-window carry-forward** strategy:

1. tag both sides and union them on (keys, ts) with each other's payload
   columns as NULL;
2. one window per key ordered by (ts, side) computes
   ``last(payload, ignoreNulls=True)`` — the carried-forward most recent
   right payload at every position;
3. keep only left rows.

Cost model at scale: ONE shuffle (hash by key) + ONE in-partition sort —
identical shape to a sort-merge join, with no range-explosion and no
driver involvement.  This beats the naive "join on key, filter t_r <= t_l,
window max" plan, which multiplies |left| × |right-per-key| rows before
filtering.  Skewed keys degrade to a big single-partition sort; pass
``salt_buckets=N`` to spread each hot key over N window partitions (left
rows salted randomly, right rows replicated to every salt — each left row
still sees the full right history of its key, so results are identical;
cost is an N× blow-up of the right side only).

``direction='backward'`` matches the classic as-of (≤); ``'forward'`` gives
the earliest right row ≥ left ts.  ``tolerance`` (seconds) drops matches
further than the tolerance from the left timestamp.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

# Cost gate for "auto" skew detection (the `_persist_if_large`
# discipline, VERDICT r11 items 1/3): the detection pass costs a full
# scan of BOTH inputs plus a per-key shuffle and a driver action —
# before the join proper has read a row.  That buys nothing when the
# combined input is small: even the degenerate worst case (EVERY row on
# one key) sorts under _AUTO_MIN_BYTES in a single window task in
# seconds, strictly cheaper than the detection pass it would replace.
# Above the knee the detection cost amortizes against a straggler sort
# that can dominate the stage.  Inputs without Catalyst size stats
# (LogicalRDD sentinel / stats failure) count as LARGE — the
# conservative choice; only the salting heuristic is at stake, never
# results (salted == unsalted, pytest- and oracle-pinned).
_AUTO_MIN_BYTES = 256 << 20


def _est_bytes(df: DataFrame) -> int:
    """Catalyst optimized-plan size estimate — file bytes for a parquet
    scan, propagated through projections; NO job runs."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def _auto_skew_plan(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> tuple[list, int] | None:
    """Decide whether (and how) to salt: returns (hot_key_rows, buckets)
    or None for the unsalted plan.

    A key is HOT when it holds more than 4× the fair per-reducer share
    (total rows across both sides ÷ shuffle partitions) — the point
    where one window partition's sort visibly lags the stage.  At most
    ``total/(4·fair) ≤ shuffle_partitions/4`` keys can exceed that
    bound, so the hot-key list collected to the driver is provably tiny
    and broadcastable.  Buckets = ceil(hottest/fair), capped at the
    shuffle partition count.
    """
    sp = int(
        left.sparkSession.conf.get("spark.sql.shuffle.partitions") or "200"
    )
    per_key = (
        left.select(*keys)
        .unionByName(right.select(*keys))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # The detection runs up to TWO actions over per_key (totals, then
    # the hot-key list) — persist across them so the second never
    # re-scans both inputs, and unpersist before returning (the
    # drop_saturated_buckets across-actions-only discipline).  per_key
    # is one compact row per distinct key.
    per_key = per_key.persist()
    try:
        tot = per_key.agg(
            F.sum("__n").alias("t"), F.max("__n").alias("m")
        ).collect()[0]
        if not tot["t"]:
            return None
        fair = max(1, tot["t"] // sp)
        if tot["m"] <= 4 * fair:
            return None
        hot = per_key.filter(F.col("__n") > 4 * fair).select(*keys).collect()
    finally:
        per_key.unpersist()
    buckets = int(min(sp, -(-tot["m"] // fair)))
    return hot, max(2, buckets)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
    salt_buckets: int | None | str = "auto",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per key.

    Right payload columns are suffixed with ``suffix``; the matched right
    timestamp comes back as ``<right_ts><suffix>`` (NULL when no match).

    ``salt_buckets=N`` enables skew salting: each left row is assigned a
    random salt in [0, N) and the right side is replicated once per salt,
    so the carry-forward window partitions by (key, salt) — a hot key's
    sort spreads over N tasks instead of one.  Results are identical to
    the unsalted join for any N.

    ``salt_buckets="auto"`` (the default) removes the manual knob: one
    map-side-combinable per-key count over both sides detects keys
    holding >4× the fair per-reducer share.  No hot key → the plain
    unsalted plan, zero overhead beyond the count.  Hot keys → ONLY they
    are routed through the salted plan (broadcast hot-key split, cold
    keys stay unsalted, results unioned) so the right-side replication
    cost is confined to the skewed slice.  Results are identical to the
    unsalted join in every case (pytest- and oracle-pinned).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    if salt_buckets == "auto":
        try:
            est = _est_bytes(left) + _est_bytes(right)
        except Exception:  # noqa: BLE001 — stats probe must never break the join
            est = 1 << 62
        plan = (
            _auto_skew_plan(left, right, keys)
            if est >= _AUTO_MIN_BYTES
            else None
        )
        if plan is None:
            salt_buckets = None
        else:
            hot_rows, buckets = plan
            spark = left.sparkSession
            hot_df = F.broadcast(
                spark.createDataFrame(
                    hot_rows, left.select(*keys).schema
                ).distinct()
            )
            common = dict(
                on=keys,
                left_ts=left_ts,
                right_ts=right_ts,
                direction=direction,
                tolerance_seconds=tolerance_seconds,
                suffix=suffix,
            )
            cold = asof_join(
                left.join(hot_df, keys, "left_anti"),
                right.join(hot_df, keys, "left_anti"),
                salt_buckets=None,
                **common,
            )
            hot = asof_join(
                left.join(hot_df, keys, "left_semi"),
                right.join(hot_df, keys, "left_semi"),
                salt_buckets=buckets,
                **common,
            )
            return cold.unionByName(hot)

    if salt_buckets is not None:
        if salt_buckets < 1:
            raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
        left = left.withColumn(
            "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
        )
        right = right.withColumn(
            "__salt",
            F.explode(F.array(*[F.lit(s) for s in range(salt_buckets)])),
        )
        out = asof_join(
            left,
            right,
            on=keys + ["__salt"],
            left_ts=left_ts,
            right_ts=right_ts,
            direction=direction,
            tolerance_seconds=tolerance_seconds,
            suffix=suffix,
            salt_buckets=None,
        )
        return out.drop("__salt")

    right_payload = [c for c in right.columns if c not in keys and c != right_ts]
    # left_ts is carried as the __ts axis and renamed back at the end —
    # including it here too emitted a DUPLICATE ts column, ambiguous to
    # any downstream reference (latent until j8c touched it)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]

    # Build the union frame: keys, event time, side marker, left payload,
    # suffixed right payload.
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in right_payload],
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(c + suffix) for c in right_payload],
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal ts => "at or before".
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    # Carry the right payload as ONE struct, not per-column lasts: a
    # per-column `last(ignorenulls)` would skip a legitimately-NULL field
    # in the matched row and resurrect an OLDER row's value for just that
    # column (latent until SCD2 histories joined on their NULL-able
    # `valid_to`).  The struct is NULL exactly on left rows, so
    # ignorenulls skips rows, never fields.
    r_struct = F.when(
        F.col("__is_left") == 0,
        F.struct(*[F.col(c + suffix).alias(c + suffix) for c in right_payload]),
    )
    carried = unioned.select(
        *keys,
        "__ts",
        "__is_left",
        *lcols,
        *(
            [F.last(r_struct, ignorenulls=True).over(w).alias("__rp")]
            if right_payload
            else []
        ),
        F.last(
            F.when(F.col("__is_left") == 0, F.col("__ts")), ignorenulls=True
        ).over(w).alias("__matched_ts"),
    )

    out = carried.filter(F.col("__is_left") == 1)
    if right_payload:
        out = out.select(
            *keys,
            "__ts",
            "__is_left",
            *lcols,
            *[F.col("__rp")[c + suffix].alias(c + suffix) for c in right_payload],
            "__matched_ts",
        )

    if tolerance_seconds is not None:
        # timezone-free, microsecond-exact epoch seconds: TIMESTAMP_NTZ
        # cannot cast to DOUBLE, and instant-casts would be session-tz-
        # dependent.  extract(SECOND) keeps the fractional part.
        ts_dtype = dict(out.dtypes)["__ts"]

        def _secs(name: str) -> F.Column:
            c = F.col(name)
            if ts_dtype.startswith("timestamp"):
                return (
                    F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date"))
                    .cast("long") * 86400
                    + F.hour(c) * 3600
                    + F.minute(c) * 60
                ).cast("double") + F.expr(f"extract(SECOND FROM {name})").cast("double")
            return c.cast("double")

        delta = F.abs(_secs("__ts") - _secs("__matched_ts"))
        within = F.col("__matched_ts").isNotNull() & (delta <= F.lit(tolerance_seconds))
        out = out.select(
            *keys,
            "__ts",
            *lcols,
            *[
                F.when(within, F.col(c + suffix)).alias(c + suffix)
                for c in right_payload
            ],
            F.when(within, F.col("__matched_ts")).alias("__matched_ts"),
        )

    return out.withColumnRenamed("__ts", left_ts).withColumnRenamed(
        "__matched_ts", right_ts + suffix
    ).drop("__is_left")
