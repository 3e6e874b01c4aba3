"""Chunked per-key windows — the skew mitigation for the window-heavy
tier (VERDICT r3 item 7).

A per-key window (trailing-frame aggregates like w13's running median,
running sums like t17's sessionize) serializes each key into ONE task:
a key holding 50% of a 100 TB table turns the stage into a single-node
sort.  Salting cannot help directly — frames and running sums need the
key's full order.  The scalable shape is CHUNKING WITH A HALO:

1. bucket each row by a coarsening of the order column (e.g.
   ``date_trunc('hour', ts)`` when ordering by ``ts``) — every row of
   bucket b sorts before every row of bucket b' > b;
2. aggregate per-(key, bucket) row counts — a TINY table (map-side
   combinable, so the hot key's rows combine before any shuffle);
3. assign buckets to chunks of ~``target_rows`` rows (buckets are
   atomic) and, from the same count table, mark the trailing buckets of
   each chunk that the NEXT chunk needs as its halo (enough buckets to
   cover the frame's ``k-1`` preceding rows — exact, from counts);
4. join the (chunk, halo) assignment back, duplicate halo rows into
   their successor chunk, and run the window per (key, chunk): primary
   rows see exactly the same preceding rows as the global window, halo
   outputs are dropped.

Results are BIT-IDENTICAL to the unchunked window (pytest-pinned on a
one-key-holds-50% fixture), while the hot key's sort spreads over
``ceil(n/target_rows)`` tasks.  For running sums (sessionize) the halo
is one row and the cross-chunk state is a per-(key, chunk) total,
prefix-summed over the tiny chunk table and broadcast-joined back — the
classic distributed prefix-sum.

The only skew this cannot break is a single BUCKET larger than a chunk
(all rows share one (key, hour)); pick a finer ``bucket`` expression.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pgstream_spark.functions.datetime import epoch_seconds

__all__ = ["chunked_trailing_agg", "sessionize_chunked"]


def _chunk_assignment(
    df: DataFrame,
    keys: list[str],
    bucket: Column,
    target_rows: int,
    halo_rows: int,
) -> DataFrame:
    """Per-(key, bucket): (``__chunk``, ``__halo_chunk`` nullable).

    All decisions derive from the per-bucket count table — small, exact,
    partitioning-invariant.  ``__halo_chunk`` is the successor chunk a
    bucket must ALSO be sent to because fewer than ``halo_rows`` rows of
    its own chunk follow it.
    """
    c = df.groupBy(*keys, bucket.alias("__b")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = c.withColumn("__before", F.coalesce(F.sum("__n").over(w_cum), F.lit(0)))
    c = c.withColumn("__raw", (F.col("__before") / target_rows).cast("bigint"))
    # Bucket atomicity can leave a RAW chunk with fewer than halo_rows
    # rows (a giant bucket overshoots the boundary, stranding a sliver
    # before the next one) — then a one-chunk-back halo could not feed
    # its successor.  Merge undersized raw chunks FORWARD into the first
    # following chunk of >= target/2 rows (tail slivers merge backward
    # into the last good chunk), so every effective chunk's predecessor
    # always holds >= target/2 >= halo_rows rows.  All on the tiny
    # per-raw-chunk table.
    half = max(1, target_rows // 2)
    sz = c.groupBy(*keys, "__raw").agg(F.sum("__n").alias("__sz"))
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__raw").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    good = F.when(F.col("__sz") >= half, F.col("__raw"))
    sz = sz.select(
        *keys,
        "__raw",
        F.coalesce(
            F.min(good).over(w_fwd),
            F.max(good).over(Window.partitionBy(*keys)),
            F.lit(0),
        ).alias("__chunk"),
    )
    c = c.join(sz, [*keys, "__raw"]).drop("__raw")
    # chunk-level table: end-of-chunk cumulative row count and the id of
    # the key's NEXT chunk (ids can skip, so "next" is positional)
    ch = c.groupBy(*keys, "__chunk").agg(
        F.max(F.col("__before") + F.col("__n")).alias("__chunk_end")
    )
    w_next = Window.partitionBy(*keys).orderBy(F.col("__chunk").asc())
    ch = ch.withColumn("__next_chunk", F.lead("__chunk").over(w_next))
    c = c.join(ch, [*keys, "__chunk"])
    after_in_chunk = F.col("__chunk_end") - (F.col("__before") + F.col("__n"))
    return c.select(
        *keys,
        "__b",
        "__chunk",
        F.when(
            (after_in_chunk < halo_rows) & F.col("__next_chunk").isNotNull(),
            F.col("__next_chunk"),
        ).alias("__halo_chunk"),
    )


def _spread(
    df: DataFrame,
    keys: list[str],
    bucket: Column,
    target_rows: int,
    halo_rows: int,
) -> DataFrame:
    """Tag every row with ``__chunk`` + ``__primary``; halo rows are
    duplicated into their successor chunk with ``__primary = false``."""
    assign = _chunk_assignment(df, keys, bucket, target_rows, halo_rows)
    tagged = df.withColumn("__b", bucket).join(assign, [*keys, "__b"])
    routes = F.array_compact(
        F.array(
            F.struct(
                F.col("__chunk").alias("c"), F.lit(True).alias("primary")
            ),
            F.when(
                F.col("__halo_chunk").isNotNull(),
                F.struct(
                    F.col("__halo_chunk").alias("c"),
                    F.lit(False).alias("primary"),
                ),
            ),
        )
    )
    return (
        tagged.withColumn("__r", F.explode(routes))
        .withColumn("__chunk", F.col("__r.c"))
        .withColumn("__primary", F.col("__r.primary"))
        .drop("__r", "__halo_chunk", "__b")
    )


def chunked_trailing_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    bucket: Column,
    agg_builder: Callable[[Window], Column],
    frame_rows: int,
    out_col: str,
    target_rows: int = 100_000,
) -> DataFrame:
    """Trailing ``frame_rows``-row window aggregate per key, evaluated in
    halo'd chunks — bit-identical to
    ``agg_builder(Window.partitionBy(keys).orderBy(order).rowsBetween(
    -(frame_rows-1), 0))`` while a hot key spreads over
    ``ceil(rows/target_rows)`` tasks.

    ``bucket`` must be a monotone coarsening of the first order column
    (e.g. ``F.date_trunc('hour', 'ts')`` for ``order_cols=('ts', id)``).
    ``agg_builder`` receives the windowspec and returns the aggregate
    column (e.g. ``lambda w: F.percentile('x', lit(.5)).over(w)``).
    """
    if target_rows < 2 * frame_rows:
        raise ValueError(
            f"target_rows ({target_rows}) must be >= 2x frame_rows "
            f"({frame_rows}) so a halo never spans more than one chunk"
        )
    keys = list(key_cols)
    spread = _spread(df, keys, bucket, target_rows, frame_rows - 1)
    w = (
        Window.partitionBy(*keys, "__chunk")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(frame_rows - 1), 0)
    )
    out = spread.withColumn(out_col, agg_builder(w))
    return out.filter(F.col("__primary")).drop("__chunk", "__primary")


def sessionize_chunked(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
    tie_col: str,
    bucket: Column | None = None,
    target_rows: int = 100_000,
    out_col: str = "session_idx",
) -> DataFrame:
    """``operators.sessionize.sessionize`` evaluated as a distributed
    prefix sum — bit-identical output, hot keys spread across chunks.

    Per (key, chunk): a one-row halo supplies the ``lag`` for the
    chunk's first primary row, session-boundary flags and a local
    running count are computed locally, and the cross-chunk offset is a
    prefix sum over the per-chunk boundary totals — a table with one row
    per (key, chunk), windowed and joined back.  Default ``bucket`` is
    ``date_trunc('day', ts)``.
    """
    keys = list(key_cols)
    if bucket is None:
        bucket = F.date_trunc("day", F.col(ts_col))
    spread = _spread(df, keys, bucket, target_rows, 1)
    es = epoch_seconds(F.col(ts_col))
    order = [F.col(ts_col).asc(), F.col(tie_col).asc()]
    w_lag = Window.partitionBy(*keys, "__chunk").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(es).over(w_lag)
    # a halo row's own flag is zeroed: its boundary is counted in the
    # chunk where it is primary; here it only donates its timestamp
    is_new = F.when(
        ~F.col("__primary"), F.lit(0)
    ).when(prev.isNull() | ((es - prev) > gap_seconds), F.lit(1)).otherwise(
        F.lit(0)
    )
    local = spread.withColumn("__new", is_new).withColumn(
        "__local", F.sum("__new").over(w_run)
    )
    # `local` feeds BOTH the per-chunk totals and the final join — the
    # chunk-assignment join + halo explode + per-chunk window would
    # otherwise execute once per branch (the dedup-tier persist rule).
    # Lazy persist: the totals branch populates the cache inside the
    # same job; an eager count() here measured slower (extra pass).
    local = local.persist()
    totals = local.groupBy(*keys, "__chunk").agg(
        F.sum("__new").alias("__chunk_new")
    )
    w_off = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__chunk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *keys,
        "__chunk",
        F.coalesce(F.sum("__chunk_new").over(w_off), F.lit(0)).alias("__off"),
    )
    out = (
        local.filter(F.col("__primary"))
        .join(offsets, [*keys, "__chunk"])
        .withColumn(out_col, F.col("__off") + F.col("__local"))
    )
    return out.drop("__chunk", "__primary", "__new", "__local", "__off")
