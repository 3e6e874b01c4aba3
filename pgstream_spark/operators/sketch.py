"""Count-Min sketch — bounded-memory frequency estimation over an
unbounded term domain (heavy-hitter / frequency queries on a 100 TB
corpus where an exact per-term count table would itself be huge).

The sketch is a ``depth × width`` counter grid; each term increments one
bucket per depth row (bucket = md5-derived hash of ``"{d}:{term}"``), and
a point estimate is the **min** across that term's ``depth`` buckets —
always an overestimate, never an under-estimate, with error ≤
``2·N/width`` at probability ``1 - 2^-depth`` (Cormode & Muthukrishnan,
J. Algorithms 2005).

Spark-first shape:

* **build** — explode each term into its ``depth`` (row, bucket) cells,
  then ONE ``groupBy(d, bucket)`` with map-side partial aggregation: the
  shuffle carries at most ``depth × width`` rows *per map partition*
  regardless of input size, and the finished sketch is ``depth × width``
  rows total — broadcast-sized by construction.
* **estimate** — broadcast the sketch against the query terms; per-term
  ``min`` over ``depth`` joined rows.  No shuffle on the big side.

The md5 bucketing is engine-reproducible (same trick as the
deterministic samplers), so the whole sketch — and every estimate — is
bit-identical in DuckDB SQL and hash-checkable by the oracle gate.
Reference delegated aggregation wholesale (SURVEY §2 G-rows,
`Query.hs`); this operator extends the family with the sketch tier the
reference's Postgres backend would use TopN/count-min extensions for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cms_bucket", "cms_build", "cms_estimate", "hll_registers",
    "hll_estimate", "grid_histogram", "grid_quantiles",
    "kmv_sketch", "kmv_pair_stats",
]


def cms_bucket(term: Column, depth_row: Column | int, width: int) -> Column:
    """Bucket index of ``term`` in sketch row ``depth_row``: first 8 md5
    hex digits of ``"{d}:{term}"`` mod width — deterministic everywhere.
    """
    d = depth_row if isinstance(depth_row, Column) else F.lit(depth_row)
    key = F.concat_ws(":", d.cast("string"), term)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build the sketch: ``(d, bucket, cnt)`` — at most depth×width rows."""
    term = F.col(term_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(term, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy(
        F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate each query term: min bucket count across rows.

    ``depth``/``width`` must match the build call.  The sketch side is
    broadcast (≤ depth×width rows); terms absent from the corpus estimate
    as 0 via the left join.
    """
    term = F.col(term_col)
    probes = queries.select(
        term_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(term, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(term_col, F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return joined.groupBy(term_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n")
    )


def hll_registers(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    b: int = 8,
) -> DataFrame:
    """HyperLogLog register table (2^b registers) per group — the
    mergeable distinct-count sketch, built DETERMINISTICALLY from md5 so
    the whole structure is engine-reproducible (the l20 CMS discipline,
    applied to cardinality instead of frequency).

    Register index = top ``b`` bits of a 48-bit md5 hash; rho = position
    of the first 1-bit in the remaining ``48-b`` bits (all-zero tail →
    ``48-b+1``), computed with exact integer/string ops (``bin`` +
    leading-zero count) — no float anywhere, so two engines agree
    bit-for-bit on every register.  One explode-free aggregation:
    ``max(rho)`` per (group, register) with map-side partial aggregation;
    the register table is ``2^b`` rows per group, mergeable by max — the
    union of two corpora's sketches is elementwise max, which is how
    incremental corpus accounting composes.

    Returns ``(*group_cols, register, max_rho)``.
    """
    groups = list(group_cols or [])
    tail_bits = 48 - b
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    reg = F.shiftright(h, tail_bits).cast("int")
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    # rho: 1 + leading zeros of the tail within tail_bits.  bin() has no
    # leading zeros, so zeros = tail_bits - length(bin(tail)); tail==0 →
    # tail_bits + 1 (the HLL convention).  Pure integer/string ops.
    rho = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits) + 1 - F.length(F.bin(tail))
    )
    return (
        df.select(*groups, reg.alias("register"), rho.cast("int").alias("__rho"))
        .groupBy(*groups, "register")
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    b: int = 8,
) -> DataFrame:
    """Cardinality estimate from an HLL register table (raw HLL formula
    ``alpha_m * m^2 / sum(2^-rho)`` with the standard small-range
    linear-counting correction; empty registers count as rho=0).

    The doubles appear only here, in the final combine over 2^b exact
    integers — round the result for cross-engine gating.  Relative error
    ~= 1.04/sqrt(2^b) (~6.5% at b=8).
    """
    groups = list(group_cols or [])
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard alpha_m for m >= 128
    agg = registers.groupBy(*groups).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__s"),
        F.count(F.lit(1)).alias("__nz"),
    )
    # empty registers contribute 2^0 = 1 each
    s = F.col("__s") + (F.lit(m) - F.col("__nz"))
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("__nz")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*groups, est.alias("hll_est"))


def grid_histogram(
    df: DataFrame,
    value_col: Column | str,
    lo: float,
    hi: float,
    bins: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-grid histogram sketch: exact counts per equi-width bin over
    a declared [lo, hi) domain (out-of-range values clamp to the edge
    bins).  The deterministic, MERGEABLE quantile sketch — two grids
    merge by adding counts, a property t-digest family sketches (g34)
    trade away for adaptivity — with error bounded by the bin width,
    and every number an exact integer, so the whole sketch is
    hash-checkable cross-engine (same discipline as the CMS and HLL
    sketches above).  One map-side-combinable count per (group, bin).
    Returns ``(group…, bin, n)``.
    """
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    span = float(hi) - float(lo)
    raw = F.floor((c - F.lit(float(lo))) / F.lit(span) * F.lit(int(bins)))
    bin_id = F.greatest(
        F.lit(0), F.least(F.lit(int(bins) - 1), raw.cast("int"))
    ).alias("bin")
    groups = [F.col(g) for g in (group_cols or [])]
    return (
        df.select(*groups, bin_id)
        .groupBy(*[g for g in (group_cols or [])], "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def grid_quantiles(
    hist: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a :func:`grid_histogram` — the first bin
    whose running count reaches ``q·total``, reported as that bin's
    UPPER edge (a value ≥ the true quantile, off by at most one bin
    width).  Pure integer cumsum + one window, deterministic; the same
    arithmetic spells in SQL, so estimates stay oracle-checkable.
    Returns ``(group…, q, est)``.
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    w = (
        Window.partitionBy(*groups)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*groups)
    cum = hist.select(
        *groups,
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    qdf = hist.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    width = (float(hi) - float(lo)) / int(bins)
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(
            F.col("cum") >= F.ceil(F.col("q") * F.col("total")).cast("bigint")
        )
        .groupBy(*groups, "q")
        .agg(F.min("bin").alias("__bin"))
    )
    return hit.select(
        *groups,
        "q",
        F.round(
            F.lit(float(lo)) + (F.col("__bin") + 1) * F.lit(width), 6
        ).alias("est"),
    )


# KMV (k minimum values) distinct sketch — the bottom-k complement to
# HLL.  Where HLL only UNIONS (register max-merge; intersections go
# through inclusion-exclusion, l47), a KMV sketch supports DIRECT
# set-overlap estimates: the k smallest hash values of a set are a
# uniform coordinated sample of its elements, so the fraction of the
# merged bottom-k present in both sets estimates Jaccard directly
# (Beyer et al., SIGMOD 2007; Broder's min-wise hashing).  Like every
# sketch in this module the hash is md5-derived, so the sketch — and
# every estimate — is deterministic and oracle-checkable bit-for-bit.

_KMV_BITS = 60
_KMV_MAX = float(1 << _KMV_BITS)  # hash domain size M; 2^60 is double-exact


def kmv_sketch(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Bottom-``k`` sketch per group: the ``k`` smallest distinct 60-bit
    md5 hashes of ``item_col``.  Returns ``(*group_cols, rank, hv)``.

    Shape: one distinct-style aggregation (map-side combine collapses
    duplicate items before the shuffle), then a per-group bottom-k
    window — the shuffle after the distinct carries |distinct| rows and
    the result is ≤ k rows per group, broadcast-sized by construction.
    At corpus scale replace the window with a per-partition bottom-k
    (``min_by``-style partial) if |distinct| per group is extreme; the
    sketch itself is identical.
    """
    groups = list(group_cols)
    hv = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = df.select(*groups, hv.alias("hv")).distinct()
    w = Window.partitionBy(*groups).orderBy(F.col("hv").asc())
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*groups, "rank", "hv")
    )


def kmv_pair_stats(
    sketch: DataFrame,
    group_col: str,
    k: int = 256,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise set-overlap estimates between every two groups, from the
    sketches ALONE (the corpus is never re-read — the compose-without-
    rescan property that makes sketches the 100 TB shape).

    For groups a < b: merge both bottom-k lists, keep the k smallest
    distinct hashes; then

    * ``union_est``  = (k-1) · M / kth-smallest merged hash,
    * ``jaccard``    = |merged ∩ a ∩ b| / k   (exact integer ratio),
    * ``inter_est``  = jaccard · union_est.

    Input is ≤ k rows per group, so every join here is sketch-sized;
    with G groups the pair table is G²/2 rows — driver-safe output.
    """
    g = sketch.select(
        F.col(group_col).alias("g"), "hv"
    )
    names = g.select("g").distinct()
    pairs = (
        names.alias("a")
        .join(names.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
    )
    # merged candidate hashes per pair, tagged with membership
    merged = (
        pairs.join(g.alias("s"), (F.col("s.g") == F.col("ga")) | (F.col("s.g") == F.col("gb")))
        .groupBy("ga", "gb", "hv")
        .agg(
            F.max(F.when(F.col("s.g") == F.col("ga"), 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("s.g") == F.col("gb"), 1).otherwise(0)).alias("in_b"),
        )
    )
    w = Window.partitionBy("ga", "gb").orderBy(F.col("hv").asc())
    bottom = merged.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    agg = bottom.groupBy("ga", "gb").agg(
        F.max(F.when(F.col("rank") == k, F.col("hv"))).alias("kth"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).cast("bigint").alias("n_both"),
        F.count(F.lit(1)).alias("n_merged"),
    )
    # under-filled merged sketch (|union| < k): the bottom-k IS the whole
    # union, so union and Jaccard are exact — kth is NULL in that case
    union_est = F.when(
        F.col("kth").isNull(), F.col("n_merged").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1) * _KMV_MAX) / F.col("kth").cast("double"),
            round_digits,
        )
    )
    denom = F.least(F.lit(k).cast("bigint"), F.col("n_merged")).cast("double")
    jaccard = F.col("n_both").cast("double") / denom
    out = agg.select(
        F.col("ga"),
        F.col("gb"),
        F.col("n_both"),
        union_est.alias("union_est"),
        F.round(jaccard, round_digits).alias("jaccard"),
    )
    return out.withColumn(
        "inter_est",
        F.round(F.col("jaccard") * F.col("union_est"), round_digits),
    )
