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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_bucket", "cms_build", "cms_estimate"]


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
