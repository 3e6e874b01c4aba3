"""Top-k per group — SURVEY §2 O-3.

Window ``row_number`` + filter.  At scale this is one shuffle on the group
key; Spark's ``WindowGroupLimit`` physical optimization (rank-limit
pushdown) keeps per-partition heaps of size k before the shuffle, so the
shuffle carries ≤ k rows per (partition, key) — the plan to verify in
``.explain`` when k is small.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_k_per_group"]


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top-``k`` rows of each group under the given ordering.

    ``order_by`` should end with a unique tiebreaker for deterministic
    results (differential-testing requirement, SURVEY §5.3).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
