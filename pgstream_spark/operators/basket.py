"""Market-basket analysis: frequent item pairs with support, confidence
and lift — the co-occurrence mining primitive (Agrawal & Srikant's
Apriori at the k=2 level, which in practice is the level dashboards and
recommenders consume).

Spark-first shape, in shuffle order:

1. ``distinct`` on (basket, item) — one shuffle; collapses repeated
   lines so a basket contributes each item once.
2. Self-join on the basket key with ``item_a < item_b`` — both sides
   share the distinct output's partitioning on the basket key, so AQE
   reuses the exchange; the explode factor is items-per-basket², which
   is bounded by the basket size (k baskets of ~n items → n²/2 pair
   rows each), NOT by catalog size.
3. One aggregation on the pair — the only data-sized shuffle.
4. Per-item counts and the basket total attach by broadcast (the item
   table is |catalog| rows — small next to the pair table; at extreme
   catalog sizes flip the two small joins to shuffle joins, the metric
   math is unchanged).

Skew: a mega-basket (one key with 10⁵ items) squares — cap basket size
upstream or salt the distinct; ordinary retail/order data is bounded by
construction.

Determinism: supports and item counts are exact integers; confidence is
one long÷long division; lift is (pair·total)÷(cnt_a·cnt_b) computed as
integer products first, ONE double division at the end — both rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_pairs"]


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Item pairs co-occurring in ≥ ``min_support`` baskets.

    Returns ``(item_a, item_b, support, confidence, lift)`` with
    ``item_a < item_b``; ``confidence`` is P(b | a) — for the directed
    rule a→b — and ``lift`` is symmetric.
    """
    b = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    # Persist: `b` feeds item counts, the basket total AND both
    # self-join sides, and the four branches do not share an exchange
    # (plan-verified: 0 ReusedExchange, 4 scans).  Lazy: the broadcast
    # branches run first and populate the cache — no extra count job.
    b = b.persist()
    item_counts = b.groupBy(F.col("__item").alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = b.select(
        F.countDistinct("__basket").alias("n_baskets")
    )
    pairs = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.__basket") == F.col("y.__basket"))
            & (F.col("x.__item") < F.col("y.__item")),
        )
        .groupBy(
            F.col("x.__item").alias("item_a"), F.col("y.__item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("cnt").alias("__ca")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("cnt").alias("__cb")
    )
    joined = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(totals))
    )
    confidence = F.round(
        F.col("support").cast("double") / F.col("__ca").cast("double"),
        round_digits,
    )
    lift = F.round(
        (F.col("support") * F.col("n_baskets")).cast("double")
        / (F.col("__ca") * F.col("__cb")).cast("double"),
        round_digits,
    )
    return joined.select(
        "item_a",
        "item_b",
        "support",
        confidence.alias("confidence"),
        lift.alias("lift"),
    )
