"""Money semantics — SURVEY §2 F-11.

The reference decodes Postgres ``money`` (int8 cents on the wire) into
fixed-point by dividing by 100
(`/root/reference/src/Database/PostgreSQL/Stream/FromRow.hs:281-293`).
Spark equivalent: DECIMAL(19,2) arithmetic — exact, associative, and
therefore deterministic under any aggregation order (unlike DOUBLE sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["cents_to_money", "money_to_cents"]


def cents_to_money(cents: Column) -> Column:
    """int8 cents → DECIMAL(19,2) currency units (÷ 100, exact)."""
    return (cents.cast("decimal(19,0)") / 100).cast("decimal(19,2)")


def money_to_cents(money: Column) -> Column:
    """DECIMAL currency units → int8 cents (× 100, exact)."""
    return (money.cast("decimal(19,2)") * 100).cast("long")
