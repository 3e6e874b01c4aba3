"""Column-level function library (arrays, datetime, money)."""

from pgstream_spark.functions.arrays import compact_array, array_dot, array_mean
from pgstream_spark.functions.datetime import epoch_seconds, from_epoch_seconds
from pgstream_spark.functions.money import cents_to_money, money_to_cents

__all__ = [
    "compact_array",
    "array_dot",
    "array_mean",
    "epoch_seconds",
    "from_epoch_seconds",
    "cents_to_money",
    "money_to_cents",
]
