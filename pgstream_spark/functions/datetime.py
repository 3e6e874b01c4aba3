"""Epoch/timestamp conversions — SURVEY §2 F-1/F-2.

The reference's example extracts epoch seconds and binds epoch parameters
back to timestamps (`/root/reference/Example.hs:26,36`:
``EXTRACT(EPOCH FROM deltas.day)`` / ``TO_TIMESTAMP({1})``).  Spark has no
EPOCH field in ``extract``; the idiomatic pair is
``unix_timestamp`` / ``timestamp_seconds``.  For ``timestamp_ntz`` columns
(what parquet ntz data loads as) ``unix_timestamp`` is not defined, so the
epoch is taken through an explicit UTC cast, keeping the result
timezone-independent — the only sane convention at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["epoch_seconds", "from_epoch_seconds"]


def epoch_seconds(ts: Column) -> Column:
    """Seconds since the epoch of a timestamp/timestamp_ntz column,
    interpreting NTZ values as UTC (DuckDB ``epoch(ts)`` parity)."""
    return F.unix_timestamp(F.to_utc_timestamp(ts, "UTC"))


def from_epoch_seconds(n: Column) -> Column:
    """Inverse of ``epoch_seconds`` (`timestamp_seconds`)."""
    return F.timestamp_seconds(n)
