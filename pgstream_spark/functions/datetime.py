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
    interpreting NTZ values as UTC (DuckDB ``epoch(ts)`` parity).

    Computed with timezone-FREE field arithmetic (day diff + time-of-day,
    the same formula ``operators/asof.py`` uses): for TIMESTAMP_NTZ the
    result is identical under ANY session timezone — an implicit
    NTZ→instant cast through ``unix_timestamp`` would shift by the
    session offset.  For TIMESTAMP (instant) the fields render in the
    session tz, so this equals the true epoch exactly when the session is
    UTC — which ``connect()`` always sets.
    """
    return (
        F.datediff(ts.cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
        * 86400
        + F.hour(ts).cast("bigint") * 3600
        + F.minute(ts).cast("bigint") * 60
        + F.second(ts).cast("bigint")
    )


def from_epoch_seconds(n: Column, ntz: bool = False) -> Column:
    """Inverse of ``epoch_seconds``: ``timestamp_seconds`` (instant) by
    default; ``ntz=True`` rebuilds a TIMESTAMP_NTZ with tz-free
    arithmetic, session-timezone-independent."""
    if ntz:
        return F.expr("CAST(DATE'1970-01-01' AS TIMESTAMP_NTZ)") + F.make_dt_interval(
            secs=n.cast("double")
        )
    return F.timestamp_seconds(n)
