"""Exactly-once streaming delivery INTO Postgres over the wire client.

The reference streams OUT of Postgres under a transaction
(`/root/reference/src/Database/PostgreSQL/Stream.hs:253-270`); the
symmetric production edge is streaming INTO it.  Spark's checkpoint
guarantees each micro-batch is *eventually* delivered at least once —
after a crash between sink commit and checkpoint commit, the same batch
REPLAYS — so exactly-once needs the sink to make redos invisible.

``postgres_exactly_once_sink`` implements the transactional-ledger
pattern on the pure-Python wire client (`sources/pgwire.py`):

    BEGIN
      INSERT INTO <ledger> (sink_id, batch_id)   ← PK/uniqueness guard
      INSERT INTO <table> … (the batch's rows)
    COMMIT

The ledger insert and the data share ONE transaction: a replayed batch
finds its (sink_id, batch_id) row already committed and is skipped
before writing anything; a crash mid-batch rolls back BOTH inserts, so
the redo starts clean.  This is the standard Kafka-to-warehouse
exactly-once recipe, expressed on the reference's own protocol surface.

Per micro-batch the rows are collected through ``toLocalIterator`` and
written over one connection — the ledger transaction must span the
whole batch, and a multi-connection parallel write cannot share one
transaction.  For bulk-sized batches, land parquet (idempotent sink) +
COPY-load instead; this sink targets the operational tail (aggregates,
CDC deltas) where transactional atomicity matters more than width.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from pgstream_spark.errors import QueryError
from pgstream_spark.sources.pgwire import (
    ConnSettings,
    _pg_literal,
    pooled_connection,
)

__all__ = ["ensure_ledger", "postgres_exactly_once_sink"]


def ensure_ledger(settings: ConnSettings, ledger_table: str) -> None:
    """Create the batch ledger if absent: (sink_id, batch_id) unique."""
    with pooled_connection(settings) as c:
        c.simple_query(
            f"CREATE TABLE IF NOT EXISTS {ledger_table} "
            "(sink_id VARCHAR, batch_id BIGINT, UNIQUE (sink_id, batch_id))"
        )


def postgres_exactly_once_sink(
    settings: ConnSettings,
    table: str,
    sink_id: str,
    ledger_table: str = "spark_sink_ledger",
    insert_batch_rows: int = 500,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function delivering each micro-batch into
    ``table`` exactly once, keyed by ``(sink_id, batch_id)`` in
    ``ledger_table``.  Call :func:`ensure_ledger` once before starting
    the query.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        cols = list(batch_df.columns)
        collist = ", ".join(cols)
        with pooled_connection(settings) as c:
            seen = c.simple_query(
                f"SELECT count(*) FROM {ledger_table} "
                f"WHERE sink_id = {_pg_literal(sink_id)} AND batch_id = {int(batch_id)}"
            )[1][0][0]
            if int(seen) > 0:
                return  # committed replay — exactly-once skip
            c.simple_query("BEGIN")
            try:
                c.simple_query(
                    f"INSERT INTO {ledger_table} (sink_id, batch_id) "
                    f"VALUES ({_pg_literal(sink_id)}, {int(batch_id)})"
                )
                buf: list[str] = []

                def flush() -> None:
                    if buf:
                        c.simple_query(
                            f"INSERT INTO {table} ({collist}) "
                            f"VALUES {', '.join(buf)}"
                        )
                        buf.clear()

                for row in batch_df.toLocalIterator():
                    buf.append(
                        "(" + ", ".join(_pg_literal(v) for v in row) + ")"
                    )
                    if len(buf) >= insert_batch_rows:
                        flush()
                flush()
            except BaseException:
                try:
                    c.simple_query("ROLLBACK")
                except QueryError:
                    pass
                raise
            c.simple_query("COMMIT")

    return write
