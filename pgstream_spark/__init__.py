"""pgstream_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of elsen-trading/pgstream.

The reference (`/root/reference`) is a streaming SQL client library that
delegates all relational execution to PostgreSQL (see
``src/Database/PostgreSQL/Stream.hs:97``).  This package provides the
Spark-native equivalent of both halves:

* the library surface — sessions, typed parameterized queries, batched /
  streaming result delivery, parallel pipeline composition
  (``engine.Engine``, ``streaming/``), and
* the delegated SQL operator surface — executed natively by Spark
  SQL / Catalyst, with custom DataFrame-level operators where Spark lacks a
  primitive (as-of join, interval join, near-dedup, vector similarity — see
  ``operators/``).

Everything here is built on public PySpark APIs only.
"""

from pgstream_spark.engine import Engine, connect
from pgstream_spark.transaction import (
    IsolationLevel,
    ReadWriteMode,
    TransactionMode,
)
from pgstream_spark.errors import (
    ConversionError,
    Incompatible,
    PgStreamError,
    QueryError,
    UnexpectedNull,
)

__all__ = [
    "Engine",
    "connect",
    "PgStreamError",
    "QueryError",
    "ConversionError",
    "UnexpectedNull",
    "Incompatible",
    "IsolationLevel",
    "ReadWriteMode",
    "TransactionMode",
]

__version__ = "0.1.0"
